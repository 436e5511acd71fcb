"""r10 decomposition probe (guide §1.1): where do the expensive non-TPC-H
gate families actually spend their time?

Families measured, each split into its phases so the optimization targets
the real cost, not the entry total (which includes the DuckDB oracle):

- streaming_*: stream-DF construction vs micro-batch run vs final batch
  SELECT, plus a trivial-stream floor (micro-batch machinery alone);
- dml_*: scratch-catalog setup vs base-table write vs each DML statement vs
  the final SELECT;
- pg_ivf_orderby_route: first CREATE INDEX (k-means build or cross-session
  replay) vs second, vs the probe SELECT, vs the DuckDB oracle;
- embedding_top_component: DataFrame construction+analysis vs execution
  (noop sink), vs the DuckDB oracle;
- cold TPC-H: per-query fresh-Dataset construction+analysis vs execution,
  on a warm session (the bench cold arm's cost split).

Usage: python tools/probe_r10_decomp.py [families...] (default: all)
Writes tools/probe_r10_decomp.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_r10_decomp.json")


def t(fn):
    t0 = time.perf_counter()
    r = fn()
    return round(time.perf_counter() - t0, 4), r


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from bemidb_spark.session import build_session
    from bemidb_spark.tables import register_views

    fams = set(sys.argv[1:]) or {"streaming", "dml", "ivf", "etc", "cold"}
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, SF_DIR)
    out: dict = {"sf_dir": SF_DIR}

    if "streaming" in fams:
        from bemidb_spark.streaming import windows as W

        res = {}
        # trivial-stream floor: micro-batch machinery with a no-op pipeline
        def trivial():
            ev = W._events_stream(spark, SF_DIR)
            q = (ev.select("event_id").writeStream.format("memory")
                 .queryName("triv_probe").outputMode("append")
                 .trigger(availableNow=True).start())
            q.processAllAvailable()
            q.stop()
        res["trivial_floor"] = [t(trivial)[0] for _ in range(3)]
        for name in ("streaming_tumbling_daily", "streaming_dedup_keys",
                     "streaming_click_purchase_join"):
            fn = W.QUERIES[name]
            sec_stream_df = t(lambda: W._events_stream(spark, SF_DIR))[0]
            runs = []
            for _ in range(3):
                sec, df = t(lambda: fn(spark, SF_DIR))
                sec_final = t(lambda: df.collect())[0]
                runs.append({"entry": sec, "final_collect": sec_final})
            res[name] = {"stream_df_construct": sec_stream_df, "runs": runs}
        out["streaming"] = res

    if "dml" in fams:
        from bemidb_spark.operators import dmlpath as D
        from bemidb_spark.sources.writer import write_bucketed_table

        res = {}
        for rep in range(2):
            rec = {}
            rec["scratch_session"], (cat, pg) = t(
                lambda: D._scratch_session(spark, SF_DIR))
            base = spark.table("orders").where("o_orderkey < 1000").selectExpr(
                "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
            rec["base_write"], _ = t(lambda: write_bucketed_table(
                spark, cat, "public", "ord_mut", base, ["o_orderkey"],
                n_buckets=8))
            rec["update"], _ = t(lambda: pg.execute(
                "UPDATE ord_mut SET o_orderstatus = 'U', "
                "o_totalprice = o_totalprice * 2 WHERE o_orderkey % 10 = 3"))
            rec["delete"], _ = t(lambda: pg.execute(
                "DELETE FROM ord_mut WHERE o_orderkey % 10 = 7"))
            rec["final_select_collect"], _ = t(lambda: pg.execute(
                "SELECT o_orderkey, o_orderstatus, o_totalprice, "
                "CAST(o_orderdate AS DATE) AS odate "
                "FROM ord_mut ORDER BY o_orderkey").collect())
            res[f"update_delete_rep{rep}"] = rec
        # oracle cost for the same entry
        from bemidb_spark.oracle import duckdb_connection

        con = duckdb_connection(SF_DIR)
        res["oracle_update_delete"], _ = t(lambda: con.execute(
            D.ORACLES["dml_update_delete_route"]).fetchall())
        out["dml"] = res

    if "ivf" in fams:
        from bemidb_spark.operators import pgpath as P

        res = {}
        res["entry_first"], df = t(lambda: P.QUERIES["pg_ivf_orderby_route"](spark, SF_DIR))
        res["first_collect"], _ = t(lambda: df.collect())
        res["entry_second"], df2 = t(lambda: P.QUERIES["pg_ivf_orderby_route"](spark, SF_DIR))
        res["second_collect"], _ = t(lambda: df2.collect())
        from bemidb_spark.oracle import duckdb_connection

        con = duckdb_connection(SF_DIR)
        res["oracle"], _ = t(lambda: con.execute(
            P.ORACLES["pg_ivf_orderby_route"]).fetchall())
        out["ivf"] = res

    if "etc" in fams:
        from bemidb_spark.operators import mixture as M

        res = {}
        for rep in range(2):
            sec_build, df = t(lambda: M.QUERIES["embedding_top_component"](spark, SF_DIR))
            sec_exec = t(lambda: noop(df))[0]
            res[f"rep{rep}"] = {"construct_analyze": sec_build, "exec_noop": sec_exec}
        from bemidb_spark.oracle import duckdb_connection

        con = duckdb_connection(SF_DIR)
        res["oracle"], _ = t(lambda: con.execute(
            M.ORACLES["embedding_top_component"]).fetchall())
        out["embedding_top_component"] = res

    if "cold" in fams:
        from bemidb_spark.operators import tpch
        from bemidb_spark.warehouse import ensure_warehouse

        wh = ensure_warehouse(spark, SF_DIR)
        # warm pass (plans + codegen for these shapes)
        for i in range(1, 23):
            tpch.QUERIES[f"tpch_q{i}"](spark, wh).collect()
        res = {}
        for i in range(1, 23):
            sec_build, df = t(lambda: tpch.QUERIES[f"tpch_q{i}"](spark, wh))
            sec_collect = t(lambda: df.collect())[0]
            res[f"q{i}"] = {"construct_analyze": sec_build,
                            "collect": sec_collect}
        tot_b = round(sum(v["construct_analyze"] for v in res.values()), 3)
        tot_c = round(sum(v["collect"] for v in res.values()), 3)
        out["cold_tpch"] = {"per_query": res, "total_construct": tot_b,
                            "total_collect": tot_c}

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "cold_tpch"},
                     indent=1)[:2000])
    if "cold_tpch" in out:
        print("cold totals:", out["cold_tpch"]["total_construct"],
              out["cold_tpch"]["total_collect"])


if __name__ == "__main__":
    main()
