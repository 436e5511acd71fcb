"""Scale-behavior probe: representative operators across sf0.001/0.01/0.1.

The sandbox caps test data at sf0.1, so the 100 TB claim rests on plan shape
plus MEASURED scaling: if an operator's wall-clock grows ~linearly in rows
(constant per-row throughput once fixed per-query overhead is subtracted),
its plan has no super-linear term at these sizes — no all-pairs blowup, no
driver materialization growing with input. A super-linear op shows up as
collapsing rows/sec between scale factors.

Representative set: one per plan family — wide decimal aggregation (tpch_q1),
multi-join (tpch_q9), banded LSH self-join (dedup_minhash_lsh), window
function (win_running_sum), corpus token aggregation (unigram_logprob_score),
connected components (dedup_dup_clusters), IVF build+probe (ann_ivf_topk).

Usage: python tools/scaling_report.py [--json]
Prints one table (or JSON) of sec + input rows/sec per (op, sf).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.001", "0.01", "0.1"]
# Extra scale points beyond the driver-provided data, e.g. the synthetic
# key-offset replications: SPARK_GRAFT_EXTRA_SFS=".synth/sf1=1.0,.synth/sf10=10.0"
# (dir=sf_label pairs; dirs are relative to the repo root or absolute).
EXTRA_SFS = [
    tuple(p.split("=", 1))
    for p in os.environ.get("SPARK_GRAFT_EXTRA_SFS", "").split(",")
    if "=" in p
]
OPS = [
    ("tpch_q1", "lineitem"),
    ("tpch_q9", "lineitem"),
    ("dedup_minhash_lsh", "documents"),
    ("win_running_sum", "events"),
    ("unigram_logprob_score", "documents"),
    ("dedup_dup_clusters", "documents"),
    ("ann_ivf_topk", "embeddings"),
    # r6: the at-ingest streaming taggers (stateful shuffle + verify join);
    # dominated by fixed streaming-query setup at small SF — rows/sec must
    # RISE with input if the per-row path is linear
    ("streaming_minhash_dedup", "documents"),
    ("streaming_embedding_dedup", "embeddings"),
    # r6 wave 2: bounded-state sketch (space-saving), bigram LM (two count
    # shuffles + model join), iterated-join fixpoint (PageRank)
    ("streaming_heavy_hitters", "events"),
    ("text_bigram_logprob", "documents"),
    ("pagerank_event_graph", "events"),
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from bemidb_spark.session import build_session

    spark = build_session(app_name="bemidb-spark-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    rows_cache: dict[tuple[str, str], int] = {}

    def input_rows(sf_dir: str, table: str) -> int:
        key = (sf_dir, table)
        if key not in rows_cache:
            rows_cache[key] = spark.read.parquet(
                f"{sf_dir}/{table}.parquet"
            ).count()
        return rows_cache[key]

    points = [(f"/root/testdata/sf{sf}", float(sf)) for sf in SFS]
    points += [(d, float(label)) for d, label in EXTRA_SFS]

    out = []
    for name, table in OPS:
        fn = queries[name]
        for sf_dir, sf in points:
            fn(spark, sf_dir).collect()  # warm: plan + codegen + JIT
            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                samples.append(time.perf_counter() - t0)
            sec = min(samples)
            n = input_rows(sf_dir, table)
            out.append({
                "op": name, "sf": sf, "sec": round(sec, 3),
                "input_rows": n, "rows_per_sec": int(n / sec) if sec else 0,
            })

    if "--json" in sys.argv:
        print(json.dumps(out))
        return
    print(f"{'op':28s} {'sf':>6s} {'sec':>8s} {'rows':>9s} {'rows/s':>10s}")
    for r in out:
        print(f"{r['op']:28s} {r['sf']:>6} {r['sec']:>8} "
              f"{r['input_rows']:>9} {r['rows_per_sec']:>10}")
    # scaling verdict per op: throughput at the largest SF should be at
    # least that of the smallest (per-row cost must not GROW with size;
    # fixed overhead makes small SFs look slow, which is fine)
    by_op: dict[str, list] = {}
    for r in out:
        by_op.setdefault(r["op"], []).append(r)
    print()
    for op, rs in by_op.items():
        rs.sort(key=lambda r: r["sf"])
        trend = " -> ".join(str(r["rows_per_sec"]) for r in rs)
        ok = rs[-1]["rows_per_sec"] >= rs[0]["rows_per_sec"]
        print(f"{op:28s} rows/s {trend}   {'OK (sub/linear)' if ok else 'SUPER-LINEAR?'}")


if __name__ == "__main__":
    main()
