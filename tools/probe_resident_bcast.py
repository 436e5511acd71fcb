"""Resident-statement A/B: small-profile broadcast threshold 1 MB vs 10 MB.

VERDICT r5 What's-wrong #3: BENCH_r05 resident q18 0.035->0.102 s (+194%),
q3/q22 up ~50/20%, total 0.69->0.74 s after the small profile moved its
broadcast threshold to 1 MB (a deliberate trade that bought -0.5 s on the
honest re-execution suite). This probe pins the cause: same session, same
warehouse, prepare + warm + time the RESIDENT path under each threshold and
diff the physical join strategies of the regressed queries.

Usage: python tools/probe_resident_bcast.py [--json out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bemidb_spark.operators import tpch
from bemidb_spark.session import apply_input_size_policy, build_session
from bemidb_spark.telemetry import bw_canary_sec, cpu_stat, steal_pct
from bemidb_spark.warehouse import ensure_warehouse

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else None
FOCUS = ("q3", "q18", "q22")


def _join_mix(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "broadcast_hash": len(re.findall(r"BroadcastHashJoin", plan)),
        "shuffled_hash": len(re.findall(r"ShuffledHashJoin", plan)),
        "sort_merge": len(re.findall(r"SortMergeJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
    }


def main() -> None:
    spark = build_session(app_name="resident-bcast-probe")
    spark.sparkContext.setLogLevel("ERROR")
    wh = ensure_warehouse(spark, SF_DIR)
    small = apply_input_size_policy(spark, [wh])
    report = {"sf_dir": SF_DIR, "small_profile": small, "arms": {}}
    bw_canary_sec()  # untimed alloc

    for label, thresh in (("1MB", str(1 << 20)), ("10MB", str(10 << 20))):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        prepared = {i: tpch.QUERIES[f"tpch_q{i}"](spark, wh) for i in range(1, 23)}
        for _ in range(3):  # warm: materialize shuffles/broadcasts + JIT
            for i in range(1, 23):
                prepared[i].collect()
        samples = []
        per_q_best: dict[str, float] = {}
        bw = []
        st = []
        for _ in range(5):
            bw.append(bw_canary_sec())
            c0 = cpu_stat()
            t0 = time.perf_counter()
            per_q = {}
            for i in range(1, 23):
                t1 = time.perf_counter()
                prepared[i].collect()
                per_q[f"q{i}"] = round(time.perf_counter() - t1, 4)
            samples.append(round(time.perf_counter() - t0, 4))
            st.append(steal_pct(c0, cpu_stat()))
            if samples[-1] == min(samples):
                per_q_best = per_q
        report["arms"][label] = {
            "totals": samples,
            "steal_pct": st,
            "bw_canary_sec": bw,
            "per_q_best": per_q_best,
            "focus_joins": {
                q: _join_mix(prepared[int(q[1:])]) for q in FOCUS
            },
        }
        print(json.dumps({
            "arm": label,
            "median": sorted(samples)[len(samples) // 2],
            "focus": {q: per_q_best.get(q) for q in FOCUS},
            "joins": report["arms"][label]["focus_joins"],
        }), flush=True)

    if OUT:
        with open(OUT, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"# wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
