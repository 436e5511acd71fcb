"""Reexec-stall probe: isolate the 85-119 s outlier passes BENCH_r03 recorded.

Runs the honest re-execution loop (session.reexecute per query) for N passes
with per-query wall timings, JVM GC telemetry (cumulative collection counts /
millis via GarbageCollectorMXBean), and heap occupancy snapshots — enough to
attribute a stalled pass to (a) a full-GC pause, (b) one slow query, or
(c) scheduler/cleaner backpressure spread across the pass.

Usage: python tools/reexec_probe.py [passes=8] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bemidb_spark.operators import tpch
from bemidb_spark.session import apply_input_size_policy, build_session
from bemidb_spark.session import reexecute
from bemidb_spark.warehouse import ensure_warehouse

PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def gc_stats(spark) -> dict[str, tuple[int, int]]:
    out = {}
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    it = beans.iterator()
    while it.hasNext():
        b = it.next()
        out[b.getName()] = (b.getCollectionCount(), b.getCollectionTime())
    return out


def heap_used_mb(spark) -> int:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    return int((rt.totalMemory() - rt.freeMemory()) / (1 << 20))


def main() -> None:
    spark = build_session(app_name="reexec-probe")
    spark.sparkContext.setLogLevel("ERROR")
    wh = ensure_warehouse(spark, SF_DIR)
    small = apply_input_size_policy(spark, [wh])
    prepared = {i: tpch.QUERIES[f"tpch_q{i}"](spark, wh) for i in range(1, 23)}
    # same warm-up shape as bench.py
    for _ in range(2):
        for i in range(1, 23):
            prepared[i].collect()
    for _ in range(2):
        for i in range(1, 23):
            reexecute(prepared[i]).collect()

    print(f"# small_profile={small} passes={PASSES}", flush=True)
    for p in range(PASSES):
        gc0, t0, h0 = gc_stats(spark), time.perf_counter(), heap_used_mb(spark)
        per_q = {}
        for i in range(1, 23):
            t1 = time.perf_counter()
            reexecute(prepared[i]).collect()
            per_q[f"q{i}"] = round(time.perf_counter() - t1, 3)
        total = round(time.perf_counter() - t0, 3)
        gc1, h1 = gc_stats(spark), heap_used_mb(spark)
        gc_delta = {
            n: (gc1[n][0] - gc0.get(n, (0, 0))[0], gc1[n][1] - gc0.get(n, (0, 0))[1])
            for n in gc1
        }
        worst = sorted(per_q.items(), key=lambda kv: -kv[1])[:3]
        print(json.dumps({
            "pass": p, "total": total, "heap_mb": [h0, h1],
            "gc_count_ms": gc_delta, "worst3": worst,
        }), flush=True)


if __name__ == "__main__":
    main()
