#!/usr/bin/env python
"""Benchmark: TPC-H 22-query suite wall time at $SPARK_GRAFT_SF_DIR.

Mirrors the reference's acceptance benchmark (22 sequential TPC-H queries via a
warm server, reference Makefile:66-68, README.md:259-270 — 2.3 s @ SF0.1).
Session startup is excluded, as the reference excludes server boot; a single
trivial job warms JVM/codegen paths before timing starts.

Prints ONE JSON line:
  {"metric": "tpch_22q_total", "value": <sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bemidb_spark.operators import tpch
from bemidb_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
    spark = build_session(app_name="bemidb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM / Parquet reader / codegen, not the query results.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    total0 = time.perf_counter()
    for i in range(1, 23):
        name = f"tpch_q{i}"
        t0 = time.perf_counter()
        tpch.QUERIES[name](spark, SF_DIR).collect()
        timings[f"q{i}"] = round(time.perf_counter() - t0, 4)
    total = round(time.perf_counter() - total0, 4)

    print(json.dumps({
        "metric": "tpch_22q_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
