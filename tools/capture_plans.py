"""Capture .explain("formatted") for the benchmarked query set.

Writes plans/<tag>/<name>_<suffix>.txt for each of the 22 TPC-H queries
(against the warehouse layout bench.py times) and the 5 pipeline operators
bench.py reports under pipeline_sec (against the raw sf dir, as the bench
runs them). Used to commit before/after plan evidence for optimization
rounds.

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] [name ...]
  e.g. python tools/capture_plans.py r09 before
       python tools/capture_plans.py r09 after /root/testdata/sf0.1 tpch_q18
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bemidb_spark.operators import dedup, mixture, text, tpch
from bemidb_spark.session import apply_input_size_policy, build_session
from bemidb_spark.warehouse import ensure_warehouse

TAG = sys.argv[1] if len(sys.argv) > 1 else "r09"
SUFFIX = sys.argv[2] if len(sys.argv) > 2 else "before"
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[4:])

PIPELINE = {
    "dedup_minhash_lsh": dedup.QUERIES["dedup_minhash_lsh"],
    "dedup_exact": dedup.QUERIES["dedup_exact"],
    "text_quality": text.QUERIES["text_quality"],
    "split_train_valid_test": mixture.QUERIES["split_train_valid_test"],
    "unigram_logprob_score": mixture.QUERIES["unigram_logprob_score"],
}


def main() -> None:
    spark = build_session(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    wh = ensure_warehouse(spark, SF_DIR)
    apply_input_size_policy(spark, [wh])
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", TAG,
    )
    os.makedirs(out_dir, exist_ok=True)

    jobs: dict[str, object] = {}
    for i in range(1, 23):
        name = f"tpch_q{i}"
        jobs[name] = tpch.QUERIES[name](spark, wh)
    for name, fn in PIPELINE.items():
        jobs[name] = fn(spark, SF_DIR)

    for name, df in jobs.items():
        if ONLY and name not in ONLY:
            continue
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
