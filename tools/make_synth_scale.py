"""Synthesize a larger TPC-H-shaped dataset by key-offset replication.

The driver provides sf{0.001,0.01,0.1}; the fixed per-query overhead that
dominates the 22-query suite at sf0.1 (~17 MB compressed) can only be shown
to amortize on a bigger input. This tool replicates the sf0.1 tables N times
(default 10 -> "sf1-equivalent", ~6 M lineitem rows), offsetting every
surrogate key by replica*STRIDE so intra-replica join structure is exactly
preserved (o_custkey points at the same replica's customer, l_orderkey at
the same replica's order, ...). nation/region are fixed-size in TPC-H and
are not replicated; FKs into them are left untouched.

This is a THROUGHPUT dataset, not a correctness input: every aggregate is N
identical copies of the sf0.1 answer, which is exactly what a scaling
measurement wants (same selectivities, same join fan-outs, N x the rows).
Correctness always runs on the driver's own parquet via the oracle gate.

Usage: python tools/make_synth_scale.py [replicas=10] [out_dir=.synth/sf1]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bemidb_spark.session import build_session
from bemidb_spark.tables import load_tables

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".synth", "sf1"
)
SRC = "/root/testdata/sf0.1"
STRIDE = 100_000_000  # far above any sf0.1 key

# per-table key columns that must shift together per replica
_OFFSET_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    # pipeline tables: user_id offset keeps sessions/funnels intra-replica;
    # doc/vec ids offset so dedup keys replicate as N exact-duplicate
    # families (a harsher, not easier, dedup workload)
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_FIXED = ["region", "nation"]


def main() -> None:
    spark = build_session(app_name="make-synth-scale")
    spark.sparkContext.setLogLevel("ERROR")
    dfs = load_tables(spark, SRC)
    os.makedirs(OUT, exist_ok=True)
    for name in _FIXED:
        dfs[name].write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
        print(f"{name}: copied", flush=True)
    for name, keys in _OFFSET_COLS.items():
        df = dfs[name]
        # one replica per (replica_id) via a small cross join against a
        # range — executes as a broadcast nested loop over N rows, fully
        # parallel, no driver loop
        reps = spark.range(REPLICAS).withColumnRenamed("id", "_r")
        out = df.crossJoin(F.broadcast(reps))
        for k in keys:
            out = out.withColumn(k, F.col(k) + F.col("_r") * STRIDE)
        out = out.drop("_r")
        nfiles = max(4, min(32, out.rdd.getNumPartitions()))
        out.repartition(nfiles).write.mode("overwrite").parquet(
            f"{OUT}/{name}.parquet"
        )
        print(f"{name}: x{REPLICAS} -> {out.count()} rows", flush=True)
    print("done:", OUT, flush=True)


if __name__ == "__main__":
    main()
