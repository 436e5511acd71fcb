"""Differential tests for the training-data pipeline operators.

Runs at sf0.001 (like the TPC-H battery); the cross-engine primitives these
rely on (md5 hex→int, sequential float folds) are additionally pinned by
direct equality probes so a drift in either engine fails loudly.
"""

from __future__ import annotations

import duckdb
import pytest

from bemidb_spark.operators import dedup, similarity, text
from bemidb_spark.oracle import compare

ALL = {}
for mod in (dedup, similarity, text):
    ALL.update({name: (mod.QUERIES[name], mod.ORACLES[name]) for name in mod.QUERIES})


@pytest.mark.parametrize("name", sorted(ALL))
def test_pipeline_oracle_parity(spark, sf_dir, name):
    fn, oracle = ALL[name]
    compare(fn(spark, sf_dir), oracle, sf_dir)


def test_hash_int_primitive_parity(spark):
    """The md5-hex→BIGINT primitive must agree bit-for-bit across engines."""
    from bemidb_spark.operators._xengine import hash_int

    vals = ["", "a", "hello world", "Ωµ—emoji🙂", "0"]
    s = spark.sql(
        "SELECT " + ", ".join(
            hash_int(f"'{v}'", spark=True, salt="t") + f" AS h{i}"
            for i, v in enumerate(vals)
        )
    ).collect()[0]
    d = duckdb.connect().execute(
        "SELECT " + ", ".join(
            hash_int(f"'{v}'", spark=False, salt="t") + f" AS h{i}"
            for i, v in enumerate(vals)
        )
    ).fetchone()
    assert tuple(s) == d


def test_fold_primitive_parity(spark):
    """Sequential-fold dot product must agree bit-for-bit across engines."""
    from bemidb_spark.operators._xengine import dot_fold

    a = [0.1, 0.25, 1e-7, 3.5, -2.25]
    b = [1.5, -0.5, 2e6, 0.125, 0.3]
    lit_s = "array(" + ",".join(f"CAST({x} AS FLOAT)" for x in a) + ")"
    lit_s2 = "array(" + ",".join(f"CAST({x} AS FLOAT)" for x in b) + ")"
    lit_d = "[" + ",".join(f"CAST({x} AS FLOAT)" for x in a) + "]"
    lit_d2 = "[" + ",".join(f"CAST({x} AS FLOAT)" for x in b) + "]"
    s = spark.sql(f"SELECT {dot_fold(lit_s, lit_s2, spark=True)} AS d").collect()[0].d
    d = duckdb.connect().execute(
        f"SELECT {dot_fold(lit_d, lit_d2, spark=False)}"
    ).fetchone()[0]
    assert s == d


def test_minhash_finds_planted_near_dups(spark, sf_dir_med):
    """At sf0.01 the corpus contains planted near-dup pairs; LSH must find them."""
    df = dedup.QUERIES["dedup_minhash_lsh"](spark, sf_dir_med)
    rows = df.collect()
    assert len(rows) >= 20
    assert all(r.jaccard >= dedup.JACCARD_MIN for r in rows)
