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


def test_ivf_kmeans_cells_are_data_dependent(spark, sf_dir):
    """k-means cells must reflect vector locality, not vec_id arithmetic: at
    least one vector must land in a different cell than its vec_id % K init,
    and cell sizes must be non-uniform (data-driven)."""
    from bemidb_spark.tables import register_views

    register_views(spark, sf_dir)
    sql = similarity._ivf_sql(True)
    cells_probe = sql.split("probes AS")[0].rstrip().rstrip(",") + (
        "\nSELECT cell, COUNT(*) AS n, "
        "SUM(CASE WHEN cell <> vec_id % {k} THEN 1 ELSE 0 END) AS moved "
        "FROM cells GROUP BY cell ORDER BY cell"
    ).format(k=similarity.N_CELLS)
    rows = spark.sql(cells_probe).collect()
    sizes = [r.n for r in rows]
    assert sum(r.moved for r in rows) > 0  # assignment actually moved vectors
    assert len(set(sizes)) > 1  # non-uniform, data-driven cells


def test_ivf_recall_vs_exact_topk(spark, sf_dir):
    """recall@5 of IVF against the exact brute-force ranking; with real
    centroids and NPROBE=2 of 8 cells this must be well above chance
    (NPROBE/K = 25%)."""
    exact = similarity.QUERIES["ann_cosine_topk"](spark, sf_dir).collect()
    approx = similarity.QUERIES["ann_ivf_topk"](spark, sf_dir).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.cand_id)
    hits = total = 0
    for r in approx:
        total += 1
        if r.cand_id in exact_sets.get(r.query_id, set()):
            hits += 1
    assert total > 0
    recall = hits / total
    assert recall >= 0.5, f"recall@{similarity.TOP_K} = {recall}"
