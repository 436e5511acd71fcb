"""Differential tests: SQL-surface battery, streaming windows, multimodal."""

from __future__ import annotations

import pytest

from bemidb_spark.operators import multimodal, sql_surface
from bemidb_spark.oracle import compare
from bemidb_spark.streaming import windows as stream_windows

ALL = {}
for mod in (sql_surface, multimodal, stream_windows):
    ALL.update({name: (mod.QUERIES[name], mod.ORACLES[name]) for name in mod.QUERIES})


@pytest.mark.parametrize("name", sorted(ALL))
def test_surface_oracle_parity(spark, sf_dir, name):
    fn, oracle = ALL[name]
    compare(fn(spark, sf_dir), oracle, sf_dir)


def test_recursive_iterate_terminates(spark):
    """The fixpoint iterator must stop on an empty frontier and cap runaways."""
    from pyspark.sql import functions as F

    from bemidb_spark.plans.recursive import iterate

    seed = spark.createDataFrame([(1,)], "n int")
    out = iterate(seed, lambda df: df.select((F.col("n") + 1).alias("n")).filter("n <= 5"))
    assert sorted(r.n for r in out.collect()) == [1, 2, 3, 4, 5]

    with pytest.raises(RuntimeError, match="did not converge"):
        iterate(seed, lambda df: df, max_iter=3)


def test_mm_resize_nearest_neighbor(spark, sf_dir):
    """Real resize kernel over the fake-decoded grid: UDF output hash-matches
    the oracle's replay of the same floor-mapped index math."""
    from bemidb_spark.oracle import compare

    compare(
        multimodal.QUERIES["mm_resize"](spark, sf_dir),
        multimodal.ORACLES["mm_resize"],
        sf_dir,
    )


def test_mm_audio_chunks_overlap(spark, sf_dir):
    from bemidb_spark.operators import multimodal as mm
    from bemidb_spark.oracle import compare

    compare(mm.QUERIES["mm_audio_chunks"](spark, sf_dir),
            mm.ORACLES["mm_audio_chunks"], sf_dir)
    rows = mm.QUERIES["mm_audio_chunks"](spark, sf_dir).where("doc_id = 0").collect()
    if len(rows) >= 2:
        # consecutive chunks overlap: hop < window
        assert mm.HOP_BYTES < mm.CHUNK_BYTES
        assert rows[1].chunk_no == rows[0].chunk_no + 1
