"""Differential tests: every TPC-H battery query vs the DuckDB oracle.

This mirrors the driver's correctness gate (row count + columns +
order-insensitive value multiset) at sf0.001 for speed; the driver itself runs
sf0.01.
"""

from __future__ import annotations

import pytest

from bemidb_spark.operators import tpch
from bemidb_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_oracle_parity(spark, sf_dir, name):
    df = tpch.QUERIES[name](spark, sf_dir)
    compare(df, tpch.ORACLES[name], sf_dir)


def test_q1_nonempty(spark, sf_dir):
    assert tpch.QUERIES["tpch_q1"](spark, sf_dir).count() > 0
