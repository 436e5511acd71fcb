"""Warehouse ingest: layout is produced, idempotent, and value-identical."""

from __future__ import annotations

import os

from bemidb_spark import warehouse
from bemidb_spark.operators import tpch
from bemidb_spark.oracle import compare


def test_ingest_roundtrip_and_parity(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wh"))
    wh = warehouse.ensure_warehouse(spark, sf_dir, root=root)
    assert os.path.exists(os.path.join(wh, "lineitem.parquet"))
    # idempotent: marker short-circuits
    assert warehouse.ensure_warehouse(spark, sf_dir, root=root) == wh

    # row counts preserved
    for name in ("lineitem", "orders", "events"):
        src = spark.read.parquet(f"{sf_dir}/{name}.parquet").count()
        dst = spark.read.parquet(f"{wh}/{name}.parquet").count()
        assert src == dst, name

    # queries on the warehouse layout still match the oracle on the SOURCE dir
    for q in ("tpch_q1", "tpch_q3", "tpch_q12"):
        compare(tpch.QUERIES[q](spark, wh), tpch.ORACLES[q], sf_dir)
