"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The queries/oracles themselves live in ``bemidb_spark.operators.*``; each
operator module contributes its ``QUERIES`` / ``ORACLES`` registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_MODULES = [
    "bemidb_spark.operators.tpch",
    "bemidb_spark.operators.dedup",
    "bemidb_spark.operators.similarity",
    "bemidb_spark.operators.text",
    "bemidb_spark.operators.sql_surface",
    "bemidb_spark.operators.curation",
    "bemidb_spark.operators.mixture",
    "bemidb_spark.operators.multimodal",
    "bemidb_spark.operators.relational_ext",
    "bemidb_spark.streaming.windows",
    "bemidb_spark.streaming.stateful",
]


def _registries() -> tuple[dict, dict]:
    import importlib

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        queries.update(mod.QUERIES)
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from bemidb_spark.operators.tpch import q1

    return q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL for each query (tables pre-registered as views)."""
    return _registries()[1]
