"""Materialized views: registry + CREATE / REFRESH / DROP / RENAME.

Re-expression of the reference's matview operator set (C6 — reference
server/query_remapper.go:566-711, server/iceberg_writer.go:23-86):

- CREATE stores the definition SQL in the catalog and (unless WITH NO DATA)
  materializes it as a physical table.
- REFRESH re-runs the definition into a fresh location + atomic swap — the
  reference's `-syncing` table swap, as a pointer commit.
- REFRESH CONCURRENTLY runs the rebuild on a background thread (the
  reference's goroutine) while readers keep the old snapshot.
- DROP / RENAME are catalog operations.

The definition executes through ``spark.sql`` against whatever views/tables
are registered in the session — same as the reference remapping the definition
SQL through its engine.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

from bemidb_spark.sources.catalog import Catalog
from bemidb_spark.sources.writer import read_table, replace_table

MATVIEW_SCHEMA = "matviews"


def create_materialized_view(
    spark: SparkSession,
    catalog: Catalog,
    name: str,
    definition: str,
    with_data: bool = True,
) -> None:
    catalog.put_matview(MATVIEW_SCHEMA, name, definition)
    if with_data:
        refresh_materialized_view(spark, catalog, name)
    else:
        # WITH NO DATA: register an empty table with the definition's schema.
        empty = spark.sql(definition).limit(0)
        replace_table(catalog, MATVIEW_SCHEMA, name, empty, n_files=1)


def refresh_materialized_view(
    spark: SparkSession, catalog: Catalog, name: str, concurrently: bool = False
) -> threading.Thread | None:
    definition = catalog.matview_definition(MATVIEW_SCHEMA, name)

    def _rebuild() -> None:
        df = spark.sql(definition)
        replace_table(catalog, MATVIEW_SCHEMA, name, df)

    if concurrently:
        t = threading.Thread(target=_rebuild, name=f"refresh-{name}", daemon=True)
        t.start()
        return t
    _rebuild()
    return None


def read_materialized_view(
    spark: SparkSession, catalog: Catalog, name: str
) -> DataFrame:
    return read_table(spark, catalog, MATVIEW_SCHEMA, name)


def drop_materialized_view(catalog: Catalog, name: str) -> None:
    from bemidb_spark.sources.writer import drop_table_files

    catalog.drop_matview(MATVIEW_SCHEMA, name)
    drop_table_files(catalog, MATVIEW_SCHEMA, name)


def rename_materialized_view(catalog: Catalog, name: str, new_name: str) -> None:
    definition = catalog.matview_definition(MATVIEW_SCHEMA, name)
    catalog.put_matview(MATVIEW_SCHEMA, new_name, definition)
    catalog.drop_matview(MATVIEW_SCHEMA, name)
    catalog.rename_table(MATVIEW_SCHEMA, name, new_name)
