"""Write operators: full refresh, cursor append, key upsert/delete.

Spark-first re-expression of the reference's data-movement operators
(SURVEY.md §2.C):

- **replace_table** (C1/C2): write a fresh versioned location, atomically
  re-point the catalog — the reference's `-bemidb-syncing` rename dance
  (iceberg_table.go:46-70) collapses into a pointer swap. Readers of the old
  location are unaffected (snapshot isolation by immutability).
- **append_with_cursor** (C3): incremental append — read current max(cursor),
  take only newer source rows, write them as *additional files* in the live
  location (parquet append). The reference rewrites its last small file to keep
  ~100 MB targets (iceberg_table_writer.go:231-302); we defer that to a
  compaction pass (`compact_table`) the way Iceberg's rewrite_data_files does.
- **upsert_by_key** (C4): MERGE semantics — (current rows NOT matched by key)
  ∪ (new rows), written to a fresh location + swap. This is exactly the
  reference's per-file rewrite (iceberg_table_writer.go:304-378) lifted to a
  declarative anti-join; on Iceberg it becomes `MERGE INTO`, with file-level
  pruning done by the engine instead of hand-tracked key→file maps.
- **delete_by_key** (C5): anti-join rewrite + swap (`MERGE … THEN DELETE`).

Every operator is a full distributed plan (no collect of data rows); the only
driver-side action is the catalog pointer swap.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bemidb_spark.sources.catalog import Catalog


def _columns_meta(df: DataFrame) -> list[dict]:
    return [
        {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
        for f in df.schema.fields
    ]


def read_table(spark: SparkSession, catalog: Catalog, schema: str, table: str) -> DataFrame:
    return spark.read.parquet(catalog.location(schema, table))


def replace_table(
    catalog: Catalog,
    schema: str,
    table: str,
    df: DataFrame,
    n_files: int | None = None,
    drop_old: bool = True,
) -> str:
    """Full-refresh: write df to a fresh location, swap the catalog pointer."""
    loc = catalog.new_location(schema, table)
    out = df.repartition(n_files) if n_files else df
    out.write.mode("overwrite").parquet(loc)
    old = catalog.commit_table(schema, table, loc, _columns_meta(df))
    if old and drop_old:
        shutil.rmtree(old, ignore_errors=True)
    return loc


def append_with_cursor(
    spark: SparkSession,
    catalog: Catalog,
    schema: str,
    table: str,
    source: DataFrame,
    cursor_col: str,
) -> int:
    """Append source rows with cursor > current max(cursor). Returns row count.

    Mirrors the reference's cursor append (amplitude syncer.go:35-75): the
    cursor read is one tiny aggregation on the live table; the append adds new
    parquet files without touching existing ones.
    """
    current = read_table(spark, catalog, schema, table)
    max_cursor = current.agg(F.max(cursor_col).alias("m")).collect()[0].m
    fresh = source if max_cursor is None else source.filter(F.col(cursor_col) > F.lit(max_cursor))
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(catalog.location(schema, table))
    return n


def upsert_by_key(
    spark: SparkSession,
    catalog: Catalog,
    schema: str,
    table: str,
    updates: DataFrame,
    key_cols: list[str],
) -> str:
    """MERGE: matched rows replaced by updates, unmatched inserted."""
    current = read_table(spark, catalog, schema, table)
    kept = current.join(updates.select(*key_cols), on=key_cols, how="left_anti")
    merged = kept.unionByName(updates)
    return replace_table(catalog, schema, table, merged)


def delete_by_key(
    spark: SparkSession,
    catalog: Catalog,
    schema: str,
    table: str,
    keys: DataFrame,
    key_cols: list[str],
) -> str:
    """MERGE ... WHEN MATCHED THEN DELETE."""
    current = read_table(spark, catalog, schema, table)
    remaining = current.join(keys.select(*key_cols), on=key_cols, how="left_anti")
    return replace_table(catalog, schema, table, remaining)


def compact_table(
    spark: SparkSession,
    catalog: Catalog,
    schema: str,
    table: str,
    target_rows_per_file: int = 1_000_000,
) -> str:
    """Rewrite a table's small files into right-sized ones (rewrite_data_files)."""
    df = read_table(spark, catalog, schema, table)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    return replace_table(catalog, schema, table, df, n_files=n_files)
