"""Warehouse ingest: rewrite source tables into a scan-optimized layout.

This is the Spark-first analog of the reference's sync/storage layer: its
syncers never query source files directly — they rewrite everything into
~100 MB ZSTD parquet files with per-column min/max stats so the engine can
prune and parallelize scans (reference src/common/iceberg_table_writer.go:14-17
MAX_PARQUET_FILE_SIZE, src/common/storage_utils.go:93-160 stats collection).

Here the same idea, expressed with the Spark writer:

- **Multiple files per table** sized by row count (the local stand-in for the
  100 MB byte target — at cluster scale switch ``TARGET_ROWS`` for Iceberg's
  ``write.target-file-size-bytes``). A single-file table serializes every scan
  onto one task; N files → N-way parallel scans.
- **Range-partition + sort on the dominant filter/cluster key** (shipdate for
  lineitem, orderdate for orders, ts for events). Each file then covers a
  narrow key range, so parquet footer min/max stats let pushed-down range
  predicates skip whole files — the Spark equivalent of Iceberg manifest
  pruning, and the layout a date-partitioned 100 TB table would have.
- **Timestamps normalized to µs** on write (events arrives as TIMESTAMP(NANOS),
  which Spark's vectorized reader can't read natively).

Ingest is idempotent per (source dir): a marker file records completion, so
repeated bench runs pay it once. It is *excluded* from benchmark timing the
same way the reference excludes its syncer runs from query benchmarks.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bemidb_spark.tables import TABLES, load_tables

DEFAULT_WAREHOUSE_ROOT = os.environ.get(
    "SPARK_GRAFT_WAREHOUSE_ROOT", "/root/repo/.warehouse"
)

# Per-table layout: (range_key, sort_keys, target_rows_per_file).
# range_key=None → hash-repartition (no natural cluster key);
# target None → single file (dimension tables stay broadcast-sized).
_LAYOUT: dict[str, tuple[str | None, list[str] | None, int | None]] = {
    "lineitem": ("l_shipdate", ["l_shipdate", "l_orderkey"], 40_000),
    "orders": ("o_orderdate", ["o_orderdate", "o_orderkey"], 20_000),
    "events": ("ts", ["ts"], 25_000),
    "customer": (None, None, 8_000),
    "part": (None, None, 8_000),
    "documents": (None, None, 2_000),
    "embeddings": (None, None, 1_000),
}

_MARKER = "_INGEST_DONE"


def warehouse_dir(sf_dir: str, root: str = DEFAULT_WAREHOUSE_ROOT) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return os.path.join(root, tag)


def ingest(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Rewrite every source table into the optimized layout under out_dir."""
    src = load_tables(spark, sf_dir)
    counts = {}
    for name in TABLES:
        df = src[name]
        range_key, sort_keys, target = _LAYOUT.get(name, (None, None, None))
        if target:
            n_rows = df.count()
            n_files = max(1, -(-n_rows // target))
        else:
            n_files = 1
        if range_key and n_files > 1:
            out = df.repartitionByRange(n_files, F.col(range_key))
            out = out.sortWithinPartitions(*sort_keys)
        elif n_files > 1:
            out = df.repartition(n_files)
        else:
            out = df.coalesce(1)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        counts[name] = n_files
    with open(os.path.join(out_dir, _MARKER), "w") as fh:
        json.dump({"source": sf_dir, "files": counts}, fh)


def ensure_warehouse(
    spark: SparkSession, sf_dir: str, root: str = DEFAULT_WAREHOUSE_ROOT
) -> str:
    """Idempotently ingest sf_dir into the warehouse; return the warehouse dir."""
    out = warehouse_dir(sf_dir, root)
    marker = os.path.join(out, _MARKER)
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    ingest(spark, sf_dir, out)
    return out


def write_bucketed(
    spark: SparkSession,
    sf_dir: str,
    tables_and_keys: dict[str, tuple[str, int]] | None = None,
) -> None:
    """Write bucketed copies of join-heavy tables (co-located join layout).

    ``saveAsTable`` with ``bucketBy`` records bucket metadata in the session
    catalog; a later join on the bucket key reads both sides pre-partitioned
    and skips the shuffle entirely (verified by plan in tests). The cluster
    equivalent is Iceberg's bucket(N, key) partition transform.
    """
    tables_and_keys = tables_and_keys or {
        "lineitem": ("l_orderkey", 8),
        "orders": ("o_orderkey", 8),
    }
    import shutil

    src = load_tables(spark, sf_dir)
    warehouse_root = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for name, (key, n_buckets) in tables_and_keys.items():
        spark.sql(f"DROP TABLE IF EXISTS {name}_bucketed")
        # a previous session's managed-table dir blocks saveAsTable
        shutil.rmtree(os.path.join(warehouse_root, f"{name}_bucketed"), ignore_errors=True)
        (
            src[name]
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(f"{name}_bucketed")
        )


def write_partitioned_events(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """Write events hive-partitioned by event_date (Iceberg hidden-partitioning
    stand-in: the partition column is *derived* from ts at write time, and
    date-range predicates prune whole partition directories — verified by
    PartitionFilters in the scan plan)."""
    ev = load_tables(spark, sf_dir)["events"]
    path = os.path.join(out_dir, "events_partitioned.parquet")
    (
        ev.withColumn("event_date", F.col("ts").cast("date"))
        .repartition("event_date")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )
    return path


def zorder_key(col_a, col_b, bits: int = 16) -> "F.Column":
    """Interleaved-bit (Morton / Z-order) sort key over two rank-normalized
    int columns — pure Spark expressions, codegen'd per row.

    Sorting files by this key gives every file a *narrow min/max range on
    BOTH columns*, so parquet footer stats can skip files for predicates on
    either one — the property a single-column sort only provides for its
    leading column. This is the same layout Iceberg/Delta expose as
    ``zorder by (a, b)``; at 100 TB it is the difference between pruning on
    one dimension and pruning on all of them.
    """
    expr = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(col_a.cast("bigint"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(col_b.cast("bigint"), i).bitwiseAND(F.lit(1))
        expr = expr.bitwiseOR(
            F.shiftleft(bit_a, 2 * i + 1).bitwiseOR(F.shiftleft(bit_b, 2 * i))
        )
    return expr


def write_zordered(
    spark: SparkSession,
    df,
    out_path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> str:
    """Write df as n_files parquet files clustered by Z-order over (a, b).

    Values are min/max-normalized into the bit budget with one tiny
    aggregate (broadcast back as literals — no global window, nothing
    single-partition), then interleaved and range-sorted: one shuffle total,
    exactly what a production OPTIMIZE ... ZORDER rewrite costs. Quantile
    binning (approxQuantile boundaries) is the drop-in refinement when a
    column is heavily skewed.
    """
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    scale = (1 << bits) - 1

    def norm(col: str, lo, hi) -> "F.Column":
        span = max(int(hi) - int(lo), 1)
        return ((F.col(col) - F.lit(int(lo))) * scale / F.lit(span)).cast("bigint")

    keyed = df.withColumn("_za", norm(col_a, lo_a, hi_a)).withColumn(
        "_zb", norm(col_b, lo_b, hi_b)
    )
    keyed = keyed.withColumn("_zkey", zorder_key(F.col("_za"), F.col("_zb"), bits))
    (
        keyed.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_za", "_zb", "_zkey")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return out_path
