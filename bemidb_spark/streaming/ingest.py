"""Streaming ingest into the warehouse catalog: the continuous-syncer path.

The reference's CDC syncer is stubbed (syncer-postgres/lib/syncer.go:37-42
panics); its shipped syncers are batch pulls. This module is the streaming
replacement a 100 TB pipeline actually runs: a Structured Streaming source
(file drop-box, Kafka, CDC feed) appended into a catalog table with
exactly-once semantics.

Exactly-once story:
- ``foreachBatch`` routes every micro-batch through the same plain-parquet
  append path batch writes use, so the table location never grows a
  ``_spark_metadata`` sink log. (A direct parquet *sink* would write one —
  and a location with a sink log is read through it EXCLUSIVELY, silently
  hiding pre-existing table files and later batch appends; mixed
  stream/batch ingest would lose data. ADVICE r2 high.)
- Idempotent replay: each micro-batch lands as deterministically-named
  files (``sb{batch_id}-{i}.parquet``) moved in from a staging directory,
  and a ``{batch_id}.done`` marker under the checkpoint records the commit.
  A batch replayed after a crash first clears its own partial files, then
  re-moves a fresh set — convergent, so at-least-once retries become
  exactly-once file state.
- ``Trigger.AvailableNow`` drains everything available then stops — the
  incremental-batch operating mode (run from cron, process only NEW source
  files since the last checkpoint, exit). The same query with a processing-
  time trigger is the always-on mode; the plan is identical.
- The catalog commit happens after the stream drains; the table location is
  stable across runs (append-only), so readers never see a half-written
  batch directory swap.

At scale: the file source lists only unseen files (checkpointed), each
micro-batch is partition-parallel, and the staging write is one distributed
parquet job per batch — the file moves are metadata-only renames on the
same filesystem (O(#files), driver-side, no data movement), the same append
shape as `sources/writer.append_with_cursor` with offset tracking moved
into Spark's checkpoint instead of a cursor column.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from bemidb_spark.sources.catalog import Catalog
from bemidb_spark.sources.writer import _columns_meta


def stream_append(
    spark: SparkSession,
    catalog: Catalog,
    schema: str,
    table: str,
    stream_df: DataFrame,
    checkpoint_dir: str,
) -> int:
    """Drain all currently-available input from ``stream_df`` into
    ``schema.table`` (exactly-once via the checkpoint), commit the catalog,
    and return the number of batches processed this run.

    ``stream_df`` must be a streaming DataFrame (``spark.readStream...``,
    transformations allowed — the full stateless DataFrame surface plus
    watermarked aggregations in append mode).
    """
    if not stream_df.isStreaming:
        raise ValueError("stream_append needs a streaming DataFrame")
    try:
        location = catalog.location(schema, table)
    except KeyError:
        location = catalog.new_location(schema, table)
    os.makedirs(location, exist_ok=True)
    marker_dir = os.path.join(checkpoint_dir, "committed_batches")
    os.makedirs(marker_dir, exist_ok=True)
    staging_root = os.path.join(checkpoint_dir, "staging")
    done = {"batches": 0}

    def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"{batch_id}.done")
        if os.path.exists(marker):
            return  # checkpoint replayed a batch we fully committed
        staging = os.path.join(staging_root, str(batch_id))
        shutil.rmtree(staging, ignore_errors=True)
        batch_df.write.mode("overwrite").parquet(staging)
        parts = sorted(glob.glob(os.path.join(staging, "part-*")))
        # clear partial files from an earlier crashed attempt of THIS batch,
        # then move the fresh set in under deterministic names
        for stale in glob.glob(os.path.join(location, f"sb{batch_id}-*.parquet")):
            os.remove(stale)
        for i, src in enumerate(parts):
            dst = os.path.join(location, f"sb{batch_id}-{i:05d}.parquet")
            try:
                os.replace(src, dst)  # same-FS: atomic metadata rename
            except OSError:  # cross-device staging (EXDEV): copy+delete
                shutil.move(src, dst)
        with open(marker, "w") as f:
            f.write("ok")
        shutil.rmtree(staging, ignore_errors=True)
        done["batches"] += 1

    query = (
        stream_df.writeStream.foreachBatch(_commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    query.awaitTermination()
    spark.catalog.refreshByPath(location)
    catalog.commit_table(schema, table, location, _columns_meta(stream_df))
    return done["batches"]


def stream_apply_cdc(
    spark: SparkSession,
    catalog: Catalog,
    schema: str,
    table: str,
    stream_df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    tombstone: str = "D",
    checkpoint_dir: str | None = None,
) -> int:
    """Continuously MERGE a change stream into ``schema.table``.

    The streaming counterpart of the batch `cdc_apply_changes` operator (and
    the continuous mode the reference's stubbed CDC syncer never shipped,
    syncer.go:37-42): each micro-batch of op-coded change rows
    (``op_col`` = ``tombstone`` → delete, anything else → upsert) is first
    reduced to the LAST change per key by ``seq_col`` (commit order), then
    routed through the existing writer MERGE ops — so on key-bucketed tables
    each batch rewrites only the partitions holding touched keys.

    Exactly-once: micro-batches arrive serially in ascending batch_id;
    committed batch ids are markered under the checkpoint, and replaying a
    marker-less batch is convergent (same keys → same final rows). Returns
    batches applied this run. ``Trigger.AvailableNow`` semantics, like
    ``stream_append``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bemidb_spark.sources.writer import delete_by_key, upsert_by_key

    if not stream_df.isStreaming:
        raise ValueError("stream_apply_cdc needs a streaming DataFrame")
    if checkpoint_dir is None:
        raise ValueError("checkpoint_dir is required (exactly-once markers)")
    marker_dir = os.path.join(checkpoint_dir, "applied_batches")
    os.makedirs(marker_dir, exist_ok=True)
    done = {"batches": 0}
    data_cols = [
        c for c in stream_df.columns if c not in (op_col, seq_col)
    ]

    def _apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"{batch_id}.done")
        if os.path.exists(marker):
            return
        w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
        last = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # pin the reduced batch before multiple passes (ops read it twice)
        last = last.localCheckpoint(eager=True)
        try:
            catalog.location(schema, table)
        except KeyError:
            from bemidb_spark.sources.writer import replace_table

            empty = spark.createDataFrame(
                [], last.select(*data_cols).schema
            )
            replace_table(catalog, schema, table, empty)
        upserts = last.filter(F.col(op_col) != tombstone).select(*data_cols)
        deletes = last.filter(F.col(op_col) == tombstone).select(*key_cols)
        if not upserts.isEmpty():
            upsert_by_key(spark, catalog, schema, table, upserts, key_cols)
        if not deletes.isEmpty():
            delete_by_key(spark, catalog, schema, table, deletes, key_cols)
        with open(marker, "w") as f:
            f.write("ok")
        done["batches"] += 1

    query = (
        stream_df.writeStream.foreachBatch(_apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    query.awaitTermination()
    return done["batches"]
