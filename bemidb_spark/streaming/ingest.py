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
