"""Streaming ingest into the warehouse catalog: the continuous-syncer path.

The reference's CDC syncer is stubbed (syncer-postgres/lib/syncer.go:37-42
panics); its shipped syncers are batch pulls. This module is the streaming
replacement a 100 TB pipeline actually runs: a Structured Streaming source
(file drop-box, Kafka, CDC feed) appended into a catalog table with
exactly-once semantics.

Exactly-once story — all Spark-native, no custom bookkeeping:
- The parquet sink + checkpoint directory give idempotent, exactly-once file
  output per micro-batch (the sink's transaction log in `_spark_metadata`
  records committed batches; replays are no-ops).
- ``Trigger.AvailableNow`` drains everything available then stops — the
  incremental-batch operating mode (run from cron, process only NEW source
  files since the last checkpoint, exit). The same query with a processing-
  time trigger is the always-on mode; the plan is identical.
- The catalog commit happens after the stream drains; the table location is
  stable across runs (append-only), so readers never see a half-written
  batch directory swap.

At scale: the file source lists only unseen files (checkpointed), each
micro-batch is partition-parallel, and the sink writes one file per output
partition — the same append shape as `sources/writer.append_with_cursor`,
with the watermark/offset tracking moved into Spark's checkpoint instead of
a cursor column.
"""

from __future__ import annotations

import os

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
    query = (
        stream_df.writeStream.format("parquet")
        .option("path", location)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    n_batches = 0
    query.awaitTermination()
    progress = query.recentProgress
    n_batches = len([p for p in progress if p.get("numInputRows", 0) > 0])
    spark.catalog.refreshByPath(location)
    catalog.commit_table(schema, table, location, _columns_meta(stream_df))
    return n_batches
