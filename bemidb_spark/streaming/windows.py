"""Structured Streaming operators over the `events` table.

The reference has **no** streaming surface (its CDC path is stubbed and panics
— reference syncer-postgres/lib/syncer.go:37-42); these are the parity-plus
operators a streaming ingest pipeline needs, built on Structured Streaming:

- **tumbling window** counts/sums with a watermark (late-data bound),
- **sliding window** activity,
- **session windows** (native ``session_window`` with a 30-minute gap).

Test harness: the parquet file acts as a bounded file-source stream; results
land in a memory sink (complete mode) and are returned as a DataFrame, so the
driver's oracle gate can diff them against batch SQL — the streaming results
of a bounded input must equal the batch answer (Dataflow model equivalence).
In production the same plans run unbounded with append mode into an Iceberg/
Kafka sink; the memory sink is test plumbing only.

Aggregates are decimal-exact (order-independent) so micro-batch boundaries
can't perturb values.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

SESSION_GAP = "30 minutes"
_counter = itertools.count()


_SCHEMA_MEMO: dict[tuple, object] = {}


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a bounded file-source stream (ns or µs timestamps)."""
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # schema inference is a footer-only batch read (~40 ms) repeated by every
    # streaming entry; the file is immutable test data, so memo on
    # (path, size, mtime) — any rewrite invalidates
    st = os.stat(path)
    skey = (path, st.st_size, st.st_mtime_ns)
    schema = _SCHEMA_MEMO.get(skey)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_MEMO[skey] = schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Watermarks require TIMESTAMP (not NTZ); the session timezone is pinned to
    # UTC so NTZ -> TIMESTAMP is value-preserving here.
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "complete",
    no_data_batches: bool = True,
) -> str:
    """Run a bounded streaming aggregation into a memory sink; return table name.

    The number of state-store partitions binds to spark.sql.shuffle.partitions
    at query start, and each one pays a per-micro-batch state store + worker
    cost — at gate scale (bounded sf0.01 input) 32 stores is pure overhead
    (measured 10 s -> 2.3 s for the stateful profile query at 8). Partition
    count never changes results (hash partitioning; aggregates here are
    order-independent), and an unbounded production run sizes this to the
    cluster instead.
    """
    spark = df.sparkSession
    table = f"{name}_{next(_counter)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # Default width is INPUT-ADAPTIVE (guide §2: scale-dependent settings
    # must derive from the data, not a constant): when the session runs the
    # small-input profile (apply_input_size_policy turned AQE off — the
    # bounded sub-64 MB test corpus), 2 state stores cover the work and the
    # per-store setup/commit overhead is minimized (r10 sweep,
    # tools/probe_streaming_r10.json, sf0.01 warm runs: 2 stores
    # 0.97-1.20 s vs 1 store 1.11-1.43 s vs 8 stores 1.45-1.66 s vs 32
    # stores 2.0-3.0 s — the floor is micro-batch machinery, ~0.4 s
    # trivial_stream); at scale the session's own shuffle parallelism
    # (cluster-derived) holds. Partition count never changes results (hash
    # partitioning; every stateful update here is per-key and
    # arrival-order independent).
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shuffle_width(spark))
    # no_data_batches=False skips the trailing empty micro-batch Spark runs
    # after the data is drained. That batch exists to advance the watermark
    # and emit/evict watermark-gated state — callers may disable it ONLY
    # when their sink output cannot depend on it (e.g. a stream-stream INNER
    # join: matches emit in the data batch; the no-data batch merely evicts
    # expired join state, which a bounded run discards at stop() anyway).
    # Measured: the join entry's no-data batch re-ran the full join plan for
    # 1.0-1.3 s of its 2.9 s run (r10 probe). Entries whose output the
    # watermark GATES (append-mode aggregations: late_data_drop) must keep
    # the default — their final windows emit in exactly that batch.
    prev_ndb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    if not no_data_batches:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(table)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        # Watermark-drop accounting for the run (pytest hook; the late-data
        # entry asserts stragglers were actually dropped, not just absent).
        import json as _json

        dropped = 0
        for prog in q.recentProgress:
            if not isinstance(prog, dict):  # StreamingQueryProgress object
                prog = _json.loads(prog.json)
            for op in (prog.get("stateOperators") or []):
                dropped += op.get("numRowsDroppedByWatermark", 0) or 0
        LAST_DROPPED_BY_WATERMARK[name] = dropped
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb)
    return table


def _stream_shuffle_width(spark: SparkSession) -> str:
    """State-store partition count for a bounded streaming run (see
    _run_to_memory docstring for the measurement and safety argument)."""
    env = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE")
    if env:
        return env
    small = spark.conf.get("spark.sql.adaptive.enabled") == "false"
    return "2" if small else spark.conf.get("spark.sql.shuffle.partitions")


# per-runner-name numRowsDroppedByWatermark from the most recent run
LAST_DROPPED_BY_WATERMARK: dict[str, int] = {}


# ---------------------------------------------------------------------------
# tumbling daily window per event_type, 1h watermark
# ---------------------------------------------------------------------------
def _tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("total_value"),
        )
    )
    table = _run_to_memory(agg, "stream_tumbling")
    return spark.sql(f"""
        SELECT CAST(w.start AS DATE) AS day, event_type, n, total_value
        FROM {table}
        ORDER BY day, event_type
    """)


QUERIES["streaming_tumbling_daily"] = _tumbling
ORACLES["streaming_tumbling_daily"] = """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
"""


# ---------------------------------------------------------------------------
# sliding 2-day window stepping 1 day, global activity
# ---------------------------------------------------------------------------
def _sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # COUNT(DISTINCT) is not streamable; the streaming stage keeps per-user
    # partial counts per window (bounded state) and the exact distinct count is
    # a trivial batch aggregation over the sink — the standard two-phase shape.
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 days", "1 day").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    table = _run_to_memory(agg, "stream_sliding")
    return spark.sql(f"""
        SELECT CAST(w.start AS DATE) AS win_start,
               SUM(n) AS n,
               COUNT(*) AS n_users
        FROM {table}
        GROUP BY CAST(w.start AS DATE)
        ORDER BY win_start
    """)


QUERIES["streaming_sliding_activity"] = _sliding
# A row lands in every 2-day window covering its day: the window starting on
# its day and the one starting the day before.
ORACLES["streaming_sliding_activity"] = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ),
    expanded AS (
      SELECT day AS win_start, user_id FROM daily
      UNION ALL
      SELECT day - INTERVAL 1 DAY, user_id FROM daily
    )
    SELECT CAST(win_start AS DATE) AS win_start, COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM expanded
    GROUP BY 1
    ORDER BY win_start
"""


# ---------------------------------------------------------------------------
# session windows: 30-minute-gap sessions per user
# ---------------------------------------------------------------------------
def _sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("session_value"),
        )
    )
    table = _run_to_memory(agg, "stream_sessions")
    return spark.sql(f"""
        SELECT user_id, CAST(w.start AS TIMESTAMP_NTZ) AS session_start, n_events, session_value
        FROM {table}
        ORDER BY user_id, session_start
    """)


QUERIES["streaming_session_windows"] = _sessions
# Batch equivalent: a session break is a >30-minute gap; session_start is the
# MIN ts of each run (classic gaps-and-islands).
ORACLES["streaming_session_windows"] = """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# streaming exact dedup: first-seen (user_id, event_type) keys
# ---------------------------------------------------------------------------
def _dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming `dropDuplicates` on the key columns — the stateful exact-
    dedup shape: state = seen-key hash table, each micro-batch emits only
    first-seen keys (append mode). Only the key columns are projected, so the
    result is deterministic regardless of which physical row arrived first.
    In production the state is bounded with ``dropDuplicatesWithinWatermark``
    (keys expire after the lateness horizon); the bounded-input test keeps
    full state so the streaming answer equals batch DISTINCT exactly.
    """
    ev = _events_stream(spark, sf_dir)
    dedup = ev.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])
    table = _run_to_memory(dedup, "stream_dedup", output_mode="append")
    return spark.sql(f"SELECT user_id, event_type FROM {table} ORDER BY user_id, event_type")


QUERIES["streaming_dedup_keys"] = _dedup_keys
ORACLES["streaming_dedup_keys"] = """
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# stream-stream interval join: purchase within 10 minutes of a click
# ---------------------------------------------------------------------------
def _stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks on both sides and an event-
    time-bounded condition — the attribution-join shape. The time bound
    (`buy_ts` in (click_ts, click_ts + 10 min]) lets Spark expire join state
    past the watermark horizon, so state is bounded at any scale; the join
    itself shuffles both streams on user_id only. Bounded input ⇒ result
    equals the batch interval join (oracle)."""
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter("event_type = 'click'")
        .select("user_id", F.col("ts").alias("click_ts"),
                F.col("event_id").alias("click_id"))
        .withWatermark("click_ts", "1 hour")
    )
    buys = (
        ev.filter("event_type = 'purchase'")
        .select(F.col("user_id").alias("buy_user"), F.col("ts").alias("buy_ts"),
                F.col("event_id").alias("buy_id"), "value")
        .withWatermark("buy_ts", "1 hour")
    )
    joined = clicks.join(
        buys,
        F.expr("user_id = buy_user AND buy_ts > click_ts "
               "AND buy_ts <= click_ts + INTERVAL 10 MINUTES"),
        "inner",
    )
    # inner-join results emit in their data batch; the no-data batch would
    # only evict expired join state (see _run_to_memory) — skip it
    table = _run_to_memory(joined, "stream_join", output_mode="append",
                           no_data_batches=False)
    return spark.sql(f"""
        SELECT user_id, click_id, buy_id,
               CAST(click_ts AS TIMESTAMP_NTZ) AS click_ts,
               CAST(buy_ts AS TIMESTAMP_NTZ) AS buy_ts,
               unix_micros(buy_ts) - unix_micros(click_ts) AS lag_us,
               value
        FROM {table}
        ORDER BY user_id, click_id, buy_id
    """)


QUERIES["streaming_click_purchase_join"] = _stream_join
ORACLES["streaming_click_purchase_join"] = """
    SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS buy_id,
           c.ts AS click_ts, p.ts AS buy_ts,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us,
           p.value AS value
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY user_id, click_id, buy_id
"""


# ---------------------------------------------------------------------------
# late-data drop: append-mode tumbling agg where the watermark drops
# planted stragglers (the one watermark behavior a complete-mode bounded
# stream can never show)
# ---------------------------------------------------------------------------
LATE_DELAY = "1 hour"
LATE_MOD = 17                       # every 17th event from the early days...
LATE_CUTOFF = "2024-01-11 00:00:00"  # ...before this instant is held back
BATCH_SPLIT = "2024-01-21 00:00:00"  # punctual rows before this go in batch 0
MID_SPLIT = "2024-01-26 00:00:00"   # batch 1 = punctual [Jan 21, Jan 26)


def _stage_late_batches(spark: SparkSession, sf_dir: str) -> str:
    """Write events as three parquet files with controlled arrival order.

    batch0 = punctual rows from the first 20 days; batch1 = punctual days
    21-25; batch2 = the rest PLUS stragglers held back from days 1-10.
    File-source order is pinned via mtime (latestFirst=false lists
    oldest-modified first). Three batches, not two, because Spark only
    drops a late row whose window state was ALREADY evicted in an earlier
    batch (a later-than-watermark row whose window is still live gets
    merged — the watermark is a lower bound, verified empirically): the
    watermark set by batch0 (~Jan 20) evicts the straggler windows during
    batch1, so the stragglers arriving in batch2 hit evicted state and are
    dropped (visible as numRowsDroppedByWatermark). Test plumbing only,
    like the memory sink: production late data arrives from the unbounded
    source itself.
    """
    import hashlib
    import shutil
    import tempfile

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"bemidb_late_stage_{key}")
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    late = (f"(event_id % {LATE_MOD} = 0 AND "
            f"ts < TIMESTAMP '{LATE_CUTOFF}')")
    split = f"ts < TIMESTAMP '{BATCH_SPLIT}'"
    mid = f"ts < TIMESTAMP '{MID_SPLIT}'"
    # one partitioned write instead of three coalesce(1) jobs (r10: the
    # staging was ~1.2 s of the entry, 3 scans of the source for disjoint
    # slices one pass can route); repartition(_b) makes each partition
    # directory exactly one file, which the mtime-ordering below requires
    batch_no = (f"CASE WHEN {late} OR NOT ({mid}) THEN 2 "
                f"WHEN {split} THEN 0 ELSE 1 END")
    tmp = os.path.join(root, "_tmp")
    (ev.withColumn("_b", F.expr(batch_no)).repartition(1)
     .write.partitionBy("_b").parquet(tmp))
    for i in range(3):
        part_dir = os.path.join(tmp, f"_b={i}")
        if not os.path.isdir(part_dir):  # empty slice: partitionBy writes
            ev.limit(0).coalesce(1).write.parquet(part_dir)  # no directory
        part = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        dst = os.path.join(root, f"batch{i}.parquet")
        shutil.move(os.path.join(part_dir, part), dst)
        os.utime(dst, (1_700_000_000 + i * 1000,) * 2)
    shutil.rmtree(tmp)
    return root


def _late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _stage_late_batches(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(root, "batch0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(root)
    )
    agg = (
        stream.withWatermark("ts", LATE_DELAY)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("total_value"),
        )
    )
    # Append mode: a window row is emitted exactly once, when the watermark
    # passes its end; stragglers behind the watermark are dropped, and the
    # still-open final day stays in state (never emitted on this bounded run).
    table = _run_to_memory(agg, "stream_late_drop", output_mode="append")
    return spark.sql(f"""
        SELECT CAST(w.start AS DATE) AS day, n, total_value
        FROM {table}
        ORDER BY day
    """)


QUERIES["streaming_late_data_drop"] = _late_drop
# The batch equivalent of what append mode must produce: per-day aggregates
# EXCLUDING the stragglers (dropped behind the watermark), over only the
# windows the final watermark (global max ts - delay) has closed.
ORACLES["streaming_late_data_drop"] = f"""
    WITH wm AS (SELECT MAX(ts) - INTERVAL 1 HOUR AS final_wm FROM events)
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events, wm
    WHERE NOT (event_id % {LATE_MOD} = 0 AND ts < TIMESTAMP '{LATE_CUTOFF}')
      AND date_trunc('day', ts) + INTERVAL 1 DAY <= wm.final_wm
    GROUP BY 1
    ORDER BY day
"""


# ---------------------------------------------------------------------------
# stream-static join: at-ingest decontamination against an eval-set index
# ---------------------------------------------------------------------------
def _streaming_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join — the one streaming join shape the other entries
    don't cover (stream-stream interval join exists; this is the lookup-
    against-a-fixed-reference-table shape). Arriving training documents are
    checked against the STATIC eval-benchmark shingle index exactly as the
    batch ``decontaminate_eval_overlap`` operator defines it (same n-gram
    size, eval source, and threshold — operators/curation.py), so the
    bounded-input streaming result equals the batch oracle.

    Plan at scale: the static side is the DISTINCT eval shingle set — small
    relative to the corpus and broadcast by Spark's stream-static planning
    (re-resolved per micro-batch, so an updated eval set is picked up
    without restart). The stream side is map-only per batch (explode
    distinct shingles -> broadcast hash lookup) into one update-mode
    aggregation keyed by doc_id; in an unbounded run a doc's counter state
    is dropped via event-time watermark once the doc's arrival window
    closes (docs arrive once; the bounded test keeps full state so
    streaming == batch exactly).
    """
    import os as _os

    from bemidb_spark.operators._xengine import shingles, words
    from bemidb_spark.operators.curation import (
        DECON_MIN_SHARED,
        DECON_NGRAM,
        EVAL_SOURCE,
    )

    w = words("text", spark=True)
    sh = shingles("w", DECON_NGRAM, spark=True)
    path = _os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema

    # STATIC side: distinct shingles of the held-out eval split
    ev = (
        spark.read.parquet(path)
        .where(F.col("source") == EVAL_SOURCE)
        .selectExpr(f"{w} AS w")
        .selectExpr(f"explode(array_distinct({sh})) AS s")
        .distinct()
    )
    # STREAM side: non-eval docs, one row per distinct shingle
    docs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .where(F.col("source") != EVAL_SOURCE)
        .selectExpr("doc_id", f"{w} AS w")
        .selectExpr("doc_id", f"explode(array_distinct({sh})) AS ds")
    )
    hits = (
        docs.join(ev, docs.ds == ev.s, "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("s").isNotNull(), 1).otherwise(0))
            .cast("long").alias("shared_ngrams")
        )
    )
    table = _run_to_memory(hits, "stream_decon", output_mode="update")
    return spark.sql(f"""
        SELECT doc_id, shared_ngrams,
               CASE WHEN shared_ngrams >= {DECON_MIN_SHARED}
                    THEN 1 ELSE 0 END AS contaminated
        FROM (
          SELECT doc_id, shared_ngrams,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY shared_ngrams DESC) AS rk
          FROM {table}
        ) final WHERE rk = 1
        ORDER BY doc_id
    """)


QUERIES["streaming_decontaminate"] = _streaming_decontaminate
# Batch equivalent: the decontaminate_eval_overlap definition verbatim
# (operators/curation.py) — shared distinct n-grams with the eval split,
# thresholded; zero-overlap docs report 0.
from bemidb_spark.operators.curation import _decontaminate_sql as _decon_oracle  # noqa: E402

ORACLES["streaming_decontaminate"] = _decon_oracle(False).replace(
    "COALESCE(h.n_shared, 0) AS shared_ngrams",
    "CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS shared_ngrams",
)
