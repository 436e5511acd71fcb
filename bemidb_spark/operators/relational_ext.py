"""Extended relational operators: as-of join, deterministic sampling, n-gram stats.

Operators the reference lacks but a time-series / training-data engine needs,
each expressed as a composition of built-in DataFrame ops (SURVEY.md's
"custom operators" guidance: composition first, Pandas UDF only if semantics
demand — none of these do):

- **as-of join**: every purchase event matched to the same user's most recent
  *prior* 'view' event. Implemented with a single window (running MAX of
  view-times up to the previous row) — one shuffle on user_id, no self-join,
  no per-key loop; identical SQL runs on the oracle.
- **deterministic sampling**: hash-bernoulli and stratified top-k-per-stratum
  (functions/sampling.py) — partition-invariant and reproducible, unlike
  `df.sample`.
- **n-gram stats**: global top-20 word bigrams (explode → count → rank),
  the corpus-statistics shape (map-side partial counts, one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bemidb_spark.operators._xengine import shingles, words
from bemidb_spark.tables import register_views

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

SAMPLE_FRACTION = 0.1
STRATUM_K = 5


def _register_sql(name: str, spark_sql: str, duck_sql: str | None = None) -> None:
    def run(spark: SparkSession, sf_dir: str, _sql: str = spark_sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    QUERIES[name] = run
    ORACLES[name] = duck_sql if duck_sql is not None else spark_sql


# ---------------------------------------------------------------------------
# as-of join: purchase → latest prior view of the same user
# ---------------------------------------------------------------------------
def _asof(spark: bool) -> str:
    # exact µs difference — DuckDB's date_diff counts boundary *crossings*,
    # not elapsed time, so second-granularity diffs would disagree
    gap = (
        "unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(asof_view_ts AS TIMESTAMP))"
        if spark
        else "epoch_us(ts) - epoch_us(asof_view_ts)"
    )
    return f"""
    SELECT event_id, user_id, ts AS purchase_ts, asof_view_ts,
           CAST({gap} AS BIGINT) AS gap_micros
    FROM (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS asof_view_ts
      FROM events
    ) marked
    WHERE event_type = 'purchase'
    ORDER BY user_id, purchase_ts, event_id
    """


_register_sql("asof_join_purchase_view", _asof(True), _asof(False))


# ---------------------------------------------------------------------------
# FORWARD as-of join (r7): for each purchase, the NEXT 'view' event of the
# same user strictly after it — the mirror of the backward as-of above
# (reaction-time / attribution pipelines need both directions). Same
# windowed composition (Spark has no native as-of; a MIN over a FOLLOWING
# row frame expresses it with one sort, no join), same exact-µs gap.
# ---------------------------------------------------------------------------
def _asof_fwd(spark: bool) -> str:
    gap = (
        "unix_micros(CAST(next_view_ts AS TIMESTAMP)) - unix_micros(CAST(ts AS TIMESTAMP))"
        if spark
        else "epoch_us(next_view_ts) - epoch_us(ts)"
    )
    return f"""
    SELECT event_id, user_id, ts AS purchase_ts, next_view_ts,
           CAST({gap} AS BIGINT) AS gap_micros
    FROM (
      SELECT event_id, user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_view_ts
      FROM events
    ) marked
    WHERE event_type = 'purchase'
    ORDER BY user_id, purchase_ts, event_id
    """


_register_sql("asof_forward_next_view", _asof_fwd(True), _asof_fwd(False))


# ---------------------------------------------------------------------------
# deterministic bernoulli sample of documents (hash-based, salt 's1')
# ---------------------------------------------------------------------------
_SAMPLE_SPARK = f"""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(conv(substring(md5(concat('s1:', CAST(doc_id AS STRING))), 1, 8), 16, 10)
               AS BIGINT) / 4294967296.0 < {SAMPLE_FRACTION}
    ORDER BY doc_id
"""
_SAMPLE_DUCK = f"""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST('0x' || substr(md5(concat('s1:', CAST(doc_id AS VARCHAR))), 1, 8)
               AS BIGINT) / 4294967296.0 < {SAMPLE_FRACTION}
    ORDER BY doc_id
"""
_register_sql("sample_hash_bernoulli", _SAMPLE_SPARK, _SAMPLE_DUCK)


# ---------------------------------------------------------------------------
# stratified sample: k docs per language, chosen by hash order (reproducible)
# ---------------------------------------------------------------------------
def _stratified(spark: bool) -> str:
    """k docs per language in hash order. The Spark side uses two-phase
    top-k (rank within (lang, 64-way hash shard) first, then rank the
    <=64·k survivors per lang) — a handful of languages over a 100 TB corpus
    would otherwise each funnel through ONE window partition. The oracle
    keeps the direct single-window form; the top-k of per-shard top-ks is
    the same set."""
    h = (
        "CAST(conv(substring(md5(concat('s2:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        if spark
        else "CAST('0x' || substr(md5(concat('s2:', CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT)"
    )
    if spark:
        inner = f"""
      SELECT lang, doc_id, h FROM (
        SELECT lang, doc_id, h,
               ROW_NUMBER() OVER (PARTITION BY lang, pmod(h, 64)
                                  ORDER BY h, doc_id) AS rk1
        FROM (SELECT lang, doc_id, {h} AS h FROM documents)
      ) WHERE rk1 <= {STRATUM_K}"""
    else:
        inner = f"SELECT lang, doc_id, {h} AS h FROM documents"
    return f"""
    SELECT lang, doc_id
    FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
      FROM ({inner})
    ) ranked
    WHERE rk <= {STRATUM_K}
    ORDER BY lang, doc_id
    """


_register_sql("sample_stratified_per_lang", _stratified(True), _stratified(False))


# ---------------------------------------------------------------------------
# weighted reservoir sample per source (Efraimidis–Spirakis A-ES): each doc
# draws u from its id-hash, sorts by the key -ln(u)/w — a size-biased but
# reproducible pick (here w = n_chars: longer docs proportionally likelier,
# the "sample by token mass, not doc count" curation shape). Deterministic:
# same corpus + salt => same sample on any engine/cluster/partitioning.
#
# Scale shape (Spark side): top-k per group via TWO phases — rank within
# (source, 64-way hash shard) first, keep k per shard, then rank the
# <=64·k survivors per source. No window partition ever exceeds
# max(|source|/64, 64·k) rows, vs the naive per-source window that funnels
# a whole source (TBs for a web crawl) through one partition. The DuckDB
# oracle keeps the direct single-window form — the top-k of per-shard
# top-ks is provably the same set.
# ---------------------------------------------------------------------------
WEIGHTED_K = 10
_WS_SHARDS = 64


def _weighted_sample(spark: bool) -> str:
    h = (
        "CAST(conv(substring(md5(concat('s3:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        if spark
        else "CAST('0x' || substr(md5(concat('s3:', CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT)"
    )
    key = f"-ln((h + 1) / 4294967296.0) / n_chars"
    base = f"SELECT source, doc_id, n_chars, {h} AS h FROM documents WHERE n_chars > 0"
    if spark:
        ranked = f"""
      SELECT source, doc_id, n_chars, es_key FROM (
        SELECT source, doc_id, n_chars, es_key,
               ROW_NUMBER() OVER (PARTITION BY source, shard
                                  ORDER BY es_key, doc_id) AS rk1
        FROM (SELECT source, doc_id, n_chars, {key} AS es_key,
                     pmod(h, {_WS_SHARDS}) AS shard
              FROM ({base}))
      ) WHERE rk1 <= {WEIGHTED_K}"""
    else:
        ranked = f"""
      SELECT source, doc_id, n_chars, {key} AS es_key FROM ({base})"""
    return f"""
    SELECT source, doc_id, n_chars, rk
    FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY es_key, doc_id) AS rk
      FROM ({ranked})
    ) final
    WHERE rk <= {WEIGHTED_K}
    ORDER BY source, rk
    """


_register_sql("sample_weighted_reservoir", _weighted_sample(True), _weighted_sample(False))


# ---------------------------------------------------------------------------
# corpus n-gram statistics: global top-20 bigrams
# ---------------------------------------------------------------------------
def _ngram_top(spark: bool) -> str:
    w = words("text", spark=spark)
    sh = shingles("w", 2, spark=spark)
    if spark:
        tok = (f"SELECT bigram FROM (SELECT {w} AS w FROM documents) "
               f"LATERAL VIEW explode({sh}) t AS bigram")
    else:
        tok = f"SELECT unnest({sh}) AS bigram FROM (SELECT {w} AS w FROM documents)"
    # ORDER BY ... LIMIT k (not a global ROW_NUMBER window): Spark plans this
    # as TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    # driver — instead of sorting every distinct bigram in one partition.
    return f"""
    SELECT bigram, COUNT(*) AS n
    FROM ({tok}) tokens
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """


_register_sql("ngram_top_bigrams", _ngram_top(True), _ngram_top(False))


# ---------------------------------------------------------------------------
# sketch profile: HLL cardinality + quantile estimates. Raw estimates are
# engine-specific, so the oracle pins them with deterministic BOUND checks
# (VERDICT r2 item 7): the query emits exact counts plus booleans asserting
# each sketch estimate sits inside a proven error envelope — HLL++ at
# rsd=0.05 within ±15% (3σ) of the exact distinct count, approx_percentile
# at accuracy=10000 (rank error 1e-4) between the exact 0.45/0.55 (resp.
# 0.90/0.99) quantiles. DuckDB computes the same exact values and literal
# `true`s; a sketch drifting out of its envelope hash-mismatches.
# ---------------------------------------------------------------------------
def _sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bemidb_spark.functions import approx_distinct, approx_quantiles
    from bemidb_spark.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("exact_users"),
        approx_distinct("user_id").alias("au"),
        approx_quantiles("value", [0.5, 0.95]).alias("q"),
        F.expr("percentile(value, array(0.45, 0.55, 0.90, 0.99))").alias("xq"),
    )
    bounded = lambda est, lo, hi: (  # noqa: E731
        (est.isNull() & lo.isNull()) | est.between(lo, hi)
    )
    return (
        agg.select(
            "event_type",
            "n",
            "exact_users",
            (
                F.abs(F.col("au") - F.col("exact_users"))
                <= 0.15 * F.greatest(F.col("exact_users"), F.lit(1))
            ).alias("users_within_3sigma"),
            bounded(F.col("q")[0], F.col("xq")[0], F.col("xq")[1]).alias("p50_bounded"),
            bounded(F.col("q")[1], F.col("xq")[2], F.col("xq")[3]).alias("p95_bounded"),
        )
        .orderBy("event_type")
    )


QUERIES["sketch_event_profile"] = _sketch_profile
ORACLES["sketch_event_profile"] = """
SELECT event_type,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS exact_users,
       true AS users_within_3sigma,
       true AS p50_bounded,
       true AS p95_bounded
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# capstone: composed training-data pipeline in ONE declarative plan
# (quality gate -> exact dedup survivors -> deterministic 50% sample ->
# per-language doc/token budget). Each stage is a CTE, so Catalyst fuses
# the whole pipeline: one scan of documents, one dedup shuffle, one final
# aggregation — the shape this runs at 100 TB.
# ---------------------------------------------------------------------------
def _pipeline(spark: bool) -> str:
    w = words("text", spark=spark)
    size = "size" if spark else "len"
    distinct = "array_distinct" if spark else "list_distinct"
    h = (
        "CAST(conv(substring(md5(concat('p1:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        if spark
        else "CAST('0x' || substr(md5(concat('p1:', CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT)"
    )
    return f"""
    WITH scored AS (
      SELECT doc_id, lang, text, lower(trim(text)) AS norm, {w} AS w
      FROM documents
    ),
    quality AS (
      SELECT doc_id, lang, norm, CAST({size}(w) AS BIGINT) AS n_tokens
      FROM scored
      WHERE {size}(w) >= 10
        AND CAST({size}({distinct}(w)) AS DOUBLE) / {size}(w) >= 0.3
    ),
    deduped AS (
      SELECT doc_id, lang, n_tokens FROM (
        SELECT doc_id, lang, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY doc_id) AS rk
        FROM quality
      ) d WHERE rk = 1
    ),
    sampled AS (
      SELECT doc_id, lang, n_tokens
      FROM deduped
      WHERE {h} / 4294967296.0 < 0.5
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM sampled
    GROUP BY lang
    ORDER BY lang
    """


_register_sql("pipeline_training_subset", _pipeline(True), _pipeline(False))


# ---------------------------------------------------------------------------
# range join: same-user event pairs within ±5 minutes, bucketed equi-join
# ---------------------------------------------------------------------------
RANGE_US = 300_000_000  # ±5 minutes in microseconds


def _range_join(spark: bool) -> str:
    """Time-range self-join via bucketing.

    The naive plan for `a.ts BETWEEN b.ts - Δ AND b.ts + Δ` is a
    broadcast-nested-loop / cartesian per user — O(n²) at scale. Bucketing
    time into Δ-sized bins and probing the 3 adjacent bins turns it into an
    equi-join on (user_id, bucket): every qualifying pair shares a bin with
    one of the probe keys (|Δt| ≤ Δ ⇒ bins differ by ≤ 1), so the bucketed
    join is exact, and each pair matches exactly one probe bin (b's own bin).
    One shuffle on (user_id, bucket); no range predicate reaches the join.
    The DuckDB oracle runs the naive theta join — same result, different plan.
    """
    if spark:
        e = ("SELECT event_id, user_id, unix_micros(CAST(ts AS TIMESTAMP)) AS us "
             "FROM events")
        probe = (f"SELECT event_id, user_id, us, probe_bkt FROM "
                 f"(SELECT event_id, user_id, us, CAST(floor(us / {RANGE_US}) AS BIGINT) AS bkt FROM e) "
                 f"LATERAL VIEW explode(array(bkt - 1, bkt, bkt + 1)) t AS probe_bkt")
        return f"""
    WITH e AS ({e}),
    probes AS ({probe}),
    build AS (SELECT event_id, user_id, us,
                     CAST(floor(us / {RANGE_US}) AS BIGINT) AS bkt FROM e)
    SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
           b.us - a.us AS dt_us
    FROM probes a
    JOIN build b
      ON a.user_id = b.user_id AND a.probe_bkt = b.bkt
         AND a.event_id < b.event_id
    WHERE abs(a.us - b.us) <= {RANGE_US}
    ORDER BY event_a, event_b
    """
    return f"""
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
    SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
           b.us - a.us AS dt_us
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND abs(a.us - b.us) <= {RANGE_US}
    ORDER BY event_a, event_b
    """


_register_sql("range_join_close_events", _range_join(True), _range_join(False))


# ---------------------------------------------------------------------------
# funnel analysis: ordered view -> click -> purchase conversion
# ---------------------------------------------------------------------------
_FUNNEL_SQL = """
    WITH w1 AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ),
    w2 AS (
      SELECT user_id, ts, event_type, t1,
             MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
               OVER (PARTITION BY user_id) AS t2
      FROM w1
    ),
    w3 AS (
      SELECT user_id, t1, t2,
             MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
               OVER (PARTITION BY user_id) AS t3
      FROM w2
    ),
    per_user AS (
      SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
      FROM w3 GROUP BY user_id
    )
    SELECT CAST(COUNT(t1) AS BIGINT) AS step_view,
           CAST(COUNT(t2) AS BIGINT) AS step_click,
           CAST(COUNT(t3) AS BIGINT) AS step_purchase,
           CAST(COUNT(t2) AS DOUBLE) / COUNT(t1) AS view_to_click,
           CAST(COUNT(t3) AS DOUBLE) / COUNT(t2) AS click_to_purchase
    FROM per_user
"""

# Ordered funnel in ONE scan: first-view, first-click-after-view, and
# first-purchase-after-click are chained unbounded windows over the same
# user_id partitioning (one shuffle total; Spark plans all three windows in
# a single exchange), then a per-user collapse + global conditional counts.
# The previous 3-CTE + 5-scalar-subquery form re-inlined each step's chain
# per reference (14 FileScans vs 1 here). Integer counts ratioed in one
# double division keep both engines bit-identical.
_register_sql("funnel_view_click_purchase", _FUNNEL_SQL)


# ---------------------------------------------------------------------------
# retention cohorts: signup week x week offset
# ---------------------------------------------------------------------------
def _retention_sql(spark: bool) -> str:
    day_diff = "datediff(a.wk, s.cohort)" if spark else "date_diff('day', s.cohort, a.wk)"
    return f"""
    WITH signup AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    sizes AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
              FROM signup GROUP BY cohort)
    SELECT s.cohort AS cohort,
           CAST({day_diff} / 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active,
           z.cohort_size,
           CAST(COUNT(DISTINCT a.user_id) AS DOUBLE) / z.cohort_size AS retention
    FROM signup s
    JOIN activity a ON a.user_id = s.user_id AND a.wk >= s.cohort
    JOIN sizes z ON z.cohort = s.cohort
    GROUP BY s.cohort, CAST({day_diff} / 7 AS BIGINT), z.cohort_size
    ORDER BY s.cohort, week_offset
    """


# The product-analytics rollup over the Amplitude-style events the reference
# syncs (C10): two shuffles (per-user min, then cohort x offset agg); the
# distinct-activity table is map-side combinable. Week-truncated DATEs on
# both sides (DuckDB date_trunc returns DATE natively; Spark is CAST).
_register_sql("retention_cohorts_weekly", _retention_sql(True), _retention_sql(False))


# ---------------------------------------------------------------------------
# batch sessionization: gap-based session assignment (30-minute timeout)
# ---------------------------------------------------------------------------
def _sessionize_sql(spark: bool) -> str:
    """The batch twin of streaming/windows session_window: a new session
    starts when the gap to the user's previous event exceeds 30 minutes;
    session ids are the running count of session-starts. One shuffle on
    user_id serves both windows (same partitioning), then the session agg
    is map-side combinable — the canonical sessionization plan at any scale.
    Gaps compare exact epoch-µs (cross-engine date_diff counts boundary
    crossings, not elapsed time)."""
    us = "unix_micros(CAST(ts AS TIMESTAMP))" if spark else "epoch_us(ts)"
    return f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, {us} AS t_us,
             LAG({us}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, ts, t_us,
             CASE WHEN prev_us IS NULL OR t_us - prev_us > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    assigned AS (
      SELECT user_id, event_id, ts, t_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM marked
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(t_us) - MIN(t_us) AS BIGINT) AS duration_micros
    FROM assigned
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """


_register_sql("sessionize_events_30m", _sessionize_sql(True), _sessionize_sql(False))


# ---------------------------------------------------------------------------
# CDC change application: op-coded change stream -> current table state.
# The reference project's lineage is Postgres CDC -> lakehouse (Bemi change
# tracking; its syncers re-materialize source tables): this operator is that
# apply step as one relational pass. The events stream is read as a change
# feed per user_id in (ts, event_id) commit order, 'error' events acting as
# delete tombstones and every other op as an upsert of `value`. Survivors =
# keys whose LAST change is not a tombstone, carrying the last value plus
# per-key op statistics. Plan shape: one hash shuffle on the key, one
# window, one aggregate — the same MERGE-free apply a 100 TB CDC backfill
# wants (no per-batch point lookups, AQE-safe).
# ---------------------------------------------------------------------------
_CDC_APPLY = """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    stats AS (
      SELECT user_id,
             COUNT(*) AS n_changes,
             CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
      FROM ordered GROUP BY user_id
    )
    SELECT s.user_id,
           s.n_changes,
           s.n_deletes,
           last.op AS last_op,
           CASE WHEN last.op = 'D' THEN NULL ELSE last.value END AS live_value,
           CASE WHEN last.op = 'D' THEN 0 ELSE 1 END AS live
    FROM stats s
    JOIN (SELECT user_id, op, value FROM ordered WHERE rn = 1) last
      ON s.user_id = last.user_id
    ORDER BY s.user_id
"""
_register_sql("cdc_apply_changes", _CDC_APPLY)


# ---------------------------------------------------------------------------
# behavioral path mining: top event-type trigrams over per-user ordered
# histories — the sequence-level corpus statistic behind funnel discovery
# (which 3-step paths actually happen, before you hard-code a funnel).
# One window shuffle on user_id (LEAD twice over the same ordering costs a
# single sort), map-side partial counts, TakeOrderedAndProject top-k —
# never a global sort of all paths. Deterministic: the ordering key
# (ts, event_id) is total and ties in counts break on the path string.
# ---------------------------------------------------------------------------
PATH_TOP_K = 20


def _path_trigrams_sql(spark: bool) -> str:
    return f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events
    )
    SELECT concat_ws('>', event_type, e2, e3) AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ordered
    WHERE e3 IS NOT NULL
    GROUP BY concat_ws('>', event_type, e2, e3)
    ORDER BY n DESC, path
    LIMIT {PATH_TOP_K}
    """


_register_sql("event_path_trigrams", _path_trigrams_sql(True), _path_trigrams_sql(False))


# ---------------------------------------------------------------------------
# join-key skew diagnostic: the number you look at BEFORE deciding to salt.
# Top heavy hitters of a join key with their share of all rows and the
# ratio to a perfectly uniform key — share_x_uniform >> 1 on few keys means
# the shuffle partition holding that key becomes the straggler at scale and
# the join wants salting / AQE skew splitting. Map-side partial counts, one
# shuffle on the key, TakeOrderedAndProject top-k; shares are exact-int
# divisions (bit-identical).
# ---------------------------------------------------------------------------
SKEW_TOP_K = 10


def _skew_report_sql(spark: bool) -> str:
    return f"""
    WITH k AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT SUM(n_rows) AS total, CAST(COUNT(*) AS BIGINT) AS n_keys FROM k
    )
    SELECT k.user_id, k.n_rows,
           CAST(k.n_rows AS DOUBLE) / t.total AS row_share,
           CAST(k.n_rows * t.n_keys AS DOUBLE) / t.total AS share_x_uniform
    FROM k CROSS JOIN tot t
    ORDER BY k.n_rows DESC, k.user_id
    LIMIT {SKEW_TOP_K}
    """


_register_sql("skew_key_report", _skew_report_sql(True), _skew_report_sql(False))


# ---------------------------------------------------------------------------
# inter-event gap distribution: the histogram the sessionize threshold is
# read off (30 min sits where cum_share flattens). Gap = µs to the user's
# previous event (one window shuffle on user_id); buckets are a power-of-2
# CASE cascade on whole seconds (integer, no float log — same reasoning as
# seq_len_buckets), counts aggregate map-side, and the cumulative share is
# a running sum over the ~20-row bucket table. Exact-int divisions; a
# global percentile would need a corpus-wide sort, the histogram doesn't.
# ---------------------------------------------------------------------------
GAP_BUCKETS = [2 ** k for k in range(0, 21)]  # 1 s .. ~12 days


def _gap_hist_sql(spark: bool) -> str:
    us = ("unix_micros(CAST(ts AS TIMESTAMP))" if spark else "epoch_us(ts)")
    # integer division, NOT CAST(x / 1e6 AS BIGINT): DuckDB rounds
    # double->bigint while Spark truncates, so a 1.5 s gap would land in
    # different buckets
    floordiv = "gap_us DIV 1000000" if spark else "gap_us // 1000000"
    cascade = " ".join(
        f"WHEN gap_s <= {b} THEN {b}" for b in GAP_BUCKETS)
    return f"""
    WITH ordered AS (
      SELECT {us} - LAG({us}) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    gaps AS (
      SELECT CAST({floordiv} AS BIGINT) AS gap_s
      FROM ordered WHERE gap_us IS NOT NULL
    ),
    b AS (
      SELECT CASE {cascade} ELSE {GAP_BUCKETS[-1] * 2} END AS bucket_s
      FROM gaps
    ),
    h AS (
      SELECT bucket_s, CAST(COUNT(*) AS BIGINT) AS n_gaps
      FROM b GROUP BY bucket_s
    ),
    tot AS (SELECT SUM(n_gaps) AS total FROM h)
    SELECT h.bucket_s, h.n_gaps,
           CAST(h.n_gaps AS DOUBLE) / t.total AS share,
           CAST(SUM(h.n_gaps) OVER (ORDER BY h.bucket_s) AS DOUBLE)
             / t.total AS cum_share
    FROM h CROSS JOIN tot t
    ORDER BY h.bucket_s
    """


_register_sql("event_gap_histogram", _gap_hist_sql(True), _gap_hist_sql(False))


# ---------------------------------------------------------------------------
# recency-weighted per-user value (time-decayed engagement / LTV score)
# ---------------------------------------------------------------------------
DECAY_WINDOW_DAYS = 30  # weight = max(0, 30 - age_days): linear ramp to zero


def _recency_value_sql(spark: bool) -> str:
    """Per-user time-decay-weighted value: SUM(value * max(0, 30 - age_days)).

    The engagement-scoring shape used for sample weighting and user-cohort
    prioritization: recent activity counts more, activity older than the
    window counts nothing. The decay weight is an INTEGER linear ramp (not
    exp()) so the whole aggregate is exact: value is pinned to fixed-point
    via FLOOR(value * 2^20) (power-of-two scaling of an exact double — the
    `embedding_centroid_outliers` trick), multiplied by the integer weight,
    and summed as BIGINT. Order-independent integer math -> bit-identical
    across engines and across Spark partitionings.

    age_days counts calendar-day boundaries from the corpus max DATE (both
    engines agree on DATE-granularity diffs; the as-of entry documents why
    sub-day date_diff is not cross-engine-safe). The reference date is a
    1-row scalar subquery -> broadcast; the only shuffle is groupBy(user_id).
    """
    two20 = "1048576.0"  # 2^20; |value| <= ~1e6 keeps terms far inside BIGINT
    if spark:
        age = "datediff(r.ref_date, CAST(e.ts AS DATE))"
    else:
        age = "date_diff('day', CAST(e.ts AS DATE), r.ref_date)"
    weight = f"GREATEST(0, {DECAY_WINDOW_DAYS} - {age})"
    fxv = "CAST(FLOOR(e.value * 1048576.0) AS BIGINT)"
    return f"""
    WITH r AS (SELECT MAX(CAST(ts AS DATE)) AS ref_date FROM events),
    scored AS (
      SELECT e.user_id,
             CAST({weight} AS BIGINT) AS w,
             {fxv} AS v_fx
      FROM events e CROSS JOIN r
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_window,
           CAST(SUM(w * v_fx) AS DOUBLE) / {two20} AS weighted_value
    FROM scored
    GROUP BY user_id
    ORDER BY user_id
    """


_register_sql(
    "user_recency_weighted_value",
    _recency_value_sql(True),
    _recency_value_sql(False),
)


# ---------------------------------------------------------------------------
# KMV sketch set algebra: pairwise audience overlap from bounded sketches (r6)
# ---------------------------------------------------------------------------
# The scale path for source_overlap_matrix-style questions: estimate the
# union size and Jaccard similarity of every event-type pair's user
# population from k-minimum-values sketches (k smallest distinct hashes per
# set), never materializing the full sets. Union sketch = k smallest of the
# merged sketches; Jaccard = fraction of union-sketch members present in
# BOTH input sketches (Beyer et al., SIGMOD 2007); union cardinality =
# (k-1)*2^32/h_(k). Every step is a deterministic function of the input
# sets — the oracle reproduces even the approximate columns bit-for-bit —
# and the exact hash-set Jaccard rides along to show the estimate's error.
# Shape at scale: per-set sketches are one shuffle over distinct hashes;
# everything pairwise operates on k-row sketches (broadcastable), never on
# the data.
KMV_SET_K = 64


def _kmv_overlap_sql(spark: bool) -> str:
    from bemidb_spark.operators._xengine import hash_int

    cast = "STRING" if spark else "VARCHAR"
    hv = hash_int(f"CAST(user_id AS {cast})", spark=spark, salt="kmvset")
    k = KMV_SET_K
    return f"""
    WITH h AS (
      SELECT DISTINCT event_type, {hv} AS hv FROM events
    ),
    sk AS (
      SELECT event_type, hv FROM (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM h
      ) r WHERE rn <= {k}
    ),
    pairs AS (
      SELECT a.event_type AS et_a, b.event_type AS et_b
      FROM (SELECT DISTINCT event_type FROM h) a
      JOIN (SELECT DISTINCT event_type FROM h) b ON a.event_type < b.event_type
    ),
    us AS (
      SELECT p.et_a, p.et_b, s.hv
      FROM pairs p JOIN sk s ON s.event_type = p.et_a
      UNION
      SELECT p.et_a, p.et_b, s.hv
      FROM pairs p JOIN sk s ON s.event_type = p.et_b
    ),
    u AS (
      SELECT et_a, et_b, hv,
             ROW_NUMBER() OVER (PARTITION BY et_a, et_b ORDER BY hv) AS rn
      FROM us
    ),
    m AS (
      SELECT u.et_a, u.et_b,
             CAST(COUNT(*) AS INT) AS n_u,
             MAX(u.hv) AS kth,
             CAST(SUM(CASE WHEN sa.hv IS NOT NULL AND sb.hv IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS matches
      FROM u
      LEFT JOIN sk sa ON sa.event_type = u.et_a AND sa.hv = u.hv
      LEFT JOIN sk sb ON sb.event_type = u.et_b AND sb.hv = u.hv
      WHERE u.rn <= {k}
      GROUP BY u.et_a, u.et_b
    ),
    sizes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM h GROUP BY event_type
    ),
    inter AS (
      SELECT a.event_type AS et_a, b.event_type AS et_b,
             CAST(COUNT(*) AS BIGINT) AS n_i
      FROM h a JOIN h b ON b.hv = a.hv AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT m.et_a, m.et_b,
           m.n_u AS n_union_kept,
           CASE WHEN m.n_u < {k} THEN CAST(m.n_u AS BIGINT)
                ELSE CAST(FLOOR(CAST({k - 1} AS DOUBLE)
                          * CAST(4294967296 AS DOUBLE) / m.kth) AS BIGINT)
           END AS est_union_distinct,
           CAST(FLOOR(CAST(m.matches AS DOUBLE) * 1000000 / m.n_u)
                AS BIGINT) AS est_jaccard_ppm,
           CAST(FLOOR(CAST(COALESCE(i.n_i, 0) AS DOUBLE) * 1000000
                      / (sa.n + sb.n - COALESCE(i.n_i, 0)))
                AS BIGINT) AS exact_jaccard_ppm
    FROM m
    JOIN sizes sa ON sa.event_type = m.et_a
    JOIN sizes sb ON sb.event_type = m.et_b
    LEFT JOIN inter i ON i.et_a = m.et_a AND i.et_b = m.et_b
    ORDER BY m.et_a, m.et_b
    """


_register_sql("sketch_set_overlap", _kmv_overlap_sql(True), _kmv_overlap_sql(False))


# ---------------------------------------------------------------------------
# time-series gap fill: calendar spine + linear interpolation (r6)
# ---------------------------------------------------------------------------
# The missing-day repair step for per-key daily series (sensor/metric
# pipelines): build each key's calendar spine between its first and last
# observed day, join the observed daily totals, and fill gaps by LINEAR
# interpolation between the surrounding observations (edge gaps fall back
# to nearest-value fill; unreachable only if a key has a single day).
# Spark-side shape: one aggregate over the sparse input, a per-key sequence()
# explode for the spine (map-only), then two IGNORE-NULLS window passes per
# key — at 100 TB this is one shuffle on the key plus in-partition windows,
# never a self-join per gap. Observed totals and the interpolated output are
# rounded to 4 decimals so the double arithmetic is cross-engine exact
# (sub-1e-9 accumulation error vs a 1e-4 quantum).
def _interp_sql(spark: bool) -> str:
    # sparse slice so gaps exist at every gate SF (≈1% of events)
    if spark:
        spine = ("SELECT event_type, explode(sequence(dmin, dmax, "
                 "interval 1 day)) AS d FROM bounds")
        ig_last = ("last_value({x}) IGNORE NULLS OVER (PARTITION BY event_type "
                   "ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
        ig_first = ("first_value({x}) IGNORE NULLS OVER (PARTITION BY event_type "
                    "ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)")
        ddiff = "datediff({b}, {a})"
    else:
        spine = ("SELECT event_type, CAST(unnest(generate_series(dmin, dmax, "
                 "INTERVAL 1 DAY)) AS DATE) AS d FROM bounds")
        ig_last = ("last_value({x} IGNORE NULLS) OVER (PARTITION BY event_type "
                   "ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
        ig_first = ("first_value({x} IGNORE NULLS) OVER (PARTITION BY event_type "
                    "ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)")
        ddiff = "date_diff('day', {a}, {b})"
    return f"""
    WITH sparse AS (
      SELECT event_type, CAST(ts AS DATE) AS d, value
      FROM events WHERE event_id % 101 = 0
    ),
    daily AS (
      SELECT event_type, d, CAST(ROUND(SUM(value), 4) AS DOUBLE) AS v
      FROM sparse GROUP BY event_type, d
    ),
    bounds AS (
      SELECT event_type, MIN(d) AS dmin, MAX(d) AS dmax
      FROM daily GROUP BY event_type
    ),
    spine AS ({spine}),
    joined AS (
      SELECT s.event_type, s.d, dl.v
      FROM spine s LEFT JOIN daily dl
        ON dl.event_type = s.event_type AND dl.d = s.d
    ),
    ctx AS (
      SELECT event_type, d, v,
             {ig_last.format(x="v")} AS prev_v,
             {ig_last.format(x="CASE WHEN v IS NOT NULL THEN d END")} AS prev_d,
             {ig_first.format(x="v")} AS next_v,
             {ig_first.format(x="CASE WHEN v IS NOT NULL THEN d END")} AS next_d
      FROM joined
    )
    SELECT event_type, d,
           CAST(CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               ROUND(prev_v + (next_v - prev_v)
                     * {ddiff.format(a="prev_d", b="d")}
                     / {ddiff.format(a="prev_d", b="next_d")}, 4)
             WHEN prev_v IS NOT NULL THEN prev_v
             ELSE next_v
           END AS DOUBLE) AS v_filled,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS interpolated
    FROM ctx
    ORDER BY event_type, d
    """


_register_sql("timeseries_interpolate", _interp_sql(True), _interp_sql(False))


# ---------------------------------------------------------------------------
# graph centrality: deterministic fixed-point PageRank (r6)
# ---------------------------------------------------------------------------
# PageRank over the event-type transition graph (edges = consecutive events
# per user, weighted by transition count). Float PageRank cannot be
# oracle-hashed — per-node contribution sums are fold-order dependent — so
# ranks are kept in integer MICRO-UNITS: r0 = 1e6 per node, each iteration
# r' = 0.15e6 + 0.85 * Σ (r_src * w) DIV out_w, all in exact BIGINT
# arithmetic (multiply before divide; values stay ≤ 1e6·w << 2^63). Every
# engine computes identical integers at every iteration, so the driver
# oracle pins the full K-iteration fixpoint. Iterations are unrolled CTEs:
# one broadcast-sized join + aggregate per iteration — at graph scale each
# iteration is one shuffle on dst, the textbook distributed-PageRank shape.
# Dangling mass is dropped (no out-edge nodes contribute nothing) —
# documented deviation from renormalized PageRank variants.
PAGERANK_ITERS = 4
PAGERANK_DAMP_PCT = 85  # 0.85 damping as an integer percentage


def _pagerank_sql(spark: bool) -> str:
    div = "DIV" if spark else "//"
    base = 1_000_000
    jump = base * (100 - PAGERANK_DAMP_PCT) // 100
    iters = []
    for i in range(1, PAGERANK_ITERS + 1):
        iters.append(f"""
    r{i} AS (
      SELECT n.node,
             CAST({jump} + ({PAGERANK_DAMP_PCT} *
                  COALESCE(SUM((p.rank * e.w) {div} e.outw), 0)) {div} 100
                  AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN r{i - 1} p ON p.node = e.src
      GROUP BY n.node
    )""")
    return f"""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    edges AS (
      SELECT src, dst, w,
             CAST(SUM(w) OVER (PARTITION BY src) AS BIGINT) AS outw
      FROM (
        SELECT event_type AS src, next_type AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
      ) e
    ),
    nodes AS (
      SELECT DISTINCT event_type AS node FROM events
    ),
    r0 AS (
      SELECT node, CAST({base} AS BIGINT) AS rank FROM nodes
    ),{",".join(iters)}
    SELECT node,
           rank AS rank_microunits,
           CAST(ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS INT) AS rank_pos
    FROM r{PAGERANK_ITERS}
    ORDER BY rank_pos
    """


_register_sql("pagerank_event_graph", _pagerank_sql(True), _pagerank_sql(False))


# ---------------------------------------------------------------------------
# anomaly detection: per-key daily outliers in exact integer algebra (r6)
# ---------------------------------------------------------------------------
# Flag days whose total deviates from the key's mean by more than Z standard
# deviations. A float z-score cannot be oracle-hashed (mean/std sums are
# fold-order dependent, sqrt compounds it) — so the test is cross-multiplied
# into EXACT integer arithmetic on cent-quantized totals: with S = Σx,
# Q = Σx², n = day count, flag x iff
#     (n·x − S)² · (n − 1)  >  Z² · n · (n·Q − S²)
# which is |x − mean| > Z·std(sample) with both sides scaled by n²(n−1) —
# every term a BIGINT product of exact integers, identical in any engine
# and any fold order. One aggregate for (S, Q, n) per key, one broadcast
# join back to days: two shuffles total at any scale.
# Overflow bound: the largest term is (n·x−S)²·(n−1) ≈ n³·x², safe in
# BIGINT while n·|x| < ~3·10⁹ quantized units (n=30 days, per-day totals
# up to ~10⁸ cents); at larger magnitudes pick a coarser quantum (dollars,
# thousands) — the algebra is scale-free.
ANOMALY_Z = 2


def _anomaly_sql(spark: bool) -> str:
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(ROUND(SUM(value) * 100) AS BIGINT) AS cents
      FROM events
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS q
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.d, d.cents,
           CASE WHEN st.n > 1 AND
                     (st.n * d.cents - st.s) * (st.n * d.cents - st.s)
                       * (st.n - 1)
                     > {ANOMALY_Z * ANOMALY_Z} * st.n
                       * (st.n * st.q - st.s * st.s)
                THEN 1 ELSE 0 END AS is_anomaly
    FROM daily d JOIN stats st ON st.event_type = d.event_type
    ORDER BY d.event_type, d.d
    """


_register_sql("anomaly_daily_zscore", _anomaly_sql(True), _anomaly_sql(False))


# ---------------------------------------------------------------------------
# salted skew join as a driver-oracled entry (r6)
# ---------------------------------------------------------------------------
# plans/skew.salted_join was pytest-only; this pins it against DuckDB
# computing the PLAIN join — salting must change only the physical plan
# (hot event_type keys spread over 8 sub-keys), never the result. The
# probe joins the heavily-skewed events.event_type (5 hot keys over the
# whole table) to a derived per-type dimension and aggregates.
def _skew_salted_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bemidb_spark.plans.skew import salted_join
    from bemidb_spark.tables import register_views

    register_views(spark, sf_dir)
    events = spark.table("events")
    dim = (events.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("type_total")))
    joined = salted_join(
        events.select("event_type", "user_id", "event_id"),
        dim, key="event_type", salt=8, salt_source="event_id")
    return (joined.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("type_total").alias("type_total"),
                 F.countDistinct("user_id").alias("n_users"))
            .selectExpr("event_type", "n", "type_total",
                        "CAST(n_users AS BIGINT) AS n_users")
            .orderBy("event_type"))


QUERIES["skewed_join_salted"] = _skew_salted_entry
ORACLES["skewed_join_salted"] = """
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(d.type_total) AS BIGINT) AS type_total,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e
    JOIN (SELECT event_type, COUNT(*) AS type_total
          FROM events GROUP BY event_type) d
      ON d.event_type = e.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
"""
