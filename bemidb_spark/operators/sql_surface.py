"""SQL-surface operators beyond the TPC-H battery (SURVEY.md §2.A gaps).

The reference passes these constructs to its engine (window functions are
accepted but untested there — reference server/query_remapper.go has no OVER
handling; grouping sets are absent; JSON operators are rewritten in
parser_a_expr.go:34-77). Spark supports all of them natively; each query here
pins the semantics against the DuckDB oracle:

- window functions: running totals (decimal-exact so frame evaluation order
  can't cause float drift), rank/dense_rank/ntile, lag/lead, moving frames
- DISTINCT ON emulation (row_number over partition)
- ROLLUP / CUBE / GROUPING SETS with GROUPING() markers
- set operations: UNION / INTERSECT / EXCEPT
- JSON scalar extraction (`props` is a JSON string column, like the
  reference's json-as-string storage, README.md:301)
- array aggregation + sorted distinct collections
- VALUES lists joined against data
- interval arithmetic + date_trunc bucketing
- recursive CTE (month series): Spark side runs the iterative-union fixpoint
  from plans/recursive.py; the oracle is a genuine WITH RECURSIVE
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bemidb_spark.plans.recursive import iterate
from bemidb_spark.tables import load_tables, register_views

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register_sql(name: str, spark_sql: str, duck_sql: str | None = None) -> None:
    def run(spark: SparkSession, sf_dir: str, _sql: str = spark_sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    QUERIES[name] = run
    ORACLES[name] = duck_sql if duck_sql is not None else spark_sql


# ---------------------------------------------------------------------------
# window: running decimal sum + row_number per user
# ---------------------------------------------------------------------------
_WIN_RUNNING = """
    SELECT event_id, user_id,
           CAST(ROW_NUMBER() OVER w AS INT) AS rn,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, rn
"""
_register_sql("win_running_sum", _WIN_RUNNING)

# ---------------------------------------------------------------------------
# window: rank / dense_rank / ntile per event_type by value
# ---------------------------------------------------------------------------
_WIN_RANK = """
    SELECT event_id, event_type,
           CAST(RANK() OVER w AS INT) AS rk,
           CAST(DENSE_RANK() OVER w AS INT) AS drk,
           CAST(NTILE(4) OVER w AS INT) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
    ORDER BY event_type, rk, event_id
"""
_register_sql("win_rank_dense_ntile", _WIN_RANK)

# ---------------------------------------------------------------------------
# window: lag / lead deltas per user
# ---------------------------------------------------------------------------
_WIN_LAG = """
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           value - COALESCE(LAG(value) OVER w, value) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
"""
_register_sql("win_lag_lead", _WIN_LAG)

# ---------------------------------------------------------------------------
# window: moving average over a row frame (decimal-exact)
# ---------------------------------------------------------------------------
_WIN_MOVING = """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                AS DOUBLE)
             / CAST(COUNT(*)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS moving_avg4
    FROM events
    ORDER BY user_id, event_id
"""
_register_sql("win_moving_avg", _WIN_MOVING)

# ---------------------------------------------------------------------------
# window: distribution functions percent_rank / cume_dist / nth_value /
# last_value (r7). percent_rank = (rank-1)/(N-1) and cume_dist = peers/N are
# single IEEE divisions of small integers — identical bits in both engines —
# scaled+floored to integers for the driver hash. nth_value runs under the
# pg DEFAULT frame (RANGE UNBOUNDED PRECEDING .. CURRENT ROW: NULL until the
# 3rd peer-ordered row arrives — both engines agree); last_value under an
# explicit full frame via a named WINDOW clause (pg syntax Spark shares).
# ---------------------------------------------------------------------------
_WIN_DIST = """
    SELECT o_orderkey, o_orderpriority,
           CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_u,
           CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_u,
           nth_value(o_orderkey, 3) OVER w AS third_key,
           last_value(o_orderkey) OVER wfull AS last_key
    FROM orders WHERE o_orderkey < 500
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey),
           wfull AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
"""
_register_sql("win_dist_functions", _WIN_DIST)

# ---------------------------------------------------------------------------
# DISTINCT ON: latest event per user
# ---------------------------------------------------------------------------
_DISTINCT_ON = """
    SELECT user_id, event_id, event_type, ts
    FROM (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) ranked
    WHERE rn = 1
    ORDER BY user_id
"""
_register_sql("distinct_on_latest", _DISTINCT_ON)

# ---------------------------------------------------------------------------
# ROLLUP: daily x event_type counts with subtotals
# ---------------------------------------------------------------------------
_ROLLUP = """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           CAST(GROUPING(CAST(date_trunc('day', ts) AS DATE)) AS INT) AS g_day,
           CAST(GROUPING(event_type) AS INT) AS g_type
    FROM events
    GROUP BY ROLLUP(CAST(date_trunc('day', ts) AS DATE), event_type)
    ORDER BY g_day, g_type, day, event_type
"""
_register_sql("rollup_daily_type", _ROLLUP)

# ---------------------------------------------------------------------------
# CUBE: event_type x user bucket
# ---------------------------------------------------------------------------
_CUBE = """
    SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS n,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           CAST(GROUPING(user_id % 10) AS INT) AS g_bucket
    FROM events
    GROUP BY CUBE(event_type, user_id % 10)
    ORDER BY g_type, g_bucket, event_type, user_bucket
"""
_register_sql("cube_type_bucket", _CUBE)

# ---------------------------------------------------------------------------
# GROUPING SETS (explicit)
# ---------------------------------------------------------------------------
_GSETS = """
    SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    ORDER BY event_type, user_bucket
"""
_register_sql("grouping_sets_mixed", _GSETS)

# ---------------------------------------------------------------------------
# set ops: INTERSECT / EXCEPT / UNION over user cohorts
# ---------------------------------------------------------------------------
_SETOPS = """
    SELECT 'both' AS cohort, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'error'
    ) a
    UNION ALL
    SELECT 'purchase_only' AS cohort, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'error'
    ) b
    ORDER BY cohort, user_id
"""
_register_sql("setops_cohorts", _SETOPS)

# ---------------------------------------------------------------------------
# JSON scalar extraction (props is a JSON string column)
# ---------------------------------------------------------------------------
_JSON_SPARK = """
    SELECT CAST(get_json_object(props, '$.k') AS INT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(MIN(CAST(get_json_object(props, '$.k') AS INT)) AS INT) AS k_min,
           CAST(MAX(CAST(get_json_object(props, '$.k') AS INT)) AS INT) AS k_max
    FROM events
    GROUP BY CAST(get_json_object(props, '$.k') AS INT) % 10
    ORDER BY k_bucket
"""
_JSON_DUCK = """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max
    FROM events
    GROUP BY 1
    ORDER BY k_bucket
"""
_register_sql("json_extract_bucket", _JSON_SPARK, _JSON_DUCK)

# ---------------------------------------------------------------------------
# array aggregation: sorted distinct event types per user
# ---------------------------------------------------------------------------
_ARR_SPARK = """
    SELECT user_id,
           to_json(array_sort(collect_set(event_type))) AS types,
           CAST(size(array_sort(collect_set(event_type))) AS BIGINT) AS n_types,
           array_contains(collect_set(event_type), 'purchase') AS has_purchase
    FROM events
    GROUP BY user_id
    ORDER BY user_id
"""
_ARR_DUCK = """
    SELECT user_id,
           to_json(list_sort(list(DISTINCT event_type))) AS types,
           CAST(len(list(DISTINCT event_type)) AS BIGINT) AS n_types,
           list_contains(list(DISTINCT event_type), 'purchase') AS has_purchase
    FROM events
    GROUP BY user_id
    ORDER BY user_id
"""
_register_sql("array_agg_types", _ARR_SPARK, _ARR_DUCK)

# ---------------------------------------------------------------------------
# ORDER-inside-aggregate: string_agg with a deterministic element order
# (pg `string_agg(x, ',' ORDER BY x)`; Spark 4 spells it WITHIN GROUP)
# ---------------------------------------------------------------------------
_STRAGG_SPARK = """
    SELECT r.r_name,
           string_agg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations,
           COUNT(*) AS n
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
"""
_STRAGG_DUCK = """
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
"""
_register_sql("string_agg_ordered", _STRAGG_SPARK, _STRAGG_DUCK)

# ---------------------------------------------------------------------------
# ARRAY(SELECT ...) sublink: pg/DuckDB array-from-subquery; Spark expresses
# the same semantics as a correlated scalar subquery over collect_list
# (the transpiler rewrites the sorted uncorrelated form the same way)
# ---------------------------------------------------------------------------
_ARRSUB_SPARK = """
    SELECT r.r_name,
           to_json((SELECT array_sort(collect_list(n.n_name))
                    FROM nation n WHERE n.n_regionkey = r.r_regionkey)) AS nations
    FROM region r
    ORDER BY r.r_name
"""
_ARRSUB_DUCK = """
    SELECT r.r_name,
           to_json(ARRAY(SELECT n.n_name FROM nation n
                         WHERE n.n_regionkey = r.r_regionkey
                         ORDER BY n.n_name)) AS nations
    FROM region r
    ORDER BY r.r_name
"""
_register_sql("array_sublink_regions", _ARRSUB_SPARK, _ARRSUB_DUCK)

# ---------------------------------------------------------------------------
# VALUES list joined against data
# ---------------------------------------------------------------------------
_VALUES = """
    SELECT v.label, COUNT(e.event_id) AS n
    FROM (VALUES ('click', 'engagement'), ('view', 'engagement'),
                 ('purchase', 'revenue'), ('signup', 'growth')) AS v(etype, label)
    LEFT JOIN events e ON e.event_type = v.etype
    GROUP BY v.label
    ORDER BY v.label
"""
_register_sql("values_join", _VALUES)

# ---------------------------------------------------------------------------
# interval arithmetic + date bucketing
# ---------------------------------------------------------------------------
_INTERVAL = """
    SELECT CAST(date_trunc('week', ts + INTERVAL 3 DAY) AS DATE) AS wk,
           COUNT(*) AS n
    FROM events
    WHERE ts + INTERVAL 12 HOUR < TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY CAST(date_trunc('week', ts + INTERVAL 3 DAY) AS DATE)
    ORDER BY wk
"""
_register_sql("interval_bucketing", _INTERVAL)

# ---------------------------------------------------------------------------
# recursive CTE: month series spanning orders, with per-month counts
# ---------------------------------------------------------------------------
_REC_DUCK = """
    WITH RECURSIVE months(m) AS (
      SELECT date_trunc('month', MIN(o_orderdate)) FROM orders
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < (SELECT date_trunc('month', MAX(o_orderdate)) FROM orders)
    )
    SELECT CAST(m AS DATE) AS month, (
      SELECT COUNT(*) FROM orders WHERE date_trunc('month', o_orderdate) = m
    ) AS n_orders
    FROM months
    ORDER BY month
"""


def _recursive_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"]
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    ).collect()[0]
    # range(1)+lit keeps the seed JVM-side; createDataFrame from Python rows
    # would spin up Python workers just to ship one timestamp.
    seed = spark.range(1).select(F.lit(bounds.lo).cast("timestamp_ntz").alias("m"))
    hi = F.lit(bounds.hi).cast("timestamp_ntz")

    # Doubling recursion: frontier_k = first 2^k months (each step shifts the
    # whole prefix by its current span and unions) — O(log n) global barriers
    # vs O(n) for the naive +1-month linear recursion. Same fixpoint as the
    # oracle's linear WITH RECURSIVE, reached in 7 steps instead of 80.
    shift = [1]

    def step(prev: DataFrame) -> DataFrame:
        delta = shift[0]
        shift[0] *= 2
        return prev.unionAll(
            prev.select(F.expr(f"m + INTERVAL {delta} MONTH").alias("m")).filter(F.col("m") <= hi)
        )

    months = iterate(seed, step, max_iter=20, frontier_partitions=1, emit="last")
    per_month = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("m"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        months.join(per_month, "m", "left_outer")
        .select(
            F.col("m").cast("date").alias("month"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
        .orderBy("month")
    )


QUERIES["recursive_month_series"] = _recursive_months
ORACLES["recursive_month_series"] = _REC_DUCK


# ---------------------------------------------------------------------------
# scalar string-function battery (pass-through surface, SURVEY 2.A)
# ---------------------------------------------------------------------------
def _string_funcs(spark: bool) -> str:
    pos = "instr(source, '1')" if spark else "position('1' IN source)"
    return f"""
    SELECT doc_id,
           split_part(source, 'c', 2) AS src_num,
           lpad(CAST(doc_id AS {'STRING' if spark else 'VARCHAR'}), 6, '0') AS padded,
           concat_ws('|', lang, source) AS joined,
           upper(lang) AS lang_up,
           reverse(lang) AS lang_rev,
           replace(source, 'src', 'source_') AS replaced,
           CAST({pos} AS BIGINT) AS one_pos,
           substring(text, 1, 12) AS head,
           repeat(lang, 2) AS lang2,
           translate(lang, 'en', 'EN') AS lang_tr,
           length(text) AS text_len
    FROM documents
    ORDER BY doc_id
    """


_register_sql("string_funcs_battery", _string_funcs(True), _string_funcs(False))


# ---------------------------------------------------------------------------
# scalar date/time-function battery
# ---------------------------------------------------------------------------
def _date_funcs(spark: bool) -> str:
    fmt = (
        "date_format(ts, 'yyyy-MM-dd HH')" if spark
        else "strftime(ts, '%Y-%m-%d %H')"
    )
    doy = "dayofyear(ts)" if spark else "dayofyear(ts)"
    return f"""
    SELECT event_id,
           {fmt} AS hour_label,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS d,
           CAST(hour(ts) AS INT) AS h,
           CAST({doy} AS INT) AS doy,
           CAST(last_day(CAST(ts AS DATE)) AS DATE) AS month_end,
           CAST(CAST(ts AS DATE) + INTERVAL 7 DAY AS DATE) AS next_week,
           greatest(CAST(year(ts) AS INT), 2020) AS g
    FROM events
    WHERE event_id < 100
    ORDER BY event_id
    """


_register_sql("date_funcs_battery", _date_funcs(True), _date_funcs(False))


# ---------------------------------------------------------------------------
# LATERAL join: correlated top-N subquery per outer row (pg JOIN LATERAL;
# Spark plans it as a LateralJoin over a correlated subquery — the top-2
# orders per customer shape ORMs and report tools generate)
# ---------------------------------------------------------------------------
_LATERAL_SPARK = """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
"""
_LATERAL_DUCK = """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
"""
_register_sql("lateral_topn_per_customer", _LATERAL_SPARK, _LATERAL_DUCK)


# ---------------------------------------------------------------------------
# exact ordered-set aggregates: percentile_cont WITHIN GROUP (pg 9.4+ form);
# identical linear-interpolation arithmetic in both engines (verified
# bit-exact), unlike the sketch-based approx_quantiles entry
# ---------------------------------------------------------------------------
_PCTL = """
    SELECT event_type,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS p50,
           percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS p95,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""
_register_sql("percentile_event_values", _PCTL)


# ---------------------------------------------------------------------------
# regexp scalar battery: extract / replace / match over document metadata
# (pg ~, substring(x from 'pat'), regexp_replace; the basic POSIX-class
# pattern subset is semantics-identical across Spark's Java regex and
# DuckDB's RE2)
# ---------------------------------------------------------------------------
def _regex_sql(spark: bool) -> str:
    # Partial-match predicate on both sides: Spark RLIKE and DuckDB
    # regexp_matches are both unanchored (pg ~); DuckDB's SIMILAR TO would be
    # full-match and silently diverge on strings with surrounding text.
    match = (f"source RLIKE 'src[0-9]+'" if spark
             else "regexp_matches(source, 'src[0-9]+')")
    return f"""
    SELECT source,
           CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) AS src_num,
           regexp_replace(source, '[0-9]+', '#') AS masked,
           CASE WHEN {match} THEN 1 ELSE 0 END AS is_src,
           COUNT(*) AS n
    FROM documents
    GROUP BY source
    ORDER BY source
    """


_register_sql("regex_funcs_battery", _regex_sql(True), _regex_sql(False))


# ---------------------------------------------------------------------------
# set-returning series fill: calendar LEFT JOIN (gaps become zero rows)
# ---------------------------------------------------------------------------
def _series_fill_sql(spark: bool) -> str:
    """Generated date dimension joined against fact rows — the pg
    `generate_series` idiom (also served over the wire via the transpiler's
    SRF rewrite). The series side is tiny and broadcast; the per-day agg is
    one shuffle on o_orderdate."""
    if spark:
        days = "SELECT explode(sequence(DATE'1995-01-01', DATE'1995-03-31')) AS d"
    else:
        days = ("SELECT CAST(unnest(generate_series(DATE '1995-01-01', "
                "DATE '1995-03-31', INTERVAL 1 DAY)) AS DATE) AS d")
    return f"""
    WITH days AS ({days}),
    per_day AS (
      SELECT o_orderdate AS d,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders
      WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
      GROUP BY o_orderdate
    )
    SELECT days.d AS day,
           COALESCE(n, CAST(0 AS BIGINT)) AS n_orders,
           CAST(COALESCE(rev, 0) AS DOUBLE) AS revenue
    FROM days LEFT JOIN per_day ON days.d = per_day.d
    ORDER BY day
    """


_register_sql("series_calendar_fill", _series_fill_sql(True), _series_fill_sql(False))


# ---------------------------------------------------------------------------
# statistical aggregates: corr / covar / OLS regression (decimal-exact moments)
# ---------------------------------------------------------------------------
# Built-in corr()/covar_samp()/regr_*() are single-pass float aggregations
# whose result depends on partition order (and each engine's own update
# formula), so they can never hash-match across engines. The classic
# sufficient-statistics formulation — exact DECIMAL sums of x, y, x², y², xy,
# then one fixed DOUBLE expression tree rounded to 10 decimals (JVM vs C++
# sqrt/divide chains can differ in the final ulp) — is order-independent and
# engine-agreeing, and is also the form that scales: five map-side-combinable
# decimal sums in one pass, no second pass over the data.
_STATS_SQL = """
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))
                      * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                      * CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))
                      * CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_rows,
           ROUND((n * sxy - sx * sy) / n / (n - 1), 10) AS covar_samp_qty_price,
           ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 10) AS corr_qty_price,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 10) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 10) AS intercept,
           ROUND(sqrt((n * sxx - sx * sx) / n / (n - 1)), 10) AS stddev_samp_qty
    FROM s
    ORDER BY l_returnflag
"""

_register_sql("stats_corr_regression", _STATS_SQL)


# ---------------------------------------------------------------------------
# time-interval RANGE window frame (trailing 7-day revenue)
# ---------------------------------------------------------------------------
def _range_frame_sql(spark: bool) -> str:
    """RANGE BETWEEN INTERVAL … PRECEDING over an ORDER BY timestamp — the
    time-based frame (distinct from ROWS frames: it bounds by *value*, so
    gaps in the calendar shrink the window). Daily revenue first (one
    shuffle), then the windowed sum runs over the tiny per-day table.
    """
    ts = "CAST(d AS TIMESTAMP)"
    return f"""
    WITH per_day AS (
      SELECT o_orderdate AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
      GROUP BY o_orderdate
    )
    SELECT d AS day, n_orders,
           CAST(rev AS DOUBLE) AS day_rev,
           CAST(SUM(rev) OVER (
             ORDER BY {ts}
             RANGE BETWEEN INTERVAL '6 days' PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_7d_rev,
           CAST(COUNT(*) OVER (
             ORDER BY {ts}
             RANGE BETWEEN INTERVAL '6 days' PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS days_in_window
    FROM per_day
    ORDER BY day
    """


_register_sql("win_range_interval_frame", _range_frame_sql(True), _range_frame_sql(False))


# ---------------------------------------------------------------------------
# fixed-width histogram over events.value
# ---------------------------------------------------------------------------
_HISTOGRAM_SQL = """
    SELECT CAST(FLOOR(value / 100.0) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM events
    WHERE value IS NOT NULL
    GROUP BY CAST(FLOOR(value / 100.0) AS BIGINT)
    ORDER BY bucket
"""

_register_sql("histogram_fixed_width", _HISTOGRAM_SQL)


# ---------------------------------------------------------------------------
# PIVOT: daily event-type cross-tab
# ---------------------------------------------------------------------------
def _pivot_sql(spark: bool) -> str:
    """Spark exercises its native PIVOT clause; the oracle states the same
    cross-tab as FILTERed conditional aggregation (their relational meaning
    is identical — pivot is planned as one hash aggregate either way, so it
    scales exactly like any groupBy). Spark leaves empty COUNT cells NULL
    where FILTER yields 0, hence the COALESCE on the Spark side only.
    """
    types = ["view", "click", "purchase", "signup", "error"]
    if spark:
        in_list = ", ".join(f"'{t}' AS {t}" for t in types)
        sel = ", ".join(f"CAST(COALESCE({t}, 0) AS BIGINT) AS n_{t}" for t in types)
        return f"""
        SELECT d, {sel} FROM (
          SELECT CAST(ts AS DATE) AS d, event_type FROM events
        ) PIVOT (COUNT(*) FOR event_type IN ({in_list}))
        ORDER BY d
        """
    cols = ", ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in types
    )
    return f"""
    SELECT CAST(ts AS DATE) AS d, {cols}
    FROM events
    GROUP BY CAST(ts AS DATE)
    ORDER BY d
    """


_register_sql("pivot_event_type_daily", _pivot_sql(True), _pivot_sql(False))


# ---------------------------------------------------------------------------
# equi-depth histogram (r6): NTILE quartiles per key with exact bucket
# boundaries — the complement of histogram_fixed_width (equal-width) and
# approx_quantiles (sketched). The ORDER BY carries a full tie-break
# (value, event_id) so bucket assignment is deterministic in both engines;
# MIN/MAX of stored doubles are order-independent exact. One window
# shuffle on the key + one aggregate.
# ---------------------------------------------------------------------------
_EQUIDEPTH = """
    SELECT event_type, q,
           COUNT(*) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM (
      SELECT event_type, value,
             NTILE(4) OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS q
      FROM events
    )
    GROUP BY event_type, q
    ORDER BY event_type, q
"""
_register_sql("histogram_equidepth", _EQUIDEPTH)
