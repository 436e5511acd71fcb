"""Driver-oracle entries that exercise the pgcompat ROUTE, not just Spark SQL.

Most registry entries call spark.sql directly; these three run their
statement through ``PgSession.execute`` — transpiler, catalog folding,
grouping compensation and all — so the driver's DuckDB oracle checks the
pg-compatibility path end-to-end (VERDICT r4 next-round #8: features that
existed only as pytest coverage get first-class oracle entries).

Reference parity: the reference routes every client statement through its
query remapper before DuckDB executes it (src/server/query_handler.go); these
entries pin our equivalent route against a real second engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bemidb_spark.tables import register_views

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register_pg(name: str, pg_sql: str, duck_sql: str) -> None:
    def run(spark: SparkSession, sf_dir: str, _sql: str = pg_sql) -> DataFrame:
        register_views(spark, sf_dir)
        from bemidb_spark.pgcompat.session import PgSession

        return PgSession(spark).execute(_sql)

    QUERIES[name] = run
    ORACLES[name] = duck_sql


# ---------------------------------------------------------------------------
# E-string literals (pg extended string syntax) through the transpiler.
# The r4 E-string fix (doubled-quote handling) is pinned here against DuckDB
# computing the same bytes from standard literals.
# ---------------------------------------------------------------------------
_register_pg(
    "pg_estring_roundtrip",
    r"""
    SELECT doc_id,
           E'tab\there' AS tabbed,
           E'it''s fine' AS quoted,
           lang || E'\n' AS lang_nl,
           E'back\\slash' AS bs
    FROM documents ORDER BY doc_id LIMIT 50
    """,
    r"""
    SELECT doc_id,
           'tab' || chr(9) || 'here' AS tabbed,
           'it''s fine' AS quoted,
           lang || chr(10) AS lang_nl,
           'back\slash' AS bs
    FROM documents ORDER BY doc_id LIMIT 50
    """,
)

# ---------------------------------------------------------------------------
# WITH RECURSIVE through the pg route (plans/recursive.py iterative-union
# fixpoint on the Spark side; DuckDB runs the genuine recursive CTE) — joined
# against real data so the recursion result binds into a normal agg plan.
# ---------------------------------------------------------------------------
_REC_SQL = """
    WITH RECURSIVE r(rk) AS (
      SELECT CAST(0 AS BIGINT)
      UNION ALL
      SELECT rk + 1 FROM r WHERE rk < 4
    )
    SELECT r.rk, count(*) AS n_nations
    FROM r JOIN nation ON nation.n_regionkey = r.rk
    GROUP BY r.rk ORDER BY r.rk
"""
_register_pg("pg_recursive_cte_route", _REC_SQL, _REC_SQL)

# ---------------------------------------------------------------------------
# Grouping-sets empty-input compensation (closed r4 for analyzable shapes):
# pg and DuckDB emit the folded super-aggregate row for the empty grouping
# set even when the input is EMPTY; plain Spark emits nothing. The pg route
# adds the compensation arm (pgcompat/grouping_comp.py).
# ---------------------------------------------------------------------------
_GS_EMPTY = """
    SELECT o_orderstatus,
           CAST(GROUPING(o_orderstatus) AS INT) AS g,
           count(*) AS n,
           sum(o_totalprice) AS total
    FROM orders WHERE o_orderkey < 0
    GROUP BY ROLLUP (o_orderstatus)
    ORDER BY g, o_orderstatus
"""
_register_pg("pg_grouping_sets_empty", _GS_EMPTY, _GS_EMPTY)

# ---------------------------------------------------------------------------
# Round-5 widening: each entry below pins a DIFFERENT transpiler rewrite
# family end-to-end (route -> Spark) against DuckDB running the pg-ism
# natively or its own equivalent. Reference: the remapper families in
# src/server (SURVEY §2.B8-B11).
# ---------------------------------------------------------------------------

# B9: JSON `->>` operator chain (variant-based rewrite) on a JSON string col.
_register_pg(
    "pg_json_arrow_route",
    """
    SELECT CAST(props::json->>'k' AS INT) % 7 AS k_mod,
           count(*) AS n,
           CAST(min(event_id) AS BIGINT) AS first_event
    FROM events
    WHERE CAST(props::json->>'k' AS INT) IS NOT NULL
    GROUP BY CAST(props::json->>'k' AS INT) % 7
    ORDER BY k_mod
    """,
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 7 AS k_mod,
           count(*) AS n,
           CAST(min(event_id) AS BIGINT) AS first_event
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
    GROUP BY 1
    ORDER BY k_mod
    """,
)

# B10: `= ANY('{…}')` string-array literal -> IN list.
_register_pg(
    "pg_any_array_route",
    """
    SELECT n.n_name, count(c.c_custkey) AS n_cust
    FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name = ANY('{NATION_3,NATION_7,NATION_12}')
    GROUP BY n.n_name ORDER BY n.n_name
    """,
    """
    SELECT n.n_name, count(c.c_custkey) AS n_cust
    FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3','NATION_7','NATION_12')
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)

# B11: `'…'::interval` cast remap + date arithmetic through the route.
_INTERVAL_SQL = """
    SELECT o_orderpriority,
           CAST(min(o_orderdate + '30 days'::interval) AS DATE) AS first_due,
           CAST(max(o_orderdate + '30 days'::interval) AS DATE) AS last_due,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
_register_pg("pg_interval_cast_route", _INTERVAL_SQL, _INTERVAL_SQL)

# B8: pg function remap — format() -> format_string() (DuckDB: printf).
_register_pg(
    "pg_format_route",
    """
    SELECT format('%s/%s', r.r_name, n.n_name) AS region_nation,
           count(s.s_suppkey) AS n_supp
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY format('%s/%s', r.r_name, n.n_name)
    ORDER BY region_nation
    """,
    """
    SELECT printf('%s/%s', r.r_name, n.n_name) AS region_nation,
           count(s.s_suppkey) AS n_supp
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
    ORDER BY region_nation
    """,
)

# Window function + aggregate through the route (auto-alias, ordinal
# handling, window-over-agg shape).
_WIN_ROUTE = """
    SELECT n_name,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT n.n_name,
             RANK() OVER (ORDER BY count(c.c_custkey) DESC, n.n_name) AS rnk
      FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ) t
    ORDER BY rnk, n_name
"""
_register_pg("pg_window_route", _WIN_ROUTE, _WIN_ROUTE)

# ---------------------------------------------------------------------------
# Round-6 widening: four more rewrite families pinned end-to-end through the
# route (r5 pinned eight). Reference remapper families per SURVEY §2.B2/B8.
# ---------------------------------------------------------------------------

# DISTINCT ON (pg-only syntax) -> row_number window rewrite (transpiler.py
# _rewrite_distinct_on; handled at statement top level, the form pg clients
# send): latest order per customer among the first 200 keys.
_register_pg(
    "pg_distinct_on_route",
    """
    SELECT DISTINCT ON (o_custkey)
           o_custkey, CAST(o_orderdate AS DATE) AS od, o_totalprice
    FROM orders WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
    """
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_totalprice
    FROM (
      SELECT o_custkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders WHERE o_custkey < 200
    ) t WHERE rn = 1 ORDER BY o_custkey
    """,
)

# SIMILAR TO (pg dialect: SQL wildcards % / _ MIXED with regex alternation)
# -> RLIKE with pattern conversion (transpiler.py _rewrite_similar_to).
# DuckDB's SIMILAR TO is plain RE2 with NO % wildcard (non-pg-conformant),
# so the oracle spells the equivalent anchored regexes instead.
_register_pg(
    "pg_similar_to_route",
    """
    SELECT n_name, count(*) AS n
    FROM nation
    WHERE n_name SIMILAR TO 'NATION_(1|2)%' AND n_name NOT SIMILAR TO '%9'
    GROUP BY n_name ORDER BY n_name
    """,
    """
    SELECT n_name, count(*) AS n
    FROM nation
    WHERE n_name SIMILAR TO 'NATION_(1|2).*' AND n_name NOT SIMILAR TO '.*9'
    GROUP BY n_name ORDER BY n_name
    """,
)

# Array operators && (overlap) / @> (contains) on collected per-region
# nation-key arrays (transpiler.py _rewrite_array_ops; DuckDB natively).
_register_pg(
    "pg_array_ops_route",
    """
    SELECT a.r AS region_a, b.r AS region_b,
           (a.ks) && (b.ks2) AS overlaps,
           (a.ks) @> (b.ks2) AS contains
    FROM (SELECT n_regionkey AS r, array_agg(n_nationkey % 7) AS ks
          FROM nation GROUP BY n_regionkey) a
    JOIN (SELECT n_regionkey AS r, array_agg(n_nationkey % 3) AS ks2
          FROM nation GROUP BY n_regionkey) b ON b.r >= a.r
    ORDER BY region_a, region_b
    """,
    """
    SELECT a.r AS region_a, b.r AS region_b,
           EXISTS (SELECT 1 FROM unnest(a.ks) AS u(x)
                   WHERE list_contains(b.ks2, x)) AS overlaps,
           NOT EXISTS (SELECT 1 FROM unnest(b.ks2) AS u(x)
                       WHERE NOT list_contains(a.ks, x)) AS contains
    FROM (SELECT n_regionkey AS r, list_sort(array_agg(n_nationkey % 7)) AS ks
          FROM nation GROUP BY n_regionkey) a
    JOIN (SELECT n_regionkey AS r, list_sort(array_agg(n_nationkey % 3)) AS ks2
          FROM nation GROUP BY n_regionkey) b ON b.r >= a.r
    ORDER BY region_a, region_b
    """,
)

# generate_series SRF in FROM position joined against real data
# (transpiler.py SRF rewrite; DuckDB runs the SRF natively).
_SERIES_SQL = """
    SELECT g.bucket, count(o.o_orderkey) AS n
    FROM generate_series(0, 4) AS g(bucket)
    LEFT JOIN orders o ON o.o_orderkey % 5 = g.bucket AND o.o_orderkey < 500
    GROUP BY g.bucket ORDER BY g.bucket
"""
_register_pg("pg_series_join_route", _SERIES_SQL, _SERIES_SQL)

# ---------------------------------------------------------------------------
# Round-6 second wave: seven more rewrite families pinned end-to-end.
# ---------------------------------------------------------------------------

# POSIX regex operators ~ / !~ -> RLIKE (transpiler.py _rewrite_regex_ops;
# pg ~ is a PARTIAL match, matching Spark RLIKE and DuckDB regexp_matches).
_register_pg(
    "pg_regex_ops_route",
    """
    SELECT n_name, count(*) AS n
    FROM nation
    WHERE n_name ~ '_1[0-9]$' AND n_name !~ '3$'
    GROUP BY n_name ORDER BY n_name
    """,
    """
    SELECT n_name, count(*) AS n
    FROM nation
    WHERE regexp_matches(n_name, '_1[0-9]$') AND NOT regexp_matches(n_name, '3$')
    GROUP BY n_name ORDER BY n_name
    """,
)

# EXTRACT(EPOCH FROM x) / date_part('epoch', x) -> timestamp->double cast
# (transpiler.py _rewrite_epoch_extract; Spark EXTRACT has no EPOCH field).
# DuckDB evaluates the pg-ism natively; dates resolve at UTC midnight both
# sides (the session pins spark.sql.session.timeZone=UTC).
_EPOCH_SQL = """
    SELECT o_orderpriority,
           CAST(min(extract(epoch FROM o_orderdate)) AS BIGINT) AS min_epoch,
           CAST(max(date_part('epoch', o_orderdate)) AS BIGINT) AS max_epoch,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
_register_pg("pg_epoch_extract_route", _EPOCH_SQL, _EPOCH_SQL)

# to_char(date, 'YYYY-MM…') -> date_format with pg->Java pattern translation
# (transpiler.py _to_char_java_pattern); DuckDB has no to_char, the oracle
# spells the same rendering with strftime.
_register_pg(
    "pg_to_char_route",
    """
    SELECT to_char(o_orderdate, 'YYYY-MM') AS ym,
           to_char(min(o_orderdate), 'DD Mon YYYY') AS first_day,
           count(*) AS n
    FROM orders WHERE o_orderkey < 2000
    GROUP BY to_char(o_orderdate, 'YYYY-MM') ORDER BY ym
    """,
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS ym,
           strftime(min(o_orderdate), '%d %b %Y') AS first_day,
           count(*) AS n
    FROM orders WHERE o_orderkey < 2000
    GROUP BY 1 ORDER BY ym
    """,
)

# pg 1-based array subscripts and slices (transpiler.py _rewrite_array_slice
# / _rewrite_array_index — Spark's bare [i] is 0-based, an off-by-one for
# every pg client; fixed r6). DuckDB subscripts/slices are 1-based like pg.
_register_pg(
    "pg_array_slice_route",
    """
    SELECT n_nationkey,
           to_json((ARRAY[n_nationkey, n_nationkey + 1, n_nationkey + 2, n_nationkey + 3])[2:3]) AS mid,
           (string_to_array(n_name, '_'))[1] AS prefix,
           (string_to_array(n_name, '_'))[2] AS tail
    FROM nation ORDER BY n_nationkey
    """,
    """
    SELECT n_nationkey,
           to_json(([n_nationkey, n_nationkey + 1, n_nationkey + 2, n_nationkey + 3])[2:3]) AS mid,
           (string_to_array(n_name, '_'))[1] AS prefix,
           (string_to_array(n_name, '_'))[2] AS tail
    FROM nation ORDER BY n_nationkey
    """,
)

# ANSI OFFSET … FETCH FIRST … ROWS ONLY (transpiler.py _rewrite_fetch_first);
# both engines accept the ANSI form natively.
_FETCH_SQL = """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer ORDER BY c_acctbal DESC, c_custkey
    OFFSET 5 ROWS FETCH FIRST 10 ROWS ONLY
"""
_register_pg("pg_fetch_first_route", _FETCH_SQL, _FETCH_SQL)

# SQL-standard string primitives pg clients lean on: substring FROM/FOR,
# position IN, split_part, left/right (remapped or native both sides).
_SUBSTR_SQL = """
    SELECT p_partkey,
           substring(p_type FROM 1 FOR 5) AS ty5,
           CAST(position('ED' IN p_type) AS INT) AS pos_ed,
           split_part(p_type, ' ', 2) AS ty_mid,
           left(p_name, 4) AS nm_l,
           right(p_name, 3) AS nm_r
    FROM part WHERE p_partkey <= 40 ORDER BY p_partkey
"""
_register_pg("pg_substring_pos_route", _SUBSTR_SQL, _SUBSTR_SQL)

# Full-text search emulation: to_tsvector(...) @@ to_tsquery('a & (b|c) & !d')
# -> boolean over the lowercased word array (transpiler.py _rewrite_tsearch;
# no stemming — documented emulation limit). DuckDB has no FTS offline; the
# oracle spells the same word-array predicate with list functions.
_register_pg(
    "pg_tsearch_route",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE to_tsvector('simple', text) @@ to_tsquery('vector & (hash | merge) & !quantumfoo')
    ORDER BY doc_id LIMIT 40
    """,
    """
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         w -> w != '') AS words
      FROM documents
    )
    WHERE list_contains(words, 'vector')
      AND (list_contains(words, 'hash') OR list_contains(words, 'merge'))
      AND NOT list_contains(words, 'quantumfoo')
    ORDER BY doc_id LIMIT 40
    """,
)

# ILIKE / NOT ILIKE (pg case-insensitive LIKE; native in Spark >= 3.3 and
# DuckDB — the route must pass it through unmangled, incl. _ wildcards).
_ILIKE_SQL = """
    SELECT n_name, count(*) AS n
    FROM nation
    WHERE n_name ILIKE 'nation=_1%' ESCAPE '='
       OR (n_name NOT ILIKE '%1' AND n_name ILIKE 'nation=_2' ESCAPE '=')
    GROUP BY n_name ORDER BY n_name
"""
_register_pg("pg_ilike_route", _ILIKE_SQL, _ILIKE_SQL)

# width_bucket (pg numeric bucketing; native in Spark, absent in DuckDB —
# the oracle spells the same CASE/FLOOR arithmetic).
_register_pg(
    "pg_width_bucket_route",
    """
    SELECT width_bucket(o_totalprice, CAST(0 AS DOUBLE),
                        CAST(200000 AS DOUBLE), 8) AS bucket,
           count(*) AS n,
           CAST(min(o_orderkey) AS BIGINT) AS first_key
    FROM orders WHERE o_orderkey < 2000
    GROUP BY width_bucket(o_totalprice, CAST(0 AS DOUBLE),
                          CAST(200000 AS DOUBLE), 8)
    ORDER BY bucket
    """,
    """
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 200000 THEN 9
                ELSE 1 + CAST(FLOOR(o_totalprice * 8 / 200000) AS BIGINT)
           END AS bucket,
           count(*) AS n,
           CAST(min(o_orderkey) AS BIGINT) AS first_key
    FROM orders WHERE o_orderkey < 2000
    GROUP BY 1
    ORDER BY bucket
    """,
)

# Correlated LATERAL subquery with per-outer-row ORDER BY/LIMIT (top-n per
# group through the route; native in Spark 4 and DuckDB).
_LATERAL_SQL = """
    SELECT r.r_name, t.n_name
    FROM region r,
    LATERAL (SELECT n_name FROM nation
             WHERE n_regionkey = r.r_regionkey
             ORDER BY n_name LIMIT 2) t
    ORDER BY r.r_name, t.n_name
"""
_register_pg("pg_lateral_route", _LATERAL_SQL, _LATERAL_SQL)

# Boolean aggregates bool_and / bool_or with FILTER (native in Spark and
# DuckDB; pg clients use them for invariants-over-groups queries).
_BOOLAGG_SQL = """
    SELECT n_regionkey,
           bool_and(n_nationkey >= 0) AS all_nonneg,
           bool_or(n_nationkey % 7 = 0) AS any_div7,
           bool_and(n_nationkey % 2 = 0) FILTER (WHERE n_nationkey < 10) AS low_all_even,
           count(*) AS n
    FROM nation
    GROUP BY n_regionkey ORDER BY n_regionkey
"""
_register_pg("pg_bool_agg_route", _BOOLAGG_SQL, _BOOLAGG_SQL)

# ---------------------------------------------------------------------------
# Server-side cursors through the route (r7): DECLARE … CURSOR FOR /
# FETCH n / MOVE n / CLOSE — the paging surface psycopg2 named cursors and
# JDBC setFetchSize speak. The entry pages two windows out of an ordered
# scan (FETCH 15, skip 10 with MOVE, FETCH 15) and unions them; the oracle
# reproduces the same windows with LIMIT/OFFSET.
# ---------------------------------------------------------------------------
def _pg_cursor_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    from bemidb_spark.pgcompat.session import PgSession

    pg = PgSession(spark)
    pg.execute("BEGIN")
    pg.execute("DECLARE ord_cur CURSOR FOR "
               "SELECT o_orderkey, o_orderpriority FROM orders "
               "ORDER BY o_orderkey")
    first = pg.execute("FETCH 15 FROM ord_cur")
    pg.execute("MOVE 10 IN ord_cur")
    second = pg.execute("FETCH 15 FROM ord_cur")
    pg.execute("CLOSE ord_cur")
    pg.execute("COMMIT")
    return first.unionByName(second)


QUERIES["pg_cursor_fetch_route"] = _pg_cursor_fetch
ORACLES["pg_cursor_fetch_route"] = """
    (SELECT o_orderkey, o_orderpriority FROM orders
     ORDER BY o_orderkey LIMIT 15)
    UNION ALL
    (SELECT o_orderkey, o_orderpriority FROM orders
     ORDER BY o_orderkey LIMIT 15 OFFSET 25)
"""


# ---------------------------------------------------------------------------
# SQL-level PREPARE / EXECUTE through the route (r7): psql scripts and
# pgbench speak this (the wire Parse/Bind path is separate and
# pytest-covered); $n substitution happens server-side before planning.
# ---------------------------------------------------------------------------
def _pg_prepare_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    from bemidb_spark.pgcompat.session import PgSession

    pg = PgSession(spark)
    pg.execute("PREPARE custbal (int, text) AS "
               "SELECT c_custkey, c_mktsegment, "
               "CAST(round(c_acctbal * 100) AS BIGINT) AS cents "
               "FROM customer "
               "WHERE c_custkey < $1 AND c_mktsegment <> $2 "
               "ORDER BY c_custkey")
    out = pg.execute("EXECUTE custbal(120, 'MACHINERY')")
    pg.execute("DEALLOCATE custbal")
    return out


QUERIES["pg_prepare_execute_route"] = _pg_prepare_execute
ORACLES["pg_prepare_execute_route"] = """
    SELECT c_custkey, c_mktsegment,
           CAST(round(c_acctbal * 100) AS BIGINT) AS cents
    FROM customer
    WHERE c_custkey < 120 AND c_mktsegment <> 'MACHINERY'
    ORDER BY c_custkey
"""

# ---------------------------------------------------------------------------
# pgvector operator surface through the route (r7): `<->` euclidean,
# `<=>` cosine distance, `<#>` negative inner product — the operators
# pgvector clients ORDER BY for nearest-neighbor ranking, rewritten to
# JVM-side zip_with/aggregate algebra (transpiler._rewrite_vector_ops; the
# ANN operators in operators/similarity.py are the scale path this exact
# arm verifies). Embeddings are quantized to integer-valued doubles, so
# every product/sum is exact and sqrt/division are correctly rounded IEEE
# ops — bit-identical in Spark and DuckDB, hashable by the driver.
# ---------------------------------------------------------------------------
_VECTOR_SQL = """
    WITH iv AS (
      SELECT vec_id,
             transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS q
      FROM embeddings
    )
    SELECT i.vec_id,
           CAST(-(i.q <#> qv.qq) AS BIGINT) AS dot,
           CAST(floor((i.q <-> qv.qq) * 1000000) AS BIGINT) AS eud_u,
           CAST(floor((i.q <=> qv.qq) * 1000000000) AS BIGINT) AS cos_u
    FROM iv i
    CROSS JOIN (SELECT q AS qq FROM iv WHERE vec_id = 0) qv
    ORDER BY dot DESC, i.vec_id
    LIMIT 100
"""
_register_pg(
    "pg_vector_ops_route",
    _VECTOR_SQL,
    """
    WITH iv AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS q
      FROM embeddings
    ),
    pairs AS (
      SELECT i.vec_id, unnest(i.q) AS a, unnest(qv.qq) AS b
      FROM iv i
      CROSS JOIN (SELECT q AS qq FROM iv WHERE vec_id = 0) qv
    ),
    agg AS (
      SELECT vec_id,
             CAST(sum(a * b) AS BIGINT) AS dot,
             CAST(sum((a - b) * (a - b)) AS BIGINT) AS ssq,
             CAST(sum(a * a) AS BIGINT) AS na,
             CAST(sum(b * b) AS BIGINT) AS nb
      FROM pairs GROUP BY vec_id
    )
    SELECT vec_id, dot,
           CAST(floor(sqrt(CAST(ssq AS DOUBLE)) * 1000000) AS BIGINT) AS eud_u,
           CAST(floor((1 - CAST(dot AS DOUBLE) /
                       (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))))
                      * 1000000000) AS BIGINT) AS cos_u
    FROM agg
    ORDER BY dot DESC, vec_id
    LIMIT 100
    """,
)

# ---------------------------------------------------------------------------
# pgvector FUNCTION forms (r8, VERDICT r7 #6): vector_dims, inner_product,
# l1/l2/cosine distance, and avg(vector) over GROUP BY (element-wise mean,
# served by PgSession's analyzer-retry rewrite). Same integer-quantized
# determinism pattern as pg_vector_ops_route: every sum is exact in doubles,
# sqrt/division are correctly-rounded IEEE ops over identical inputs, and
# floor/round-scaled BIGINTs are summed as integers so group aggregation is
# order-independent. The centroid arm folds avg(q) per group to a single
# scaled integer; DuckDB reproduces it per (group, position) via
# generate_subscripts.
# ---------------------------------------------------------------------------
_register_pg(
    "pg_vector_funcs_route",
    """
    WITH iv AS (
      SELECT vec_id, vec_id % 5 AS grp,
             transform(embedding, x -> CAST(round(x * 1000) AS DOUBLE)) AS q
      FROM embeddings
    )
    SELECT i.grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(vector_dims(i.q)) AS BIGINT) AS dims_sum,
           CAST(sum(inner_product(i.q, qv.qq)) AS BIGINT) AS ip_sum,
           CAST(sum(l1_distance(i.q, qv.qq)) AS BIGINT) AS l1_sum,
           CAST(sum(CAST(floor(l2_distance(i.q, qv.qq) * 1000000) AS BIGINT))
                AS BIGINT) AS l2_u,
           CAST(sum(CAST(floor(cosine_distance(i.q, qv.qq) * 1000000000)
                         AS BIGINT)) AS BIGINT) AS cos_u,
           CAST(aggregate(transform(avg(i.q),
                                    c -> CAST(round(c * 1000000) AS BIGINT)),
                          CAST(0 AS BIGINT), (s, v) -> s + v)
                AS BIGINT) AS cent_u
    FROM iv i CROSS JOIN (SELECT q AS qq FROM iv WHERE vec_id = 0) qv
    GROUP BY i.grp
    ORDER BY i.grp
    """,
    """
    WITH iv AS (
      SELECT vec_id, vec_id % 5 AS grp,
             list_transform(embedding,
                            x -> CAST(round(x * 1000) AS DOUBLE)) AS q
      FROM embeddings
    ),
    pairs AS (
      SELECT i.vec_id, i.grp, unnest(i.q) AS a, unnest(qv.qq) AS b
      FROM iv i CROSS JOIN (SELECT q AS qq FROM iv WHERE vec_id = 0) qv
    ),
    per AS (
      SELECT vec_id, grp,
             count(*) AS dims,
             CAST(sum(a * b) AS DOUBLE) AS ip,
             CAST(sum(abs(a - b)) AS DOUBLE) AS l1,
             CAST(floor(sqrt(CAST(sum((a - b) * (a - b)) AS DOUBLE))
                        * 1000000) AS BIGINT) AS l2_u,
             CAST(floor((1 - CAST(sum(a * b) AS DOUBLE) /
                         (sqrt(CAST(sum(a * a) AS DOUBLE)) *
                          sqrt(CAST(sum(b * b) AS DOUBLE)))) * 1000000000)
                  AS BIGINT) AS cos_u
      FROM pairs GROUP BY vec_id, grp
    ),
    cent AS (
      SELECT grp, pos,
             CAST(round(CAST(sum(val) AS DOUBLE) / count(*) * 1000000)
                  AS BIGINT) AS cu
      FROM (SELECT grp, generate_subscripts(q, 1) AS pos, unnest(q) AS val
            FROM iv)
      GROUP BY grp, pos
    ),
    centg AS (
      SELECT grp, CAST(sum(cu) AS BIGINT) AS cent_u FROM cent GROUP BY grp
    )
    SELECT p.grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(p.dims) AS BIGINT) AS dims_sum,
           CAST(sum(p.ip) AS BIGINT) AS ip_sum,
           CAST(sum(p.l1) AS BIGINT) AS l1_sum,
           CAST(sum(p.l2_u) AS BIGINT) AS l2_u,
           CAST(sum(p.cos_u) AS BIGINT) AS cos_u,
           max(c.cent_u) AS cent_u
    FROM per p JOIN centg c ON p.grp = c.grp
    GROUP BY p.grp
    ORDER BY p.grp
    """,
)

# ---------------------------------------------------------------------------
# pg17 JSON_TABLE through the route (r7): literal multi-row expansion with
# FOR ORDINALITY + a correlated (auto-LATERAL) arm over a real JSON column.
# transpiler._rewrite_json_table lowers both to posexplode over variant
# rows with typed variant_get columns — one JVM-side generator, no UDF.
# DuckDB 1.0 has no JSON_TABLE; the oracle reproduces the rows with VALUES
# and json_extract.
# ---------------------------------------------------------------------------
_register_pg(
    "pg_json_table_route",
    """
    SELECT 'lit' AS src, CAST(ord AS BIGINT) AS k1, qty AS k2
    FROM JSON_TABLE('[{"n":"a","q":2},{"n":"b","q":5},{"n":"c"}]', '$[*]'
                    COLUMNS (name TEXT PATH '$.n',
                             qty INT PATH '$.q',
                             ord FOR ORDINALITY)) AS jt
    UNION ALL
    SELECT 'ev' AS src, e.event_id AS k1, jt.k2
    FROM events e, JSON_TABLE(e.props, '$' COLUMNS (k2 INT PATH '$.k')) jt
    WHERE e.event_id < 50
    ORDER BY src, k1
    """,
    """
    SELECT 'lit' AS src, CAST(o AS BIGINT) AS k1, CAST(q AS INT) AS k2
    FROM (VALUES (1, 2), (2, 5), (3, NULL)) t(o, q)
    UNION ALL
    SELECT 'ev' AS src, event_id AS k1,
           CAST(json_extract_string(props, '$.k') AS INT) AS k2
    FROM events WHERE event_id < 50
    ORDER BY src, k1
    """,
)

# ---------------------------------------------------------------------------
# pg day-numbering fields (r7): extract(dow) is Sunday=0 in pg but Sunday=1
# in Spark (a silent off-by-one for every weekday rollup), and isodow
# doesn't exist in Spark at all — both rewritten by _rewrite_epoch_extract.
# Same SQL runs natively in DuckDB, which follows pg's numbering.
# ---------------------------------------------------------------------------
_DOW_SQL = """
    SELECT CAST(extract(dow FROM o_orderdate) AS BIGINT) AS dow,
           CAST(extract(isodow FROM o_orderdate) AS BIGINT) AS isodow,
           count(*) AS n
    FROM orders
    GROUP BY extract(dow FROM o_orderdate), extract(isodow FROM o_orderdate)
    ORDER BY dow
"""
_register_pg("pg_dow_fields_route", _DOW_SQL, _DOW_SQL)

# ---------------------------------------------------------------------------
# pg `^` exponentiation + quote_ident/quote_literal (r7): Spark's `^` is
# bitwise XOR, so unrewritten pg math silently XORs (3^2 -> 1); DuckDB's
# `^` is power like pg's, so the oracle runs it natively. quote_ident
# quotes only when needed (lowercased names pass bare); quote_literal
# doubles embedded quotes.
# ---------------------------------------------------------------------------
_register_pg(
    "pg_power_quote_route",
    """
    SELECT n_nationkey,
           CAST(n_nationkey ^ 2 AS BIGINT) AS sq,
           CAST(2 ^ n_regionkey AS BIGINT) AS pw2,
           quote_ident(lower(n_name)) AS qi,
           quote_ident(lower(n_name) || ' x') AS qi_quoted,
           quote_ident(CASE WHEN n_nationkey % 2 = 0
                            THEN 'select' ELSE lower(n_name) END) AS qi_kw,
           quote_literal(n_name) AS ql
    FROM nation ORDER BY n_nationkey
    """,
    # oracle reproduces pg's quoting rule for the specific inputs: lowercase
    # nation names are bare-safe non-keywords; a name with a space is always
    # quoted; 'select' is a reserved keyword -> quoted despite being
    # lowercase-safe (the r7-flagged oracle blind spot, now exercised)
    """
    SELECT n_nationkey,
           CAST(n_nationkey ^ 2 AS BIGINT) AS sq,
           CAST(2 ^ n_regionkey AS BIGINT) AS pw2,
           lower(n_name) AS qi,
           '"' || lower(n_name) || ' x"' AS qi_quoted,
           CASE WHEN n_nationkey % 2 = 0
                THEN '"select"' ELSE lower(n_name) END AS qi_kw,
           '''' || replace(n_name, '''', '''''') || '''' AS ql
    FROM nation ORDER BY n_nationkey
    """,
)


# ---------------------------------------------------------------------------
# pgvector ANN serving (r9, VERDICT r8 #4): `ORDER BY embedding <-> q LIMIT k`
# over an ivfflat-INDEXED column routes through the materialized k-means
# cells (similarity._kmeans_views) — the probe plan scans ~NPROBE/N_CELLS of
# the corpus instead of all of it, exactly what the index means in pg.
# The oracle reproduces the identical Lloyd's chain + probe + double-fold L2
# ranking inline in DuckDB (similarity.ivf_orderby_oracle_sql), so the
# approximate result is bit-deterministic, not merely "close".
# Query vector: exact binary fractions (k/8), so the literal parses to the
# same doubles in both engines.
# ---------------------------------------------------------------------------
_IVF_QV = [((i * 7) % 13 - 6) / 8.0 for i in range(64)]
_IVF_QV_TEXT = "[" + ", ".join(repr(v) for v in _IVF_QV) + "]"
_IVF_K = 20


def _pg_ivf_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    from bemidb_spark.pgcompat.session import PgSession

    pg = PgSession(spark)
    pg.execute(
        "CREATE INDEX embeddings_ivf ON embeddings "
        "USING ivfflat (embedding vector_l2_ops) WITH (lists = 8)"
    )
    return pg.execute(
        f"SELECT vec_id FROM embeddings "
        f"ORDER BY embedding <-> '{_IVF_QV_TEXT}'::vector LIMIT {_IVF_K}"
    )


def _ivf_orderby_oracle() -> str:
    from bemidb_spark.operators.similarity import ivf_orderby_oracle_sql

    return ivf_orderby_oracle_sql("vec_id", _IVF_QV_TEXT, _IVF_K)


QUERIES["pg_ivf_orderby_route"] = _pg_ivf_orderby
ORACLES["pg_ivf_orderby_route"] = _ivf_orderby_oracle()
