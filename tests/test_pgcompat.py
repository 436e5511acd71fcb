"""Golden query tests for the pg-compat layer.

Modeled on the reference's primary test pillar: ~250 literal SQL strings
driven through the full handler with exact expected outputs (reference
server/query_handler_test.go sections: PG functions, PG system tables,
information_schema, SHOW/SET, type casts, JSON operators).
"""

from __future__ import annotations

import pytest

from bemidb_spark.pgcompat.session import (
    VERSION_STRING,
    PgSession,
    UnsupportedQueryError,
)
from bemidb_spark.pgcompat.transpiler import transpile
from bemidb_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def pg(spark, sf_dir, tmp_path_factory):
    from bemidb_spark.tables import register_views

    register_views(spark, sf_dir)
    catalog = Catalog(str(tmp_path_factory.mktemp("pgwh")))
    return PgSession(spark, catalog)


def one(pg, sql):
    rows = pg.execute(sql).collect()
    assert len(rows) == 1
    return tuple(rows[0])


# -- transpiler unit surface -------------------------------------------------
@pytest.mark.parametrize("src,expected", [
    ("SELECT 'x'::text", "SELECT CAST('x' AS STRING)"),
    ("SELECT a::int8 FROM t", "SELECT CAST(a AS BIGINT) FROM t"),
    ("SELECT '1 week'::interval", "SELECT INTERVAL '1 week'"),
    ("SELECT x::numeric(10,2)::text FROM t",
     "SELECT CAST(CAST(x AS DECIMAL(38,6)) AS STRING) FROM t"),
    ("SELECT pg_catalog.pg_class.relname FROM pg_catalog.pg_class",
     "SELECT pg_class.relname FROM pg_class"),
    ("SELECT * FROM information_schema.columns",
     "SELECT * FROM information_schema_columns"),
    # ->> unwraps via the variant type (pg semantics: -> keeps JSON quoting,
    # ->> yields text); the unaliased item gets the reference's derived name
    ("SELECT props ->> 'k' FROM events",
     "SELECT CAST(try_variant_get(parse_json(props), "
     "concat('$', '.', trim(BOTH '''' FROM 'k'))) AS STRING) "
     "AS props_k FROM events"),
    ("SELECT encode(sha256(x), 'hex') FROM t", "SELECT sha2(x, 256) FROM t"),
    ("SELECT format('%s-%s', a, b)", "SELECT format_string('%s-%s', a, b)"),
    ("SELECT c FROM t WHERE c = ANY('{a,b,c}')",
     "SELECT c FROM t WHERE c IN ('a', 'b', 'c')"),
    ("SELECT jsonb_agg(x) FROM t", "SELECT to_json(collect_list(x)) FROM t"),
    ("SELECT array_upper(arr, 1) FROM t",
     "SELECT size(arr) AS array_upper FROM t"),
    ("SELECT x FROM t WHERE x SIMILAR TO 'ab%'",
     "SELECT x FROM t WHERE x RLIKE '^(?:ab.*)$'"),
    ("SELECT x FROM t WHERE x NOT SIMILAR TO 'a_c|d+'",
     "SELECT x FROM t WHERE x NOT RLIKE '^(?:a.c|d+)$'"),
    ("SELECT gen_random_uuid(), random() FROM t",
     "SELECT uuid(), rand() FROM t"),
    ("SELECT EXTRACT(EPOCH FROM ts) FROM t",
     "SELECT (CAST(CAST(ts AS TIMESTAMP) AS DOUBLE)) FROM t"),
    ("SELECT date_part('epoch', ts), date_part('year', ts) FROM t",
     "SELECT (CAST(CAST(ts AS TIMESTAMP) AS DOUBLE)), date_part('year', ts) FROM t"),
    ("SELECT ts AT TIME ZONE 'UTC' FROM t",
     "SELECT from_utc_timestamp(ts, 'UTC') FROM t"),
    # naive TIMESTAMP literal: pg's timestamp->timestamptz direction
    # (interpret wall-clock in tz) maps to to_utc_timestamp (ADVICE r2)
    # pg's TIMESTAMP 'lit' is tz-less → TIMESTAMP_NTZ (r9); to_utc_timestamp
    # treats it as local wall time exactly like pg's AT TIME ZONE
    ("SELECT TIMESTAMP '2024-01-01 12:00:00' AT TIME ZONE 'America/New_York'",
     "SELECT to_utc_timestamp(CAST('2024-01-01 12:00:00' AS TIMESTAMP_NTZ), "
     "'America/New_York')"),
    ("SELECT count(*) FILTER (WHERE x > 0) OVER (PARTITION BY k) FROM t",
     "SELECT count(CASE WHEN x > 0 THEN 1 END) OVER (PARTITION BY k) FROM t"),
    ("SELECT sum(v) FILTER (WHERE x > 0) OVER (ORDER BY ts) FROM t",
     # NULLS LAST: pg's ASC default, injected because Spark defaults to
     # nulls-first (transpiler._rewrite_order_by_nulls)
     "SELECT sum(CASE WHEN x > 0 THEN v END) OVER (ORDER BY ts NULLS LAST) FROM t"),
    # E-string doubled quote '' is ONE quote char in pg; Spark would parse
    # '…''…' as adjacent-literal concatenation (dropping it), so the
    # transpiler rewrites to \' (ADVICE r3)
    ("SELECT E'it''s'", "SELECT 'it\\'s' AS `?column?`"),
    ("SELECT E'a\\nb''c'", "SELECT 'a\\nb\\'c' AS `?column?`"),
    # pg array subscripts are 1-based (Spark's bare [i] is 0-based) — r6
    ("SELECT (arr)[1] FROM t", "SELECT try_element_at((arr), 1) FROM t"),
    ("SELECT arr[2][1] FROM t",
     "SELECT try_element_at(try_element_at(arr, 2), 1) FROM t"),
    ("SELECT arr[i] FROM t",
     "SELECT try_element_at(arr, CASE WHEN (i) >= 1 THEN (i) "
     "ELSE cardinality(arr) + 1 END) FROM t"),
])
def test_transpile(src, expected):
    assert transpile(src) == expected


def test_array_index_skips_emitted_bracket_literals():
    """The jsonb_agg FILTER path emits concat('[', …, ']') — raw bracket
    literals the subscript rewrite must not treat as an index (r6)."""
    out = transpile(
        "SELECT jsonb_agg(props -> 'k') FILTER (WHERE user_id > 0) FROM events"
    )
    assert "concat('[', concat_ws(" in out
    assert "try_element_at" not in out


# -- PG functions (reference query_handler_test.go "PG functions") -----------
def test_version(pg):
    assert one(pg, "SELECT version()") == (VERSION_STRING,)


def test_current_database_schema_user(pg):
    assert one(pg, "SELECT current_database(), current_schema(), current_user") == (
        "bemidb", "public", "bemidb",
    )


def test_current_setting(pg):
    assert one(pg, "SELECT current_setting('max_connections')") == ("100",)


# -- SET / SHOW / BEGIN (B16/B17) -------------------------------------------
def test_set_show_roundtrip(pg):
    pg.execute("SET application_name = 'mytool'")
    assert one(pg, "SHOW application_name") == ("mytool",)


def test_set_timezone_applies(pg):
    pg.execute("SET timezone = 'UTC'")
    assert one(pg, "SHOW timezone") == ("UTC",)
    assert pg.spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_show_unknown_raises(pg):
    with pytest.raises(UnsupportedQueryError):
        pg.execute("SHOW does_not_exist")


def test_isolated_session_inherits_input_size_policy(spark, tmp_path_factory):
    """newSession() forks a fresh SQLConf, so PgSession(isolate=True) must
    copy the embedder's runtime execution profile — otherwise wire clients
    silently run under defaults while bench.py measures the tuned profile
    (ADVICE r3; re-flagged r4 when the hand-maintained copy list drifted).
    The profile is defined ONCE (session.PROFILE_CONF_KEYS) and this test
    pins the full contract: after apply_input_size_policy on the parent, a
    fork agrees with the parent on EVERY profile conf."""
    from bemidb_spark.session import PROFILE_CONF_KEYS, apply_input_size_policy

    catalog = Catalog(str(tmp_path_factory.mktemp("isowh")))
    old = {k: spark.conf.get(k, None) for k in PROFILE_CONF_KEYS}
    try:
        apply_input_size_policy(spark, ["/root/testdata/sf0.001"])
        iso = PgSession(spark, catalog, isolate=True)
        assert iso.spark is not spark
        for k in PROFILE_CONF_KEYS:
            assert iso.spark.conf.get(k) == spark.conf.get(k), k
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_plan_cache_mode_reexecute(pg):
    """SET bemidb.plan_cache_mode = reexecute: cache hits re-execute the
    cached ANALYZED plan in a fresh Dataset (prepared-statement semantics
    with full work per call — bench.py's work-matched wire mode) instead of
    serving the resident Dataset object."""
    sql = "SELECT count(*) AS n FROM region"
    first = pg.execute(sql)
    assert pg.execute(sql) is first  # resident-object serving by default
    pg.execute("SET bemidb.plan_cache_mode = reexecute")
    again = pg.execute(sql)
    assert again is not first  # fresh Dataset per call...
    assert again.collect()[0].n == 5  # ...same result
    # the cached analyzed plan is still reused (no re-transpile/analysis):
    assert pg.execute(sql) is not again
    pg.execute("SET bemidb.plan_cache_mode = resident")
    resident = pg.execute(sql)
    assert pg.execute(sql) is resident  # back to resident serving


def test_begin_discard_noop(pg):
    assert pg.execute("BEGIN").collect() == []
    assert pg.execute("DISCARD ALL").collect() == []


def test_unsupported_statement(pg):
    with pytest.raises(UnsupportedQueryError):
        pg.execute("GRANT SELECT ON t TO someone")
    # DML is routed now — an unknown relation errors cleanly (42P01)
    with pytest.raises(UnsupportedQueryError, match="does not exist"):
        pg.execute("INSERT INTO no_such_table VALUES (1)")


# -- PG system tables (B5) ---------------------------------------------------
def test_pg_class_lists_tables(pg):
    names = {r.relname for r in pg.execute(
        "SELECT relname FROM pg_catalog.pg_class"
    ).collect()}
    assert {"lineitem", "orders", "events", "documents"} <= names


def test_pg_namespace_and_join(pg):
    rows = pg.execute("""
        SELECT n.nspname, count(*) AS n
        FROM pg_catalog.pg_class c
        JOIN pg_catalog.pg_namespace n ON c.relnamespace = n.oid
        GROUP BY n.nspname
    """).collect()
    assert any(r.nspname == "public" and r.n >= 4 for r in rows)


def test_pg_attribute_columns(pg):
    rows = pg.execute("""
        SELECT a.attname, a.atttypname
        FROM pg_attribute a JOIN pg_class c ON a.attrelid = c.oid
        WHERE c.relname = 'lineitem' ORDER BY a.attnum
    """).collect()
    names = [r.attname for r in rows]
    assert names[0] == "l_orderkey"
    assert dict((r.attname, r.atttypname) for r in rows)["l_quantity"] == "float8"


def test_pg_type_has_common_oids(pg):
    rows = dict(
        (r.typname, r.oid)
        for r in pg.execute("SELECT typname, oid FROM pg_type").collect()
    )
    assert rows["bool"] == 16 and rows["int8"] == 20 and rows["numeric"] == 1700


# -- information_schema (B6) -------------------------------------------------
def test_information_schema_tables(pg):
    rows = pg.execute("""
        SELECT table_name FROM information_schema.tables
        WHERE table_schema = 'public'
    """).collect()
    assert {"orders", "lineitem"} <= {r.table_name for r in rows}


def test_information_schema_columns(pg):
    rows = pg.execute("""
        SELECT column_name, udt_name FROM information_schema.columns
        WHERE table_name = 'events' ORDER BY ordinal_position
    """).collect()
    got = {r.column_name: r.udt_name for r in rows}
    assert got["event_id"] == "int8" and got["props"] == "text"


# -- real queries through the router ----------------------------------------
def test_select_through_router(pg):
    (n,) = one(pg, "SELECT count(*) AS n FROM region")
    assert n == 5


def test_json_operator_through_router(pg):
    (k,) = one(pg, "SELECT props ->> 'k' AS k FROM events WHERE event_id = 0")
    assert k is not None and k.isdigit()


def test_cast_through_router(pg):
    assert one(pg, "SELECT 1::int8 AS a, 'x'::text AS b, 2.5::float8 AS c") == (1, "x", 2.5)


# -- materialized views through the router (C6) ------------------------------
def test_matview_ddl_roundtrip(pg):
    pg.execute("""
        CREATE MATERIALIZED VIEW mv_region AS
        SELECT r_name, count(*) AS n FROM region GROUP BY r_name
    """)
    from bemidb_spark.sources.matview import read_materialized_view

    assert read_materialized_view(pg.spark, pg.catalog, "mv_region").count() == 5
    # registered in pg_class after DDL
    names = {r.relname for r in pg.execute("SELECT relname FROM pg_class").collect()}
    assert "mv_region" in names

    pg.execute("REFRESH MATERIALIZED VIEW mv_region")
    assert read_materialized_view(pg.spark, pg.catalog, "mv_region").count() == 5

    pg.execute("ALTER MATERIALIZED VIEW mv_region RENAME TO mv_r2")
    assert read_materialized_view(pg.spark, pg.catalog, "mv_r2").count() == 5

    pg.execute("DROP MATERIALIZED VIEW mv_r2")
    with pytest.raises(KeyError):
        read_materialized_view(pg.spark, pg.catalog, "mv_r2")


# -- permissions comment (B20) -----------------------------------------------
def test_permissions_column_projection(pg):
    rows = pg.execute("""
        /*BEMIDB_PERMISSIONS {"public.region": ["r_name"]}*/
        SELECT * FROM region ORDER BY r_name LIMIT 1
    """).collect()
    assert rows[0].asDict().keys() == {"r_name"}


def test_permissions_denied_table(pg):
    rows = pg.execute("""
        /*BEMIDB_PERMISSIONS {"public.region": []}*/
        SELECT * FROM region
    """).collect()
    assert rows == []


def test_permissions_forbidden_column_errors(pg):
    with pytest.raises(Exception, match="r_regionkey|UNRESOLVED"):
        pg.execute("""
            /*BEMIDB_PERMISSIONS {"public.region": ["r_name"]}*/
            SELECT r_regionkey FROM region
        """).collect()


def test_permissions_cannot_be_dodged_by_identifiers(pg):
    """VERDICT r2 item 5: enforcement is at view-binding time, so quoted
    identifiers, aliases, self-joins, and subquery refs all resolve against
    the pruned relation — there is no textual pattern to dodge."""
    perm = '/*BEMIDB_PERMISSIONS {"public.region": ["r_name"]}*/'
    # quoted table identifier
    with pytest.raises(Exception, match="r_regionkey|UNRESOLVED"):
        pg.execute(f'{perm} SELECT r_regionkey FROM "region"').collect()
    # aliased reference
    with pytest.raises(Exception, match="r_regionkey|UNRESOLVED"):
        pg.execute(f"{perm} SELECT t.r_regionkey FROM region AS t").collect()
    # aliased self-join
    with pytest.raises(Exception, match="r_regionkey|UNRESOLVED"):
        pg.execute(
            f"{perm} SELECT a.r_regionkey FROM region a "
            "JOIN region b ON a.r_name = b.r_name").collect()
    # table ref inside a subquery
    with pytest.raises(Exception, match="r_regionkey|UNRESOLVED"):
        pg.execute(
            f"{perm} SELECT * FROM (SELECT r_regionkey FROM region) s").collect()
    # table ref inside a CTE
    with pytest.raises(Exception, match="r_regionkey|UNRESOLVED"):
        pg.execute(
            f"{perm} WITH c AS (SELECT r_regionkey FROM region) "
            "SELECT * FROM c").collect()
    # the permitted column still works through every one of those shapes
    rows = pg.execute(
        f"{perm} WITH c AS (SELECT t.r_name FROM region AS t) "
        "SELECT * FROM c ORDER BY r_name LIMIT 1").collect()
    assert rows[0].asDict().keys() == {"r_name"}
    # and a denied table is empty even via alias + subquery
    rows = pg.execute(
        '/*BEMIDB_PERMISSIONS {"public.region": []}*/ '
        "SELECT * FROM (SELECT * FROM region AS z) q").collect()
    assert rows == []
    # enforcement window over: unrestricted queries see the full table again
    assert len(pg.execute("SELECT r_regionkey FROM region").collect()) == 5


# -- prepared-plan cache -----------------------------------------------------
def test_plan_cache_reuses_dataframe(pg):
    a = pg.execute("SELECT COUNT(*) AS n FROM region")
    b = pg.execute("SELECT COUNT(*) AS n FROM region")
    assert a is b  # same Dataset => analyzed/optimized plan computed once


def test_plan_cache_invalidated_by_set(pg):
    a = pg.execute("SELECT COUNT(*) AS n FROM nation")
    pg.execute("SET timezone TO 'America/New_York'")
    b = pg.execute("SELECT COUNT(*) AS n FROM nation")
    pg.execute("SET timezone TO 'UTC'")
    assert a is not b


def test_plan_cache_invalidated_by_matview_ddl(pg):
    a = pg.execute("SELECT COUNT(*) AS n FROM customer")
    pg.execute("CREATE MATERIALIZED VIEW plancache_mv AS SELECT 1 AS one")
    try:
        b = pg.execute("SELECT COUNT(*) AS n FROM customer")
        assert a is not b
    finally:
        pg.execute("DROP MATERIALIZED VIEW plancache_mv")


def test_refresh_matview_keeps_views_readable(pg):
    pg.execute("CREATE MATERIALIZED VIEW refresh_mv AS SELECT COUNT(*) AS n FROM region")
    try:
        before = pg.execute("SELECT n FROM refresh_mv").collect()
        pg.execute("REFRESH MATERIALIZED VIEW refresh_mv")
        after = pg.execute("SELECT n FROM refresh_mv").collect()
        assert [tuple(r) for r in before] == [tuple(r) for r in after]
    finally:
        pg.execute("DROP MATERIALIZED VIEW refresh_mv")


# -- reference laxness: scalar subqueries + ::regclass ------------------------
def test_scalar_subquery_multi_row_returns_first(pg):
    # reference runs with scalar_subquery_error_on_multiple_rows=false
    # (main.go:67): a multi-row scalar subquery yields one row, not an error.
    rows = pg.execute(
        "SELECT (SELECT n_name FROM nation ORDER BY n_name) AS first_name"
    ).collect()
    expected = pg.execute("SELECT MIN(n_name) AS m FROM nation").collect()[0][0]
    assert len(rows) == 1 and rows[0][0] == expected


def test_scalar_subquery_limit_not_injected_into_cte(pg):
    rows = pg.execute(
        "WITH r AS (SELECT n_regionkey FROM nation) SELECT COUNT(*) AS n FROM r"
    ).collect()
    assert rows[0][0] == 25


def test_regclass_resolves_to_pg_class_oid(pg):
    # reference resolves '::regclass' via a pg_class scalar subquery
    # (parser_type_cast.go:90-206); oid-joins must work.
    rows = pg.execute(
        "SELECT c.relname FROM pg_class c WHERE c.oid = 'public.region'::regclass::oid"
    ).collect()
    assert [r[0] for r in rows] == ["region"]
    rows = pg.execute(
        "SELECT 'region'::regclass::oid = (SELECT oid FROM pg_class WHERE relname = 'region') AS same"
    ).collect()
    assert rows[0][0] is True


def test_pg_default_column_names(pg):
    # B15: unnamed targets get pg's default names (?column?, function name)
    df = pg.execute("SELECT 1, 'x', 2 + 3, lower('ABC'), count(*) FROM region")
    assert df.columns == ["?column?", "?column?", "?column?", "lower", "count"]
    df = pg.execute("SELECT r_regionkey::text FROM region LIMIT 1")
    assert df.columns == ["r_regionkey"]  # cast of a column keeps its name
    df = pg.execute("SELECT r_name AS explicit FROM region LIMIT 1")
    assert df.columns == ["explicit"]


# -- set-returning functions & array constructors (pg SRF surface) -----------
def test_generate_series_from_clause(pg):
    rows = pg.execute(
        "SELECT n FROM generate_series(1, 5) AS g(n) WHERE n % 2 = 1"
    ).collect()
    assert [r[0] for r in rows] == [1, 3, 5]


def test_generate_series_default_names(pg):
    df = pg.execute("SELECT * FROM generate_series(2, 4)")
    assert df.columns == ["generate_series"]
    assert [r[0] for r in df.collect()] == [2, 3, 4]


def test_generate_series_step_and_select_list(pg):
    rows = pg.execute("SELECT generate_series(0, 10, 5)").collect()
    assert [r[0] for r in rows] == [0, 5, 10]


def test_generate_series_dates(pg):
    rows = pg.execute(
        "SELECT d FROM generate_series('2024-01-01'::date, '2024-01-03'::date, "
        "interval '1 day') AS t(d)"
    ).collect()
    assert len(rows) == 3 and str(rows[0][0])[:10] == "2024-01-01"


def test_generate_series_cross_join(pg):
    rows = pg.execute(
        "SELECT r_name, n FROM region, generate_series(1, 2) AS s(n) "
        "WHERE r_name = 'ASIA' ORDER BY n"
    ).collect()
    assert [(r[0], r[1]) for r in rows] == [("ASIA", 1), ("ASIA", 2)]


def test_unnest_from_clause_with_array_literal(pg):
    rows = pg.execute(
        "SELECT x FROM unnest(ARRAY['a', 'b', 'c']) AS t(x) ORDER BY x DESC"
    ).collect()
    assert [r[0] for r in rows] == ["c", "b", "a"]


def test_unnest_with_ordinality(pg):
    rows = pg.execute(
        "SELECT x, i FROM unnest(ARRAY[10, 20, 30]) WITH ORDINALITY AS t(x, i)"
    ).collect()
    assert [(r[0], r[1]) for r in rows] == [(10, 1), (20, 2), (30, 3)]


def test_unnest_select_list_default_name(pg):
    df = pg.execute("SELECT unnest(ARRAY[1, 2])")
    assert df.columns == ["unnest"]
    assert [r[0] for r in df.collect()] == [1, 2]


def test_nested_array_literal(pg):
    rows = pg.execute("SELECT ARRAY[ARRAY[1, 2], ARRAY[3, 4]] AS m").collect()
    assert rows[0][0] == [[1, 2], [3, 4]]


def test_array_agg_order_by(pg):
    rows = pg.execute(
        "SELECT array_agg(n_name ORDER BY n_name) AS names FROM nation "
        "WHERE n_regionkey = 0"
    ).collect()
    assert rows[0][0] == sorted(rows[0][0]) and len(rows[0][0]) == 5
    rows_desc = pg.execute(
        "SELECT array_agg(n_name ORDER BY n_name DESC) AS names FROM nation "
        "WHERE n_regionkey = 0"
    ).collect()
    assert rows_desc[0][0] == list(reversed(rows[0][0]))


def test_array_string_roundtrip_funcs(pg):
    rows = pg.execute(
        "SELECT array_to_string(ARRAY['a', 'b', 'c'], '|') AS joined, "
        "string_to_array('x.y.z', '.') AS split_lit, "
        "strpos('hello', 'll') AS pos, "
        "array_length(ARRAY[1, 2, 3], 1) AS alen"
    ).collect()
    assert tuple(rows[0]) == ("a|b|c", ["x", "y", "z"], 3, 3)


def test_for_update_clause_stripped(pg):
    """ORM row-locking clauses are no-ops on a read-only replica."""
    rows = pg.execute(
        "SELECT n_name FROM nation WHERE n_nationkey = 3 FOR UPDATE"
    ).collect()
    assert len(rows) == 1
    rows = pg.execute(
        "SELECT n_name FROM nation WHERE n_nationkey = 3 FOR SHARE OF nation NOWAIT"
    ).collect()
    assert len(rows) == 1
    rows = pg.execute(
        "SELECT n_name FROM nation WHERE n_nationkey = 3 FOR NO KEY UPDATE SKIP LOCKED"
    ).collect()
    assert len(rows) == 1
    # inside a subquery, and never corrupting a string literal
    rows = pg.execute(
        "SELECT * FROM (SELECT n_name FROM nation LIMIT 2 FOR UPDATE) t"
    ).collect()
    assert len(rows) == 2
    rows = pg.execute("SELECT 'saved FOR UPDATE later' AS s").collect()
    assert rows[0][0] == "saved FOR UPDATE later"


def test_explain_returns_query_plan(pg):
    rows = pg.execute(
        "EXPLAIN SELECT n_name FROM nation WHERE n_regionkey = 1"
    ).collect()
    assert rows[0].__fields__ == ["QUERY PLAN"]
    text = "\n".join(r[0] for r in rows)
    assert "Scan parquet" in text or "Scan " in text
    assert "PushedFilters" in text  # the plan the engine will actually run
    # EXPLAIN (FORMAT TEXT) / EXPLAIN ANALYZE prefixes also parse
    assert pg.execute("EXPLAIN (COSTS FALSE) SELECT 1").collect()
    assert pg.execute("EXPLAIN ANALYZE SELECT 1").collect()


def test_pg_stat_activity(pg):
    # always empty, like the reference's emulation (its boot DDL creates a
    # bare table, query_remapper_table.go:284) — clients get zero rows,
    # never an error
    df = pg.execute(
        "SELECT pid, usename, state, backend_type FROM pg_stat_activity"
    )
    assert df.collect() == []


def test_to_char_date_patterns(pg):
    rows = pg.execute(
        "SELECT to_char(DATE '2024-03-07', 'YYYY-MM-DD') AS iso, "
        "to_char(TIMESTAMP '2024-03-07 14:05:09', 'HH24:MI:SS') AS hms, "
        "to_char(DATE '2024-03-07', 'Mon DD, YYYY') AS pretty, "
        "to_char(DATE '2024-03-07', 'Day') AS dayname"
    ).collect()
    assert tuple(rows[0]) == ("2024-03-07", "14:05:09", "Mar 07, 2024", "Thursday")


def test_sql_level_prepare_execute_deallocate(pg):
    assert pg.execute(
        "PREPARE natq (int) AS SELECT n_name FROM nation WHERE n_regionkey = $1 "
        "ORDER BY n_name"
    ).columns == ["PREPARE"]
    rows = pg.execute("EXECUTE natq(0)").collect()
    assert len(rows) == 5
    rows2 = pg.execute("EXECUTE natq(0 + 1)").collect()  # args are expressions
    assert len(rows2) == 5 and rows2 != rows
    assert pg.execute("DEALLOCATE natq").columns == ["DEALLOCATE"]
    with pytest.raises(UnsupportedQueryError, match="does not exist"):
        pg.execute("EXECUTE natq(0)")
    pg.execute("PREPARE p2 AS SELECT 1 AS x")
    pg.execute("DEALLOCATE ALL")
    with pytest.raises(UnsupportedQueryError, match="does not exist"):
        pg.execute("EXECUTE p2")


def test_listen_notify_noops(pg):
    assert pg.execute("LISTEN chan").columns == ["LISTEN"]
    assert pg.execute("NOTIFY chan, 'hello'").columns == ["NOTIFY"]
    assert pg.execute("UNLISTEN *").columns == ["UNLISTEN"]


def test_pg_locks_and_stat_database(pg):
    assert pg.execute("SELECT * FROM pg_locks").collect() == []
    rows = pg.execute(
        "SELECT datname, numbackends FROM pg_stat_database").collect()
    assert rows[0].numbackends == 1


# -- server-side cursors (DECLARE/FETCH/MOVE/CLOSE) --------------------------
def test_cursor_lifecycle(pg):
    pg.execute("BEGIN")
    assert pg.execute(
        "DECLARE cur1 CURSOR FOR SELECT n_nationkey FROM nation ORDER BY n_nationkey"
    ).columns == ["DECLARE CURSOR"]
    d = pg.execute("FETCH 3 FROM cur1")
    assert d._pg_tag == "FETCH 3"
    assert [r[0] for r in d.collect()] == [0, 1, 2]
    d = pg.execute("MOVE 2 FROM cur1")
    assert d._pg_tag == "MOVE 2"
    d = pg.execute("FETCH FORWARD 2 IN cur1")
    assert [r[0] for r in d.collect()] == [5, 6]
    d = pg.execute("FETCH ALL FROM cur1")
    assert d._pg_tag == "FETCH 18" and len(d.collect()) == 18
    d = pg.execute("FETCH cur1")  # exhausted: pg answers FETCH 0
    assert d._pg_tag == "FETCH 0" and d.collect() == []
    assert pg.execute("CLOSE cur1").columns == ["CLOSE CURSOR"]
    with pytest.raises(UnsupportedQueryError, match="does not exist"):
        pg.execute("FETCH 1 FROM cur1")
    pg.execute("DECLARE c2 NO SCROLL CURSOR WITH HOLD FOR SELECT 1 AS x")
    pg.execute("CLOSE ALL")
    with pytest.raises(UnsupportedQueryError, match="does not exist"):
        pg.execute("CLOSE c2")
    pg.execute("COMMIT")


# -- DISTINCT ON -------------------------------------------------------------
def test_distinct_on_matches_window_emulation(pg):
    rows = pg.execute(
        "SELECT DISTINCT ON (user_id) user_id, ts, event_type FROM events "
        "ORDER BY user_id, ts DESC, event_id"
    ).collect()
    expect = pg.execute(
        "SELECT user_id, ts, event_type FROM ("
        " SELECT user_id, ts, event_type, event_id,"
        "  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) rn"
        " FROM events) t WHERE rn = 1 ORDER BY user_id"
    ).collect()
    assert rows == expect and len(rows) > 0


def test_distinct_on_no_order_by(pg):
    rows = pg.execute(
        "SELECT DISTINCT ON (n_regionkey) n_regionkey FROM nation"
    ).collect()
    assert sorted(r[0] for r in rows) == [0, 1, 2, 3, 4]


# -- ALTER TABLE / TRUNCATE / index-comment no-ops ---------------------------
def test_alter_table_truncate_roundtrip(pg):
    pg.execute("CREATE TABLE public.alt1 (id int, name text)")
    pg.execute("INSERT INTO public.alt1 VALUES (1, 'a'), (2, 'b')")
    pg.execute("ALTER TABLE public.alt1 ADD COLUMN score double precision DEFAULT 1.5")
    rows = pg.execute("SELECT * FROM public.alt1 ORDER BY id").collect()
    assert [tuple(r) for r in rows] == [(1, "a", 1.5), (2, "b", 1.5)]
    pg.execute("ALTER TABLE public.alt1 RENAME COLUMN name TO label")
    pg.execute("ALTER TABLE public.alt1 ALTER COLUMN id TYPE bigint")
    df = pg.execute("SELECT * FROM public.alt1 ORDER BY id")
    assert df.columns == ["id", "label", "score"]
    assert dict(df.dtypes)["id"] == "bigint"
    pg.execute("ALTER TABLE public.alt1 DROP COLUMN score")
    pg.execute("ALTER TABLE public.alt1 RENAME TO alt2")
    assert [tuple(r) for r in pg.execute(
        "SELECT * FROM public.alt2 ORDER BY id").collect()] == [(1, "a"), (2, "b")]
    d = pg.execute("TRUNCATE TABLE public.alt2")
    assert d._pg_tag == "TRUNCATE TABLE"
    assert pg.execute("SELECT count(*) AS n FROM public.alt2").collect()[0].n == 0
    # indexes and comments: accepted, metadata-only elsewhere, no-op here
    assert pg.execute("CREATE INDEX i1 ON public.alt2(id)").columns == ["CREATE"]
    assert pg.execute("COMMENT ON TABLE public.alt2 IS 'scratch'").columns == ["COMMENT"]
    pg.execute("DROP TABLE public.alt2")


def test_tablesample_and_array_slice(pg):
    n = pg.execute(
        "SELECT count(*) AS n FROM lineitem TABLESAMPLE BERNOULLI(10)"
    ).collect()[0].n
    total = pg.execute("SELECT count(*) AS n FROM lineitem").collect()[0].n
    assert 0.03 * total < n < 0.25 * total
    row = pg.execute(
        "SELECT (string_to_array('a b c d', ' '))[2:3] AS s").collect()[0]
    assert row.s == ["b", "c"]
    # pg subscript semantics: negative/zero -> NULL (DuckDB counts negatives
    # from the back — deliberate pg-faithful divergence, excluded from the
    # differential fuzz), 0-start slices clamp, hi < lo is empty
    row = pg.execute(
        "SELECT (ARRAY[1,2,3])[-1] AS neg, (ARRAY[1,2,3])[0] AS zero, "
        "(ARRAY[1,2,3])[0:2] AS clamp, (ARRAY[1,2,3])[3:2] AS empty").collect()[0]
    assert row.neg is None and row.zero is None
    assert row.clamp == [1, 2] and row.empty == []


def test_tsvector_tsquery_emulation(pg):
    n_and = pg.execute(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector('english', text) @@ to_tsquery('the & fast')"
    ).collect()[0].n
    n_or = pg.execute(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ to_tsquery('the | fast')"
    ).collect()[0].n
    assert 0 < n_and <= n_or
    # plainto = AND of words; prefix :* matches surface forms
    n_plain = pg.execute(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ plainto_tsquery('the fast')"
    ).collect()[0].n
    assert n_plain == n_and
    n_not = pg.execute(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ to_tsquery('the & !fast')"
    ).collect()[0].n
    n_the = pg.execute(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ to_tsquery('the')"
    ).collect()[0].n
    assert n_not == n_the - n_and
    assert pg.execute(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ to_tsquery('zzznope')"
    ).collect()[0].n == 0


def test_information_schema_breadth(pg):
    rows = pg.execute(
        "SELECT schema_name FROM information_schema.schemata ORDER BY schema_name"
    ).collect()
    names = [r[0] for r in rows]
    assert "public" in names and "pg_catalog" in names
    cols = pg.execute(
        "SELECT column_name, data_type, udt_name FROM information_schema.columns "
        "WHERE table_name = 'nation' ORDER BY ordinal_position"
    ).collect()
    assert [c.column_name for c in cols][:2] == ["n_nationkey", "n_name"]
    assert cols[1].data_type == "text"
    assert pg.execute(
        "SELECT * FROM information_schema.table_constraints").collect() == []
    assert pg.execute(
        "SELECT * FROM information_schema.key_column_usage").collect() == []
    pg.execute("SELECT * FROM information_schema.views").collect()  # resolvable


def test_fetch_first_rows_only(pg):
    rows = pg.execute(
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey "
        "OFFSET 2 ROWS FETCH FIRST 3 ROWS ONLY").collect()
    assert [r[0] for r in rows] == [2, 3, 4]
    rows = pg.execute(
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey "
        "FETCH FIRST ROW ONLY").collect()
    assert [r[0] for r in rows] == [0]


def test_pg_stat_statements_tracks_calls(pg):
    pg.execute("SELECT 41 + 1 AS probe_stat").collect()
    pg.execute("SELECT 41 + 1 AS probe_stat").collect()
    # pg_stat_statements normalizes constants, so differently-parameterized
    # repeats collapse into one entry ($?-marked), like the real extension
    rows = pg.execute(
        "SELECT calls FROM pg_stat_statements "
        "WHERE query = 'SELECT $? + $? AS probe_stat'").collect()
    assert rows and rows[0].calls >= 2
    pg.execute("SELECT 99 + 3 AS probe_stat").collect()  # same shape
    rows = pg.execute(
        "SELECT calls FROM pg_stat_statements "
        "WHERE query = 'SELECT $? + $? AS probe_stat'").collect()
    assert rows[0].calls >= 3


def test_json_srf_functions(pg):
    rows = pg.execute(
        "SELECT value FROM jsonb_array_elements('[1,2,3]') AS t(value)").collect()
    assert [r.value for r in rows] == ["1", "2", "3"]
    rows = pg.execute(
        "SELECT event_id, e.key, e.value FROM events, "
        "LATERAL json_each(props) AS e(key, value) "
        "ORDER BY event_id, e.key LIMIT 3").collect()
    assert len(rows) == 3 and all(r.key for r in rows)
    rows = pg.execute(
        "SELECT event_id FROM events, json_each(props) AS e(key, value) "
        "WHERE e.key = 'k' ORDER BY event_id LIMIT 2").collect()
    assert len(rows) == 2


def test_cursor_closed_at_txn_end_unless_hold(pg):
    pg.execute("BEGIN")
    pg.execute("DECLARE tc CURSOR FOR SELECT 1 AS x")
    pg.execute("DECLARE th CURSOR WITH HOLD FOR SELECT 2 AS y")
    pg.execute("COMMIT")
    with pytest.raises(UnsupportedQueryError, match="does not exist"):
        pg.execute("FETCH tc")
    assert pg.execute("FETCH th")._pg_tag == "FETCH 1"
    pg.execute("CLOSE th")


def test_json_builders_and_explain_analyze(pg):
    assert pg.execute(
        "SELECT json_build_object('a', 1, 'b', 'x') AS j").collect()[0].j == '{"a":1,"b":"x"}'
    j = pg.execute(
        "SELECT jsonb_object_agg(n_name, n_regionkey) AS j FROM nation "
        "WHERE n_regionkey = 0").collect()[0].j
    assert j.startswith('{"NATION_') and '":0' in j
    j = pg.execute("SELECT row_to_json(nation) AS j FROM nation "
                   "WHERE n_nationkey = 0").collect()[0].j
    assert '"n_nationkey":0' in j and '"n_name":"NATION_0"' in j
    rows = [r[0] for r in pg.execute(
        "EXPLAIN ANALYZE SELECT count(*) FROM nation").collect()]
    assert any(r.startswith("Execution Time:") for r in rows)
    assert "Rows: 1" in rows


def test_array_operators_and_any_all(pg):
    r = pg.execute(
        "SELECT count(*) AS n FROM nation WHERE n_name = ANY "
        "(SELECT n_name FROM nation WHERE n_regionkey = 0)").collect()[0].n
    assert r == 5
    r = pg.execute(
        "SELECT count(*) AS n FROM nation WHERE n_regionkey <> ALL (SELECT 0)"
    ).collect()[0].n
    assert r == 20
    row = pg.execute(
        "SELECT (string_to_array('a b', ' ') && string_to_array('b c', ' ')) AS o, "
        "'b' = ANY(string_to_array('a b', ' ')) AS m").collect()[0]
    assert row.o is True and row.m is True


def test_pg_views_lists_plain_views(pg):
    pg.execute("CREATE TABLE pv_base (id bigint)")
    pg.execute("CREATE VIEW pv_v AS SELECT id FROM public.pv_base")
    rows = pg.execute(
        "SELECT viewname, viewowner, definition FROM pg_views "
        "WHERE viewname = 'pv_v'").collect()
    assert rows and rows[0].viewowner == "bemidb"
    assert "pv_base" in rows[0].definition
    pg.execute("DROP VIEW pv_v")
    pg.execute("DROP TABLE pv_base")


def test_monitoring_function_folds(pg):
    row = pg.execute(
        "SELECT txid_current() AS t, pg_current_wal_lsn() AS l, "
        "current_schemas(true) AS cs").collect()[0]
    assert row.t == 1000 and row.l == "0/0"
    assert row.cs == ["pg_catalog", "public"]


def test_set_local_is_transaction_scoped(pg):
    """pg SET LOCAL semantics: reverts at COMMIT/ROLLBACK; no effect outside
    a transaction block; SET SESSION survives an inner SET LOCAL."""
    def tz():
        return pg.execute("SHOW timezone").collect()[0][0]

    assert tz() == "UTC"
    pg.execute("SET LOCAL timezone TO 'America/New_York'")  # outside txn
    assert tz() == "UTC"
    pg.execute("BEGIN")
    pg.execute("SET LOCAL timezone TO 'America/New_York'")
    assert tz() == "America/New_York"
    pg.execute("COMMIT")
    assert tz() == "UTC"
    assert pg.spark.conf.get("spark.sql.session.timeZone") == "UTC"
    pg.execute("SET timezone TO 'Asia/Tokyo'")
    pg.execute("BEGIN")
    pg.execute("SET LOCAL timezone TO 'UTC'")
    pg.execute("ROLLBACK")
    assert tz() == "Asia/Tokyo"
    pg.execute("SET timezone TO 'UTC'")


def test_set_search_path_list_value_preserved(pg):
    """List-valued GUCs keep pg's display form: `"$user", public` SHOWs
    exactly as set (quoted identifiers preserved, items comma-joined)."""
    pg.execute('SET search_path = "$user", public')
    assert pg.execute("SHOW search_path").collect()[0][0] == '"$user", public'
    pg.execute("SET search_path TO 'myschema'")
    assert pg.execute("SHOW search_path").collect()[0][0] == "myschema"
    pg.execute('SET search_path = "$user", public')


def test_gucs_are_transactional(pg):
    """pg GUC semantics: a plain SET inside a rolled-back transaction
    disappears; ROLLBACK TO SAVEPOINT reverts to the savepoint's settings;
    a committed SET survives."""
    def tz():
        return pg.execute("SHOW timezone").collect()[0][0]

    base = tz()
    pg.execute("BEGIN")
    pg.execute("SET timezone TO 'Asia/Tokyo'")
    assert tz() == "Asia/Tokyo"
    pg.execute("ROLLBACK")
    assert tz() == base
    pg.execute("BEGIN")
    pg.execute("SET timezone TO 'Europe/Paris'")
    pg.execute("SAVEPOINT s1")
    pg.execute("SET timezone TO 'Asia/Tokyo'")
    pg.execute("ROLLBACK TO SAVEPOINT s1")
    assert tz() == "Europe/Paris"
    pg.execute("COMMIT")
    assert tz() == "Europe/Paris"
    pg.execute(f"SET timezone TO '{base}'")


# -- WITH RECURSIVE through the session layer (native Spark 4.1 execution) ---
def test_recursive_cte_reference_shape(pg):
    """Mirrors the reference's WITH RECURSIVE golden (a pg_roles CTE that
    isn't actually self-referencing — reference
    server/query_handler_test.go:1366-1374): routes through Spark's native
    recursive-CTE support, no session-layer loop needed."""
    rows = pg.execute(
        "WITH RECURSIVE simple_cte AS ("
        "SELECT oid, rolname FROM pg_roles WHERE rolname = 'postgres' "
        "UNION ALL SELECT oid, rolname FROM pg_roles) "
        "SELECT * FROM simple_cte"
    ).collect()
    assert [tuple(r) for r in rows] == [(10, "bemidb")]


def test_recursive_cte_genuinely_self_recursive(pg):
    """A genuinely self-referencing recursive CTE executes natively end-to-end."""
    assert one(
        pg,
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 10) "
        "SELECT sum(n) AS s, count(*) AS c FROM t",
    ) == (55, 10)
    assert one(
        pg,
        "WITH RECURSIVE fib(a, b) AS (VALUES (0, 1) UNION ALL "
        "SELECT b, a + b FROM fib WHERE b < 100) "
        "SELECT max(b) AS m FROM fib",
    ) == (144,)


def test_pg_catalog_fast_registration_matches_slow(spark, tmp_path_factory):
    """The per-connection fast path (cached analyzed plans re-registered via
    plan wrapping, catalog_views._PLAN_CACHE) must produce views identical
    to a full rebuild, and must MISS the cache after DDL bumps the catalog
    version — a new connection sees the new table in pg_class."""
    from bemidb_spark.pgcompat import catalog_views as cv

    catalog = Catalog(str(tmp_path_factory.mktemp("fastwh")))
    a = PgSession(spark, catalog, isolate=True)   # slow path, fills cache
    b = PgSession(spark, catalog, isolate=True)   # fast path from cache
    for view in ("pg_class", "pg_namespace", "pg_type",
                 "information_schema_columns"):
        rows_a = sorted(map(tuple, a.execute(f"SELECT * FROM {view}").collect()))
        rows_b = sorted(map(tuple, b.execute(f"SELECT * FROM {view}").collect()))
        assert rows_a == rows_b, view
    # every static view the slow path creates is present on the fast session
    missing = [n for n in cv._STATIC_VIEW_NAMES
               if not b.spark.catalog.tableExists(n)]
    assert not missing, missing
    # DDL bumps the catalog version -> the cache key changes -> a NEW
    # connection rebuilds and sees the table
    a.execute("CREATE TABLE fastreg_t (id int, name text)")
    c = PgSession(spark, catalog, isolate=True)
    names = {r.relname for r in c.execute(
        "SELECT relname FROM pg_class WHERE relname = 'fastreg_t'").collect()}
    assert names == {"fastreg_t"}


def test_pgvector_operators_match_numpy(pg, spark):
    """`<->` / `<=>` / `<#>` (pgvector operator surface) over the real float
    embeddings must match numpy's euclidean / cosine-distance / -dot within
    float tolerance, and ascending `<#>` ordering ranks nearest-first."""
    import numpy as np

    rows = pg.execute(
        "SELECT i.vec_id, "
        "  i.embedding <-> qv.qq AS eud, "
        "  i.embedding <=> qv.qq AS cosd, "
        "  i.embedding <#> qv.qq AS ndot "
        "FROM embeddings i "
        "CROSS JOIN (SELECT embedding AS qq FROM embeddings WHERE vec_id = 3) qv "
        "ORDER BY i.vec_id LIMIT 40").collect()
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in
           spark.sql("SELECT vec_id, embedding FROM embeddings "
                     "WHERE vec_id < 40 OR vec_id = 3").collect()}
    q = emb[3]
    for r in rows:
        v = emb[r.vec_id]
        assert abs(r.eud - np.linalg.norm(v - q)) < 1e-6
        assert abs(r.ndot - (-float(v @ q))) < 1e-6
        want_cos = 1 - float(v @ q) / (np.linalg.norm(v) * np.linalg.norm(q))
        assert abs(r.cosd - want_cos) < 1e-6
    # nearest-first under ascending negative-inner-product ordering
    # (Spark disallows subqueries inside higher-order functions, so the
    # query vector binds via a join, not a scalar subquery operand —
    # documented operand limitation of the rewrite)
    top = pg.execute(
        "SELECT i.vec_id FROM embeddings i "
        "CROSS JOIN (SELECT embedding AS qq FROM embeddings "
        "WHERE vec_id = 3) qv "
        "ORDER BY i.embedding <#> qv.qq ASC LIMIT 1").collect()
    assert top[0].vec_id == 3  # the query vector is its own best match


def test_pg_default_null_ordering(pg):
    """pg sorts NULLs LAST on ASC and FIRST on DESC — Spark's defaults are
    the opposite; the transpiler injects pg's default on every ORDER BY
    item (including window peer order) without an explicit NULLS clause.
    The driver's value-hash gate is order-insensitive, so this is pinned
    here by row order."""
    asc = [r.x for r in pg.execute(
        "SELECT x FROM (VALUES (1), (NULL), (3)) t(x) ORDER BY x").collect()]
    assert asc == [1, 3, None]
    desc = [r.x for r in pg.execute(
        "SELECT x FROM (VALUES (1), (NULL), (3)) t(x) ORDER BY x DESC"
    ).collect()]
    assert desc == [None, 3, 1]
    rk = [tuple(r) for r in pg.execute(
        "SELECT x, rank() OVER (ORDER BY x) AS rk "
        "FROM (VALUES (1), (NULL), (3)) t(x) ORDER BY rk").collect()]
    assert rk == [(1, 1), (3, 2), (None, 3)]
    # explicit NULLS clauses are honored unchanged
    expl = [r.x for r in pg.execute(
        "SELECT x FROM (VALUES (1), (NULL), (3)) t(x) "
        "ORDER BY x NULLS FIRST").collect()]
    assert expl == [None, 1, 3]


def test_pg_power_operator_and_starts_with(pg):
    """pg `^` is exponentiation — Spark's `^` is bitwise XOR (3 ^ 2 would
    silently return 1); starts_with is pg11+ spelling of startswith."""
    r = one(pg, "SELECT 3 ^ 2 AS p, 2 ^ 10 AS p2, 4 ^ 0.5 AS rt, "
                "CAST(2 ^ -1 AS DOUBLE) AS inv, "
                "starts_with('abc', 'ab') AS sw")
    assert (r[0], r[1], r[2], r[3], r[4]) == (9.0, 1024.0, 2.0, 0.5, True)


def test_pg_quote_and_split_functions(pg):
    r = one(pg, "SELECT quote_ident('abc') AS a, "
                "quote_ident('Weird Name') AS b, "
                "quote_literal('o''x') AS c, "
                "regexp_split_to_array('a1b2c33d', '[0-9]+') AS d")
    assert r[0] == "abc"            # lowercase identifier: no quoting, as pg
    assert r[1] == '"Weird Name"'
    assert r[2] == "'o''x'"
    assert r[3] == ["a", "b", "c", "d"]


def test_pg_power_unary_minus_precedence(pg):
    """pg binds unary minus TIGHTER than `^`: -2 ^ 2 = 4 (ADVICE r7);
    a binary minus keeps normal precedence: 1 - 2 ^ 2 = -3."""
    r = one(pg, "SELECT -2 ^ 2 AS a, CAST(1 - 2 ^ 2 AS DOUBLE) AS b, "
                "(-3 ^ 2) AS c, 2 * -2 ^ 2 AS d")
    assert (r[0], r[1], r[2], r[3]) == (4.0, -3.0, 9.0, 8.0)


def test_operator_rewrites_skip_quoted_identifiers(pg):
    """`^` / vector ops inside pg double-quoted identifiers (rewritten to
    backticks) are column names, not operators (ADVICE r7)."""
    r = one(pg, 'SELECT t."a^b" AS v FROM (VALUES (7)) AS t("a^b")')
    assert r[0] == 7


def test_json_table_without_alias(pg):
    """pg17 allows alias-less JSON_TABLE: a following bare keyword must not
    be consumed as the alias (ADVICE r7)."""
    rows = pg.execute(
        "SELECT v FROM JSON_TABLE('[{\"v\": 1}, {\"v\": 5}]', '$[*]' "
        "COLUMNS (v int PATH '$.v')) WHERE v > 1").collect()
    assert [r.v for r in rows] == [5]


def test_pgvector_function_forms(pg):
    """pgvector's function spellings (vector_dims, l2_distance,
    inner_product, cosine_distance, l1_distance, l2_norm, l2_normalize,
    subvector) — same JVM-side algebra as the operators (VERDICT r7 #6)."""
    r = one(pg,
            "SELECT vector_dims('[1,2,3]'::vector) AS dims, "
            "l2_distance('[0,0]'::vector, '[3,4]'::vector) AS l2, "
            "inner_product('[1,2]'::vector, '[3,4]'::vector) AS ip, "
            "cosine_distance('[1,0]'::vector, '[0,1]'::vector) AS cd, "
            "l1_distance('[1,5]'::vector, '[4,1]'::vector) AS l1, "
            "l2_norm('[3,4]'::vector) AS nrm, "
            "l2_normalize('[3,4]'::vector) AS unitv, "
            "subvector('[10,20,30,40]'::vector, 2, 2) AS subv")
    assert (r[0], r[1], r[2], r[3], r[4], r[5]) == (3, 5.0, 11.0, 1.0, 7.0, 5.0)
    assert r[6] == [0.6, 0.8]
    assert r[7] == [20.0, 30.0]
    # inner_product is POSITIVE; the <#> operator is its negation
    r2 = one(pg, "SELECT inner_product('[1,2]'::vector, '[3,4]'::vector) "
                 "+ ('[1,2]'::vector <#> '[3,4]'::vector) AS z, "
                 "'[1,5]'::vector <+> '[4,1]'::vector AS l1op")
    assert r2[0] == 0.0
    assert r2[1] == 7.0  # pgvector 0.7 L1 operator == l1_distance
    # pgvector returns the ZERO vector unchanged (no NaN from 0/0 — ADVICE r8)
    r3 = one(pg, "SELECT l2_normalize('[0,0,0]'::vector) AS z")
    assert r3[0] == [0.0, 0.0, 0.0]


def test_pgvector_avg_group_by(pg):
    """avg(vector) over GROUP BY: element-wise mean (pgvector semantics),
    served by the analyzer-retry rewrite in PgSession."""
    rows = pg.execute(
        "SELECT g, avg(v) AS centroid FROM (VALUES "
        "(1, '[1,2]'::vector), (1, '[3,6]'::vector), "
        "(2, '[10,0]'::vector)) AS t(g, v) "
        "GROUP BY g ORDER BY g").collect()
    assert [(r.g, r.centroid) for r in rows] == [
        (1, [2.0, 4.0]), (2, [10.0, 0.0])]


def test_register_pg_catalog_memo_and_version_bump(spark, tmp_path):
    """register_pg_catalog skips the rebuild when (catalog id, version,
    inventory) is unchanged, and a catalog commit (version bump) forces the
    dynamic views to rebuild — new tables must be visible in pg_class
    immediately (r9 optimization: registration ran ~0.5-1.3 s of py4j view
    re-creation on every connection setup and after every DML)."""
    import time

    from bemidb_spark.pgcompat.catalog_views import register_pg_catalog
    from bemidb_spark.sources.catalog import Catalog
    from bemidb_spark.sources.writer import replace_table

    cat = Catalog(str(tmp_path / "memo_wh"))
    register_pg_catalog(spark, cat)
    # Structural proof of the no-op: overwrite a DYNAMIC emulation view with
    # a marker; an unchanged key must NOT rebuild it (memo hit), a version
    # bump must replace it.
    spark.sql("SELECT 'marker' AS schemaname").createOrReplaceTempView(
        "pg_matviews")
    register_pg_catalog(spark, cat)  # unchanged key: must be a no-op
    assert spark.table("pg_matviews").columns == ["schemaname"]

    replace_table(cat, "public", "memo_t",
                  spark.range(3).selectExpr("id AS k"))
    register_pg_catalog(spark, cat)  # version bumped: dynamic views rebuild
    assert spark.sql(
        "SELECT relname FROM pg_class WHERE relname = 'memo_t'"
    ).count() == 1
    assert "matviewname" in spark.table("pg_matviews").columns  # marker gone
    # static views survived the static-skip path
    assert spark.sql("SELECT count(*) FROM pg_am").collect()[0][0] == 1


def test_isolated_session_registers_pg_catalog_lazily(spark, sf_dir):
    """An isolated fork (the wire per-connection path) defers the ~0.7 s
    pg_catalog view replay off the connection handshake: data queries run
    without it, and the first statement that references the emulation
    surface registers on demand (r9 wave 4). Eager behavior is unchanged
    for shared sessions."""
    from bemidb_spark.tables import register_views

    register_views(spark, sf_dir)
    pg = PgSession(spark, None, isolate=True)
    # not registered at init: the fork has no pg emulation views yet
    assert not pg._pg_catalog_ready
    assert not pg.spark.catalog.tableExists("pg_keywords_view")
    # a plain data query runs without ever registering
    assert pg.execute("SELECT count(*) AS n FROM region").collect()[0].n == 5
    assert not pg._pg_catalog_ready
    # first catalog-surface statement triggers registration and resolves
    rows = pg.execute(
        "SELECT relname FROM pg_class WHERE relname = 'region'").collect()
    assert [r.relname for r in rows] == ["region"]
    assert pg._pg_catalog_ready

    # the analysis-retry safety net also triggers when the proactive regex
    # cannot see the reference (simulate: flag off, views dropped)
    pg2 = PgSession(spark, None, isolate=True)
    assert not pg2._pg_catalog_ready
    got = pg2.execute("SELECT count(*) AS n FROM pg_class").collect()
    assert got[0].n > 0 and pg2._pg_catalog_ready
