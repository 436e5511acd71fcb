"""Golden tests: the literal introspection SQL psql sends for \\dt and \\d.

The reference supports psql by seeding a full fake pg_catalog and macro set
(reference query_remapper_table.go:275-712, query_remapper_function.go:14-112);
these queries are the actual statements psql 16 emits (captured via psql -E),
driven through the PgSession router end-to-end.
"""

from __future__ import annotations

import pytest

from bemidb_spark.pgcompat.session import PgSession
from bemidb_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def pg(spark, sf_dir, tmp_path_factory):
    from bemidb_spark.tables import register_views

    register_views(spark, sf_dir)
    catalog = Catalog(str(tmp_path_factory.mktemp("psqlwh")))
    session = PgSession(spark, catalog)
    session.execute(
        "CREATE MATERIALIZED VIEW region_names AS SELECT r_name FROM region"
    )
    return session


# --- \dt --------------------------------------------------------------------
_PSQL_DT = """SELECT n.nspname as "Schema",
  c.relname as "Name",
  CASE c.relkind WHEN 'r' THEN 'table' WHEN 'v' THEN 'view' WHEN 'm' THEN 'materialized view' WHEN 'i' THEN 'index' WHEN 'S' THEN 'sequence' WHEN 't' THEN 'TOAST table' WHEN 'f' THEN 'foreign table' WHEN 'p' THEN 'partitioned table' WHEN 'I' THEN 'partitioned index' END as "Type",
  pg_catalog.pg_get_userbyid(c.relowner) as "Owner"
FROM pg_catalog.pg_class c
     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
WHERE c.relkind IN ('r','p','')
      AND n.nspname <> 'pg_catalog'
      AND n.nspname !~ '^pg_toast'
      AND n.nspname <> 'information_schema'
  AND pg_catalog.pg_table_is_visible(c.oid)
ORDER BY 1,2"""


def test_psql_dt_lists_tables(pg):
    rows = [tuple(r) for r in pg.execute(_PSQL_DT).collect()]
    names = {r[1] for r in rows}
    assert {"region", "nation", "customer", "orders", "lineitem"} <= names
    assert all(r[2] == "table" and r[3] == "bemidb" for r in rows)


def test_psql_dm_lists_matviews(pg):
    dm = _PSQL_DT.replace("c.relkind IN ('r','p','')", "c.relkind IN ('m','')")
    rows = [tuple(r) for r in pg.execute(dm).collect()]
    assert ("matviews", "region_names", "materialized view", "bemidb") in rows


# --- \d region: the 4-query sequence ---------------------------------------
_PSQL_OID_LOOKUP = """SELECT c.oid,
  n.nspname,
  c.relname
FROM pg_catalog.pg_class c
     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
WHERE c.relname OPERATOR(pg_catalog.~) '^(region)$' COLLATE pg_catalog.default
  AND pg_catalog.pg_table_is_visible(c.oid)
ORDER BY 2, 3"""


def _region_oid(pg) -> int:
    rows = pg.execute(_PSQL_OID_LOOKUP).collect()
    assert len(rows) == 1 and rows[0][2] == "region"
    return rows[0][0]


def test_psql_d_oid_lookup(pg):
    assert _region_oid(pg) > 16000


def test_psql_d_class_details(pg):
    oid = _region_oid(pg)
    q = f"""SELECT c.relchecks, c.relkind, c.relhasindex, c.relhasrules, c.relhastriggers, c.relrowsecurity, c.relforcerowsecurity, false AS relhasoids, c.relispartition, '', c.reltablespace, CASE WHEN c.reloftype = 0 THEN '' ELSE c.reloftype::pg_catalog.regtype::pg_catalog.text END, c.relpersistence, c.relreplident, am.amname
FROM pg_catalog.pg_class c
 LEFT JOIN pg_catalog.pg_am am ON (c.relam = am.oid)
WHERE c.oid = '{oid}'"""
    rows = [tuple(r) for r in pg.execute(q).collect()]
    assert len(rows) == 1
    r = rows[0]
    assert r[1] == "r" and r[12] == "p" and r[14] == "heap"


def test_psql_d_columns(pg):
    oid = _region_oid(pg)
    q = f"""SELECT a.attname,
  pg_catalog.format_type(a.atttypid, a.atttypmod),
  (SELECT pg_catalog.pg_get_expr(d.adbin, d.adrelid, true)
   FROM pg_catalog.pg_attrdef d
   WHERE d.adrelid = a.attrelid AND d.adnum = a.attnum AND a.atthasdef),
  a.attnotnull,
  (SELECT c.collname FROM pg_catalog.pg_collation c, pg_catalog.pg_type t
   WHERE c.oid = a.attcollation AND t.oid = a.atttypid AND a.attcollation <> t.typcollation) AS attcollation,
  a.attidentity,
  a.attgenerated
FROM pg_catalog.pg_attribute a
WHERE a.attrelid = '{oid}' AND a.attnum > 0 AND NOT a.attisdropped
ORDER BY a.attnum"""
    rows = [tuple(r) for r in pg.execute(q).collect()]
    assert [r[0] for r in rows] == ["r_regionkey", "r_name"]
    assert rows[0][1] in ("integer", "bigint")
    assert rows[1][1] == "text"


def test_psql_d_indexes(pg):
    oid = _region_oid(pg)
    q = f"""SELECT c2.relname, i.indisprimary, i.indisunique, i.indisclustered, i.indisvalid, pg_catalog.pg_get_indexdef(i.indexrelid, 0, true),
  pg_catalog.pg_get_constraintdef(con.oid, true), contype, condeferrable, condeferred, i.indisreplident, c2.reltablespace
FROM pg_catalog.pg_class c, pg_catalog.pg_class c2, pg_catalog.pg_index i
  LEFT JOIN pg_catalog.pg_constraint con ON (conrelid = i.indrelid AND conindid = i.indexrelid AND contype IN ('p','u','x'))
WHERE c.oid = '{oid}' AND c.oid = i.indrelid AND i.indexrelid = c2.oid
ORDER BY i.indisprimary DESC, c2.relname"""
    assert pg.execute(q).collect() == []  # no indexes, but the query parses


# --- breadth views ----------------------------------------------------------
def test_pg_shadow_scram_verifier(pg):
    rows = [tuple(r) for r in pg.execute(
        "SELECT usename, passwd FROM pg_catalog.pg_shadow"
    ).collect()]
    assert len(rows) == 1 and rows[0][0] == "bemidb"
    assert rows[0][1].startswith("SCRAM-SHA-256$4096:")


def test_pg_matviews_definition(pg):
    rows = [tuple(r) for r in pg.execute(
        "SELECT matviewname, ispopulated, definition FROM pg_matviews"
    ).collect()]
    assert any(r[0] == "region_names" and r[1] and "r_name" in r[2] for r in rows)


def test_pg_stat_user_tables(pg):
    rows = pg.execute(
        "SELECT relname, n_live_tup FROM pg_stat_user_tables WHERE relname = 'region'"
    ).collect()
    assert len(rows) == 1


def test_pg_collation_rows(pg):
    rows = [r[0] for r in pg.execute(
        "SELECT collname FROM pg_catalog.pg_collation ORDER BY oid"
    ).collect()]
    # the reference ships exactly one default-collation row
    # (query_remapper_table.go:305)
    assert rows == ["default"]


# --- macro emulation --------------------------------------------------------
def test_quote_ident(pg):
    rows = pg.execute(
        "SELECT quote_ident('simple') AS a, quote_ident('Needs Quoting') AS b, "
        "quote_ident('has\"quote') AS c"
    ).collect()
    assert tuple(rows[0]) == ("simple", '"Needs Quoting"', '"has""quote"')


def test_quote_ident_quotes_reserved_keywords(pg):
    """pg quotes any non-unreserved keyword regardless of case shape
    (ruleutils.c quote_identifier); unreserved keywords stay bare."""
    rows = pg.execute(
        "SELECT quote_ident('select') AS a, quote_ident('table') AS b, "
        "quote_ident('int') AS c, quote_ident('ilike') AS d, "
        "quote_ident('abort') AS e, quote_ident('version') AS f"
    ).collect()
    # select=reserved, table=reserved, int=col_name, ilike=type_func_name
    # -> quoted; abort/version are unreserved/non-keywords -> bare
    assert tuple(rows[0]) == (
        '"select"', '"table"', '"int"', '"ilike"', "abort", "version")


def test_pg_get_keywords(pg):
    rows = pg.execute(
        "SELECT word FROM pg_get_keywords() WHERE word = 'select'"
    ).collect()
    assert len(rows) == 1


def test_pg_show_all_settings(pg):
    rows = {r[0]: r[1] for r in pg.execute(
        "SELECT name, setting FROM pg_show_all_settings()"
    ).collect()}
    assert rows["server_version"] == "17.0"
    assert "search_path" in rows


def test_pg_expandarray(pg):
    rows = [tuple(r) for r in pg.execute(
        "SELECT x, n FROM information_schema._pg_expandarray(array(10, 20, 30))"
    ).collect()]
    assert rows == [(10, 1), (20, 2), (30, 3)]


def test_aclexplode_empty(pg):
    assert pg.execute(
        "SELECT grantee, privilege_type FROM aclexplode(null) a"
    ).collect() == []


def test_relation_size_functions(pg):
    rows = pg.execute(
        "SELECT pg_total_relation_size('region') AS sz, "
        "pg_size_pretty(pg_relation_size('region')) AS pretty"
    ).collect()
    assert tuple(rows[0]) == (0, "0 bytes")


def test_psql_dv_lists_plain_views(pg):
    """The literal SQL psql 16 sends for \\dv, driven end-to-end."""
    pg.execute("CREATE TABLE dv_base (id bigint)")
    pg.execute("CREATE VIEW dv_view AS SELECT id FROM public.dv_base")
    rows = pg.execute("""SELECT n.nspname as "Schema",
  c.relname as "Name",
  CASE c.relkind WHEN 'r' THEN 'table' WHEN 'v' THEN 'view' WHEN 'm' THEN 'materialized view' WHEN 'i' THEN 'index' WHEN 'S' THEN 'sequence' END as "Type",
  pg_catalog.pg_get_userbyid(c.relowner) as "Owner"
FROM pg_catalog.pg_class c
     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
WHERE c.relkind IN ('v','')
      AND n.nspname <> 'pg_catalog'
      AND n.nspname !~ '^pg_toast'
  AND pg_catalog.pg_table_is_visible(c.oid)
ORDER BY 1,2""").collect()
    assert ("public", "dv_view", "view", "bemidb") in [tuple(r) for r in rows]
    assert all(r[2] == "view" for r in rows)
    pg.execute("DROP VIEW dv_view")
    pg.execute("DROP TABLE dv_base")


def test_psql_df_runs_clean(pg):
    """The literal SQL psql 16 sends for \\df: no user-defined functions
    exist (the reference's function surface is boot macros only, never
    exposed through pg_proc — B7), so the result is empty, not an error."""
    rows = pg.execute(r"""SELECT n.nspname as "Schema",
  p.proname as "Name",
  pg_catalog.pg_get_function_result(p.oid) as "Result data type",
  pg_catalog.pg_get_function_arguments(p.oid) as "Argument data types",
 CASE p.prokind
  WHEN 'a' THEN 'agg'
  WHEN 'w' THEN 'window'
  WHEN 'p' THEN 'proc'
  ELSE 'func'
 END as "Type"
FROM pg_catalog.pg_proc p
     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = p.pronamespace
WHERE pg_catalog.pg_function_is_visible(p.oid)
      AND n.nspname <> 'pg_catalog'
      AND n.nspname <> 'information_schema'
ORDER BY 1, 2, 4""").collect()
    assert rows == []


def test_psql_d_reflects_schema_evolution(pg):
    """After ALTER TABLE ADD/RENAME/DROP COLUMN, psql's \\d attribute query
    (the literal pg_attribute SQL above) reports the EVOLVED shape —
    VERDICT r6 #6's done-criterion for the schema-evolution route."""
    pg.execute("CREATE TABLE evo (id bigint, old_name text, gone int)")
    pg.execute("ALTER TABLE evo ADD COLUMN score double precision DEFAULT 1.5")
    pg.execute("ALTER TABLE evo RENAME COLUMN old_name TO label")
    pg.execute("ALTER TABLE evo DROP COLUMN gone")
    oid = pg.execute(
        "SELECT c.oid FROM pg_catalog.pg_class c WHERE c.relname = 'evo'"
    ).collect()[0].oid
    q = f"""SELECT a.attname, pg_catalog.format_type(a.atttypid, a.atttypmod)
FROM pg_catalog.pg_attribute a
WHERE a.attrelid = '{oid}' AND a.attnum > 0 AND NOT a.attisdropped
ORDER BY a.attnum"""
    rows = [tuple(r) for r in pg.execute(q).collect()]
    assert [r[0] for r in rows] == ["id", "label", "score"]
    assert rows[0][1] == "bigint" and rows[2][1] == "double precision"


def test_pgvector_client_bootstrap(pg):
    """The probes pgvector client libraries run at connect: the type oid
    lookup (codec registration) and the extension presence check — plus
    CREATE EXTENSION as an accepted no-op (the operator surface is built
    in)."""
    oid = pg.execute(
        "SELECT oid FROM pg_type WHERE typname = 'vector'").collect()
    assert len(oid) == 1 and oid[0].oid == 16700
    ext = pg.execute(
        "SELECT extversion FROM pg_extension WHERE extname = 'vector'"
    ).collect()
    assert len(ext) == 1
    assert pg.execute("CREATE EXTENSION IF NOT EXISTS vector"
                      )._pg_tag == "CREATE EXTENSION"


def test_psql_d_vector_typmod(pg):
    """\\d on a table with a vector(3) column echoes the typmod through
    format_type(atttypid, atttypmod) — pgvector stores the dim count as the
    atttypmod (VERDICT r7 #6)."""
    pg.execute("CREATE TABLE vecd (id bigint, emb vector(3), raw vector)")
    oid = pg.execute(
        "SELECT c.oid FROM pg_catalog.pg_class c WHERE c.relname = 'vecd'"
    ).collect()[0].oid
    q = f"""SELECT a.attname, pg_catalog.format_type(a.atttypid, a.atttypmod)
FROM pg_catalog.pg_attribute a
WHERE a.attrelid = '{oid}' AND a.attnum > 0 AND NOT a.attisdropped
ORDER BY a.attnum"""
    rows = [tuple(r) for r in pg.execute(q).collect()]
    assert rows == [("id", "bigint"), ("emb", "vector(3)"), ("raw", "vector")]
