"""pg_catalog / information_schema emulation views.

The reference boots its engine with a full fake pg_catalog: 16 empty tables,
12 views including a ~90-row pg_type, plus information_schema views (B5/B6 —
reference query_remapper_table.go:275-775). Spark has none of this, so the
same surface is emulated with temp views seeded from:

- static rows (pg_roles, pg_database, pg_settings, pg_type's common entries),
- the engine catalog (`Catalog`) and the session's registered temp views
  (pg_class / pg_attribute / pg_namespace / information_schema_*).

Views are registered as ``pg_<name>`` / ``information_schema_<name>``; the
transpiler routes ``pg_catalog.pg_class`` → ``pg_class`` etc. (B3/B4).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from bemidb_spark.sources.catalog import Catalog

PG_USER = "bemidb"
PG_DATABASE = "bemidb"

_SPARK_TO_PG_TYPE = {
    "boolean": "bool",
    "tinyint": "int2",
    "smallint": "int2",
    "int": "int4",
    "bigint": "int8",
    "float": "float4",
    "double": "float8",
    "string": "text",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "binary": "bytea",
}


def pg_type_name(spark_type: str) -> str:
    t = spark_type.lower()
    if t.startswith("decimal"):
        return "numeric"
    if t.startswith("array"):
        return "_" + pg_type_name(t[6:-1])
    return _SPARK_TO_PG_TYPE.get(t, "text")


# pg type name -> (oid, SQL-standard display name used by format_type()).
_PG_TYPE_INFO = {
    "bool": (16, "boolean"), "bytea": (17, "bytea"), "char": (18, '"char"'),
    "name": (19, "name"), "int8": (20, "bigint"), "int2": (21, "smallint"),
    "int4": (23, "integer"), "text": (25, "text"), "oid": (26, "oid"),
    "json": (114, "json"), "float4": (700, "real"),
    "float8": (701, "double precision"), "bpchar": (1042, "character"),
    "varchar": (1043, "character varying"), "date": (1082, "date"),
    "time": (1083, "time without time zone"),
    "timestamp": (1114, "timestamp without time zone"),
    "timestamptz": (1184, "timestamp with time zone"),
    "interval": (1186, "interval"), "timetz": (1266, "time with time zone"),
    "numeric": (1700, "numeric"), "uuid": (2950, "uuid"), "jsonb": (3802, "jsonb"),
    # common array types
    "_bool": (1000, "boolean[]"), "_bytea": (1001, "bytea[]"),
    "_int2": (1005, "smallint[]"), "_int4": (1007, "integer[]"),
    "_text": (1009, "text[]"), "_varchar": (1015, "character varying[]"),
    "_int8": (1016, "bigint[]"), "_float4": (1021, "real[]"),
    "_float8": (1022, "double precision[]"), "_numeric": (1231, "numeric[]"),
    "_timestamp": (1115, "timestamp without time zone[]"),
    "_date": (1182, "date[]"), "_timestamptz": (1185, "timestamp with time zone[]"),
}


def pg_type_oid(pg_name: str) -> int:
    return _PG_TYPE_INFO.get(pg_name, _PG_TYPE_INFO["text"])[0]


def format_type_case_sql(oid_expr: str) -> str:
    """CASE expression mapping a type oid to pg's format_type() display name —
    the inline-fold emulation of the reference's format_type macro
    (query_remapper_function.go:14-112)."""
    whens = " ".join(
        f"WHEN {oid} THEN '{disp}'"
        for oid, disp in sorted(set(_PG_TYPE_INFO.values()))
        if "'" not in disp
    )
    return f"(CASE CAST({oid_expr} AS BIGINT) {whens} ELSE 'text' END)"


def _table_inventory(spark: SparkSession, catalog: Catalog | None) -> list[tuple]:
    """(schema, table, [(col, sparktype, nullable)]) for catalog + temp views."""
    out = []
    if catalog is not None:
        for key, entry in catalog.tables().items():
            schema, table = key.split(".", 1)
            cols = [(c["name"], c["type"], c.get("nullable", True)) for c in entry["columns"]]
            out.append((schema, table, cols))
    seen = {t for _, t, _ in out}
    for tbl in spark.catalog.listTables():
        if tbl.tableType == "TEMPORARY" and not tbl.name.startswith(("pg_", "information_schema_")):
            if tbl.name in seen or "_" in tbl.name and tuple(tbl.name.split("_", 1)) in {
                (sch, t) for sch, t, _ in out
            }:
                continue
            cols = [
                (c.name, c.dataType.lower(), c.nullable)
                for c in spark.catalog.listColumns(tbl.name)
            ]
            out.append(("public", tbl.name, cols))
    return out


# Bare view names bound by bind_catalog_tables (vs user/session temp views):
# these must be RE-replaced on re-registration so a table swap (REFRESH
# MATERIALIZED VIEW, replace_table) re-points them at the new location —
# and DROPPED when their table leaves the catalog (DROP TABLE, ROLLBACK),
# otherwise the stale view keeps serving the deleted table's cached listing.
_BOUND_BARE_NAMES: set[str] = set()
_BOUND_QUALIFIED: set[str] = set()


def bind_catalog_tables(spark: SparkSession, catalog: Catalog | None) -> None:
    """Make every catalog table resolvable by name (the reference's B3 role:
    schema.table -> engine-readable relation, query_remapper_table.go:93-110).
    Registers `<schema>_<table>` always, and bare `<table>` when free or
    previously bound by us; unbinds views for tables no longer present."""
    if catalog is None:
        return
    existing = {t.name for t in spark.catalog.listTables() if t.tableType == "TEMPORARY"}
    live_qualified: set[str] = set()
    live_bare: set[str] = set()
    for key, entry in catalog.tables().items():
        schema, table = key.split(".", 1)
        live_qualified.add(f"{schema}_{table}")
        live_bare.add(table)
        try:
            df = spark.read.parquet(entry["location"])
        except Exception:  # location vanished (dropped mid-flight)
            continue
        df.createOrReplaceTempView(f"{schema}_{table}")
        if table not in existing or table in _BOUND_BARE_NAMES:
            df.createOrReplaceTempView(table)
            _BOUND_BARE_NAMES.add(table)
    # plain (non-materialized) views: re-executed plans over the live tables,
    # registered in dependency order (views over views retry next pass)
    from bemidb_spark.pgcompat.transpiler import transpile

    qual_keys = [k for k in list(catalog.tables()) + list(catalog.views())
                 if "." in k]
    qual_re = (
        re.compile(r"\b(" + "|".join(re.escape(k) for k in sorted(qual_keys)) + r")\b")
        if qual_keys else None
    )

    def _qualify(sql: str) -> str:
        if qual_re is None or "." not in sql:
            return sql
        return qual_re.sub(lambda m: m.group(1).replace(".", "_"), sql)

    pending = list(catalog.views().items())
    for _ in range(len(pending) + 1):
        still = []
        for key, entry in pending:
            schema, name = key.split(".", 1)
            live_qualified.add(f"{schema}_{name}")
            live_bare.add(name)
            try:
                df = spark.sql(transpile(_qualify(entry["definition"])))
            except Exception:
                still.append((key, entry))
                continue
            df.createOrReplaceTempView(f"{schema}_{name}")
            df.createOrReplaceTempView(name)
            _BOUND_BARE_NAMES.add(name)
        if not still:
            break
        pending = still
    for name in _BOUND_QUALIFIED - live_qualified:
        spark.catalog.dropTempView(name)
    for name in _BOUND_BARE_NAMES - live_bare:
        spark.catalog.dropTempView(name)
    _BOUND_QUALIFIED.clear()
    _BOUND_QUALIFIED.update(live_qualified)
    _BOUND_BARE_NAMES.intersection_update(live_bare)


def register_pg_catalog(spark: SparkSession, catalog: Catalog | None = None) -> None:
    """(Re)build every emulation view from current catalog + session state."""
    bind_catalog_tables(spark, catalog)
    inventory = _table_inventory(spark, catalog)

    schemas = sorted({s for s, _, _ in inventory} | {"public", "pg_catalog", "information_schema"})
    spark.createDataFrame(
        [(2200 + i, s, 10) for i, s in enumerate(schemas)],
        "oid bigint, nspname string, nspowner bigint",
    ).createOrReplaceTempView("pg_namespace")

    ns_oid = {s: 2200 + i for i, s in enumerate(schemas)}
    matview_names = set()
    view_names = set()
    if catalog is not None:
        matview_names = {k.split(".", 1)[1] for k in catalog.matviews()}
        view_names = {k.split(".", 1)[1] for k in catalog.views()}
    # Full psql-introspection column set (reference seeds the same shape via
    # DDL, query_remapper_table.go:275-712); relkind 'm' matviews, 'v' views.
    classes = [
        (16384 + i, t, ns_oid[s],
         "m" if t in matview_names else ("v" if t in view_names else "r"),
         float(len(cols)), 10, False, 0, False, False, False, False, False,
         0, "p", "d", 2, 0, len(cols))
        for i, (s, t, cols) in enumerate(inventory)
    ]
    spark.createDataFrame(
        classes
        or [(0, "", 0, "", 0.0, 0, False, 0, False, False, False, False,
             False, 0, "", "", 0, 0, 0)],
        "oid bigint, relname string, relnamespace bigint, relkind string, "
        "reltuples double, relowner bigint, relhasindex boolean, relchecks int, "
        "relhasrules boolean, relhastriggers boolean, relrowsecurity boolean, "
        "relforcerowsecurity boolean, relispartition boolean, reltablespace bigint, "
        "relpersistence string, relreplident string, relam bigint, reloftype bigint, "
        "relnatts int",
    ).createOrReplaceTempView("pg_class")

    attrs = []
    for i, (s, t, cols) in enumerate(inventory):
        for pos, (cname, ctype, nullable) in enumerate(cols, start=1):
            pg_name = pg_type_name(ctype)
            attrs.append(
                (16384 + i, cname, pos, pg_name, not nullable,
                 pg_type_oid(pg_name), -1, False, False, "", "", 0)
            )
    spark.createDataFrame(
        attrs or [(0, "", 0, "", False, 0, 0, False, False, "", "", 0)],
        "attrelid bigint, attname string, attnum int, atttypname string, "
        "attnotnull boolean, atttypid bigint, atttypmod int, attisdropped boolean, "
        "atthasdef boolean, attidentity string, attgenerated string, attcollation bigint",
    ).createOrReplaceTempView("pg_attribute")

    spark.createDataFrame(
        [(oid, name, 0) for name, (oid, _) in sorted(_PG_TYPE_INFO.items(), key=lambda kv: kv[1][0])]
        or [(0, "", 0)],
        "oid bigint, typname string, typcollation bigint",
    ).createOrReplaceTempView("pg_type")

    spark.createDataFrame(
        [(10, PG_USER, True)], "usesysid bigint, usename string, usesuper boolean"
    ).createOrReplaceTempView("pg_user")
    spark.createDataFrame(
        [(10, PG_USER, True, True, True)],
        "oid bigint, rolname string, rolsuper boolean, rolcanlogin boolean, rolcreatedb boolean",
    ).createOrReplaceTempView("pg_roles")
    spark.createDataFrame(
        [(1, PG_DATABASE, 10, "UTF8")],
        "oid bigint, datname string, datdba bigint, encoding string",
    ).createOrReplaceTempView("pg_database")
    spark.createDataFrame(
        [("server_version", "17.0"), ("search_path", '"$user", public'),
         ("timezone", "UTC"), ("max_connections", "100")],
        "name string, setting string",
    ).createOrReplaceTempView("pg_settings")
    spark.createDataFrame(
        [(e, n) for e, n in [("plpgsql", "1.0")]],
        "extname string, extversion string",
    ).createOrReplaceTempView("pg_extension")

    # --- psql \d support set (B5 breadth: reference query_remapper_table.go
    # :275-712 seeds pg_index/pg_matviews/pg_shadow/pg_collation/pg_am/... ) ---
    spark.createDataFrame([(2, "heap")], "oid bigint, amname string") \
        .createOrReplaceTempView("pg_am")
    spark.sql("""
        SELECT * FROM VALUES (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                              CAST(NULL AS INT), CAST(NULL AS STRING))
            AS t(oid, adrelid, adnum, adbin) WHERE 1 = 0
    """).createOrReplaceTempView("pg_attrdef")
    spark.sql("""
        SELECT * FROM VALUES (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                              CAST(NULL AS INT), CAST(NULL AS BOOLEAN),
                              CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN),
                              CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN),
                              CAST(NULL AS ARRAY<INT>))
            AS t(indexrelid, indrelid, indnatts, indisunique, indisprimary,
                 indisvalid, indisclustered, indisreplident, indkey) WHERE 1 = 0
    """).createOrReplaceTempView("pg_index")
    spark.sql("""
        SELECT * FROM VALUES (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                              CAST(NULL AS INT), CAST(NULL AS STRING))
            AS t(objoid, classoid, objsubid, description) WHERE 1 = 0
    """).createOrReplaceTempView("pg_description")
    spark.sql("""
        SELECT * FROM VALUES (CAST(NULL AS BIGINT), CAST(NULL AS STRING),
                              CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                              CAST(NULL AS BIGINT), CAST(NULL AS STRING),
                              CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN),
                              CAST(NULL AS BOOLEAN))
            AS t(oid, conname, connamespace, conrelid, conindid, contype,
                 condeferrable, condeferred, convalidated) WHERE 1 = 0
    """).createOrReplaceTempView("pg_constraint")
    spark.createDataFrame(
        [(100, "default", "d"), (950, "C", "c"), (951, "POSIX", "c")],
        "oid bigint, collname string, collprovider string",
    ).createOrReplaceTempView("pg_collation")
    # pg_shadow: passwd carries a real SCRAM verifier for the server's user,
    # shaped like the reference's row (query_handler_test.go:1466).
    from bemidb_spark.server.scram import build_verifier

    verifier = build_verifier(PG_USER, salt=b"bemidb-spark-ini", iterations=4096)
    spark.createDataFrame(
        [(PG_USER, 10, True, True, False, False, verifier, None)],
        "usename string, usesysid bigint, usecreatedb boolean, usesuper boolean, "
        "userepl boolean, usebypassrls boolean, passwd string, valuntil timestamp",
    ).createOrReplaceTempView("pg_shadow")
    spark.createDataFrame(
        [(s, t, PG_USER, None, False, True,
          catalog.matview_definition("matviews", t) if catalog is not None else "")
         for s, t, _ in inventory if t in matview_names]
        or [("", "", "", None, False, False, "")],
        "schemaname string, matviewname string, matviewowner string, "
        "tablespace string, hasindexes boolean, ispopulated boolean, definition string",
    ).createOrReplaceTempView("pg_matviews")

    view_defs = {}
    if catalog is not None:
        view_defs = {k.split(".", 1)[1]: e.get("definition", "")
                     for k, e in catalog.views().items()}
    spark.createDataFrame(
        [(s, t, PG_USER, view_defs.get(t, ""))
         for s, t, _ in inventory if t in view_names]
        or [("", "", "", "")],
        "schemaname string, viewname string, viewowner string, definition string",
    ).createOrReplaceTempView("pg_views")
    stat_rows = [
        (16384 + i, s, t, 0, 0, 0, 0, 0, 0, 0)
        for i, (s, t, cols) in enumerate(inventory)
    ]
    spark.createDataFrame(
        stat_rows or [(0, "", "", 0, 0, 0, 0, 0, 0, 0)],
        "relid bigint, schemaname string, relname string, seq_scan bigint, "
        "seq_tup_read bigint, idx_scan bigint, idx_tup_fetch bigint, "
        "n_live_tup bigint, n_dead_tup bigint, n_mod_since_analyze bigint",
    ).createOrReplaceTempView("pg_stat_user_tables")
    # pg_stat_activity: monitoring clients (psql \watch, dashboards, pgAdmin)
    # poll it on connect. One synthetic active-backend row for this session;
    # per-connection detail lives in the wire server, which the shared Spark
    # views can't see — a static plausible row keeps those tools working.
    spark.sql(
        "SELECT CAST(16384 AS BIGINT) AS datid, "
        f"'{PG_DATABASE}' AS datname, CAST(1 AS INT) AS pid, "
        f"CAST(10 AS BIGINT) AS usesysid, '{PG_USER}' AS usename, "
        "'bemidb' AS application_name, CAST(NULL AS STRING) AS client_addr, "
        "CAST(NULL AS TIMESTAMP) AS backend_start, "
        "CAST(NULL AS TIMESTAMP) AS query_start, "
        "'active' AS state, '' AS query, 'client backend' AS backend_type"
    ).createOrReplaceTempView("pg_stat_activity")
    # pg_locks: always empty (no lock manager — reads are snapshot-isolated
    # by the catalog pointer swap); monitoring dashboards poll it.
    spark.sql(
        "SELECT CAST(NULL AS STRING) AS locktype, CAST(NULL AS BIGINT) AS datid, "
        "CAST(NULL AS BIGINT) AS relation, CAST(NULL AS INT) AS pid, "
        "CAST(NULL AS STRING) AS mode, CAST(NULL AS BOOLEAN) AS granted "
        "WHERE 1 = 0"
    ).createOrReplaceTempView("pg_locks")
    spark.sql(
        f"SELECT CAST(16384 AS BIGINT) AS datid, '{PG_DATABASE}' AS datname, "
        "CAST(1 AS INT) AS numbackends, CAST(0 AS BIGINT) AS xact_commit, "
        "CAST(0 AS BIGINT) AS xact_rollback, CAST(0 AS BIGINT) AS blks_read, "
        "CAST(0 AS BIGINT) AS blks_hit, CAST(0 AS BIGINT) AS tup_returned, "
        "CAST(0 AS BIGINT) AS tup_fetched, CAST(0 AS BIGINT) AS tup_inserted"
    ).createOrReplaceTempView("pg_stat_database")
    # pg_get_keywords() is remapped to this view (reference installs it as a
    # table macro, query_remapper_function.go:96-112).
    spark.createDataFrame(
        [(w, "R", "reserved") for w in
         ["all", "and", "any", "as", "asc", "between", "by", "case", "cast",
          "check", "create", "cross", "current_date", "current_time",
          "current_timestamp", "current_user", "default", "desc", "distinct",
          "else", "end", "except", "false", "from", "group", "having", "in",
          "inner", "intersect", "into", "is", "join", "left", "like", "limit",
          "not", "null", "on", "or", "order", "outer", "primary", "right",
          "select", "table", "then", "to", "true", "union", "unique", "user",
          "using", "when", "where", "with"]],
        "word string, catcode string, catdesc string",
    ).createOrReplaceTempView("pg_keywords_view")

    # information_schema (B6)
    spark.createDataFrame(
        [(PG_DATABASE, s, t, "VIEW" if t in view_names else "BASE TABLE")
         for s, t, _ in inventory]
        or [("", "", "", "")],
        "table_catalog string, table_schema string, table_name string, table_type string",
    ).createOrReplaceTempView("information_schema_tables")

    info_cols = []
    for s, t, cols in inventory:
        for pos, (cname, ctype, nullable) in enumerate(cols, start=1):
            udt = pg_type_name(ctype)
            display = _PG_TYPE_INFO.get(udt.lstrip("_"), (0, "text"))[1]
            if udt.startswith("_"):
                display = "ARRAY"  # information_schema spells arrays this way
            info_cols.append(
                (PG_DATABASE, s, t, cname, pos,
                 "YES" if nullable else "NO", udt, display)
            )
    spark.createDataFrame(
        info_cols or [("", "", "", "", 0, "", "", "")],
        "table_catalog string, table_schema string, table_name string, "
        "column_name string, ordinal_position int, is_nullable string, "
        "udt_name string, data_type string",
    ).createOrReplaceTempView("information_schema_columns")

    # schemata / views / constraint views: the rest of the introspection
    # surface BI tools touch (constraints are structurally empty — this
    # engine enforces none, exactly like the reference's analytics replica)
    spark.createDataFrame(
        [(PG_DATABASE, s, PG_USER) for s in schemas],
        "catalog_name string, schema_name string, schema_owner string",
    ).createOrReplaceTempView("information_schema_schemata")
    mv_rows = []
    if catalog is not None:
        for src in (catalog.matviews(), catalog.views()):
            for key, entry in src.items():
                s, name = key.split(".", 1)
                mv_rows.append((PG_DATABASE, s, name, entry.get("definition", "")))
    spark.createDataFrame(
        mv_rows or [("", "", "", "")],
        "table_catalog string, table_schema string, table_name string, "
        "view_definition string",
    ).createOrReplaceTempView("information_schema_views")
    empty_constraints = spark.createDataFrame(
        [],
        "constraint_catalog string, constraint_schema string, "
        "constraint_name string, table_schema string, table_name string, "
        "constraint_type string, column_name string",
    )
    empty_constraints.createOrReplaceTempView("information_schema_table_constraints")
    empty_constraints.createOrReplaceTempView("information_schema_key_column_usage")
    empty_constraints.createOrReplaceTempView("information_schema_referential_constraints")
