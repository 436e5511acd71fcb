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

import os
import re

from pyspark.sql import SparkSession

from bemidb_spark.sources.catalog import Catalog

# The reference reads both from config/env (config.go:61); tests there run
# with user "user". Overridable so a deployment (or the parity harness)
# matches its source cluster's identity.
PG_USER = os.environ.get("BEMIDB_SPARK_USER", "bemidb")
PG_DATABASE = os.environ.get("BEMIDB_SPARK_DATABASE", "bemidb")

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


# logical source-type tags → the udt_name introspection reports for the
# stored column (matches the reference's stored-type reporting for types it
# widens: time/timetz → time µs-long, json/jsonb → json string,
# pg_schema_column.go:49-99)
_TAG_UDT = {
    "time": "time", "timetz": "time", "json": "json", "jsonb": "json",
    "_json": "_json", "_jsonb": "_json",
}


def _udt_name(spark_type: str, pg_tag: str | None) -> str:
    if pg_tag:
        if pg_tag.startswith("vector"):
            return "vector"
        mapped = _TAG_UDT.get(pg_tag)
        if mapped:
            return mapped
    return pg_type_name(spark_type)


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
    # pgvector's type (extension oids are installation-assigned; a fixed
    # >16384 oid here, like our table oids). pgvector client libraries
    # probe `SELECT oid FROM pg_type WHERE typname = 'vector'` to register
    # their codec — serving the row makes them bind; storage is _float8.
    "vector": (16700, "vector"),
}


def pg_type_oid(pg_name: str) -> int:
    return _PG_TYPE_INFO.get(pg_name, _PG_TYPE_INFO["text"])[0]


# Always-empty pg_catalog tables, column-for-column with the reference's boot
# DDL (query_remapper_table.go:275-293) so any client introspection query
# against them returns zero rows instead of erroring.
_EMPTY_TABLES: dict[str, str] = {
    "pg_inherits": "inhrelid bigint, inhparent bigint, inhseqno int, inhdetachpending boolean",
    "pg_shdescription": "objoid bigint, classoid bigint, description string",
    "pg_statio_user_tables": (
        "relid bigint, schemaname string, relname string, heap_blks_read bigint, "
        "heap_blks_hit bigint, idx_blks_read bigint, idx_blks_hit bigint, "
        "toast_blks_read bigint, toast_blks_hit bigint, tidx_blks_read bigint, "
        "tidx_blks_hit bigint"
    ),
    "pg_replication_slots": (
        "slot_name string, plugin string, slot_type string, datoid bigint, "
        "database string, temporary boolean, active boolean, active_pid int, "
        "xmin bigint, catalog_xmin bigint, restart_lsn string, "
        "confirmed_flush_lsn string, wal_status string, safe_wal_size bigint, "
        "two_phase boolean, conflicting boolean"
    ),
    "pg_stat_gssapi": (
        "pid int, gss_authenticated boolean, principal string, "
        "encrypted boolean, credentials_delegated boolean"
    ),
    "pg_auth_members": (
        "oid string, roleid bigint, member bigint, grantor bigint, "
        "admin_option boolean, inherit_option boolean, set_option boolean"
    ),
    "pg_opclass": (
        "oid bigint, opcmethod bigint, opcname string, opcnamespace bigint, "
        "opcowner bigint, opcfamily bigint, opcintype bigint, "
        "opcdefault boolean, opckeytype bigint"
    ),
    "pg_policy": (
        "oid bigint, polname string, polrelid bigint, polcmd string, "
        "polpermissive boolean, polroles bigint, polqual string, polwithcheck string"
    ),
    "pg_statistic_ext": (
        "oid bigint, stxrelid bigint, stxname string, stxnamespace bigint, "
        "stxowner bigint, stxstattarget int, stxkeys bigint, stxkind string, "
        "stxexprs string"
    ),
    "pg_publication": (
        "oid bigint, pubname string, pubowner bigint, puballtables boolean, "
        "pubinsert boolean, pubupdate boolean, pubdelete boolean, "
        "pubtruncate boolean, pubviaroot boolean"
    ),
    "pg_publication_rel": (
        # prattrs is an int2vector in pg — typed as an array so clients'
        # `prattrs::int2[]` casts and element access analyze cleanly
        "oid bigint, prpubid bigint, prrelid bigint, prqual string, "
        "prattrs array<smallint>"
    ),
    "pg_publication_namespace": "oid bigint, pnpubid bigint, pnnspid bigint",
    "pg_rewrite": (
        "oid bigint, rulename string, ev_class bigint, ev_type string, "
        "ev_enabled string, is_instead boolean, ev_qual string, ev_action string"
    ),
    "pg_enum": "oid bigint, enumtypid bigint, enumsortorder float, enumlabel string",
}


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
    """(schema, table, [(col, sparktype, nullable, pg_tag)]) for catalog +
    temp views. pg_tag is the logical source-type tag (time/json/interval/…)
    the write path records, or None."""
    out = []
    if catalog is not None:
        for key, entry in catalog.tables().items():
            schema, table = key.split(".", 1)
            cols = [(c["name"], c["type"], c.get("nullable", True), c.get("pg"))
                    for c in entry["columns"]]
            out.append((schema, table, cols))
    seen = {t for _, t, _ in out}
    # SHOW VIEWS (single command) instead of catalog.listTables (which
    # fetches full metadata per table) — this runs on every connection setup
    for tbl in spark.sql("SHOW VIEWS").collect():
        name = tbl.viewName
        if name == "user":  # emulation view (`SELECT * FROM user`), not a table
            continue
        if tbl.isTemporary and not name.startswith(("pg_", "information_schema_")):
            if name in seen or "_" in name and tuple(name.split("_", 1)) in {
                (sch, t) for sch, t, _ in out
            }:
                continue
            try:
                fields = spark.table(name).schema.fields
            except Exception:  # noqa: BLE001 — view over a dropped relation
                continue
            cols = [
                (f.name, f.dataType.simpleString(), f.nullable,
                 f.metadata.get("pg_type"))
                for f in fields
            ]
            out.append(("public", name, cols))
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
    existing = {
        t.viewName for t in spark.sql("SHOW VIEWS").collect() if t.isTemporary
    }
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


# Every session-independent emulation view _register_emulation_views
# creates, by name (bind_catalog_tables' data views are NOT here — their
# bind/unbind semantics are per-session). Used to capture analyzed plans
# for the fast re-registration path; test_pgcompat's
# test_pg_catalog_fast_registration_matches_slow guards against drift.
_STATIC_VIEW_NAMES = [
    "pg_namespace", "pg_class", "pg_attribute", "pg_type", "pg_user",
    "pg_roles", "pg_database", "pg_settings", "pg_extension", "user",
    "pg_proc", "pg_tablespace", "pg_am", "pg_attrdef", "pg_index",
    "pg_description", "pg_constraint", "pg_collation", "pg_shadow",
    "pg_matviews", "pg_views", "pg_stat_user_tables", "pg_stat_activity",
    "pg_locks", "pg_stat_database", "pg_keywords_view",
    "information_schema_tables", "information_schema_columns",
    "information_schema_schemata", "information_schema_views",
    "information_schema_table_constraints",
    "information_schema_key_column_usage",
    "information_schema_referential_constraints",
] + list(_EMPTY_TABLES)

# (key, {view name -> analyzed logical plan}). The emulation views are fully
# determined by (catalog identity+version, table inventory), so their
# ANALYZED plans — all rooted in LocalRelations — are session-portable:
# re-registering ~45 views in a fresh per-connection SparkSession drops from
# ~1.4 s of parse/analysis to ~0.1 s of plan wrapping. This is the dominant
# term of wire-connection setup (PgSession isolate=True). Stored as ONE
# (key, plans) tuple so concurrent connection threads read an atomic
# snapshot (no lock needed: replacement is a single assignment).
_PLAN_CACHE: list = [None]  # [(key, {name: plan})] or [None]


def register_pg_catalog(spark: SparkSession, catalog: Catalog | None = None) -> None:
    """(Re)build every emulation view from current catalog + session state."""
    bind_catalog_tables(spark, catalog)
    inventory = _table_inventory(spark, catalog)
    key = (
        id(catalog),
        catalog.version() if catalog is not None else -1,
        tuple((s, t, tuple(map(tuple, cols))) for s, t, cols in inventory),
    )
    snapshot = _PLAN_CACHE[0]
    if snapshot is not None and snapshot[0] == key:
        try:
            jspark = spark._jsparkSession
            ofrows = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows
            for name, plan in snapshot[1].items():
                ofrows(jspark, plan).createOrReplaceTempView(name)
            return
        except Exception:  # noqa: BLE001 — internal API drift: rebuild fully
            pass
    _register_emulation_views(spark, catalog, inventory)
    try:
        plans = {
            name: spark.table(name)._jdf.queryExecution().analyzed()
            for name in _STATIC_VIEW_NAMES
        }
        _PLAN_CACHE[0] = (key, plans)
    except Exception:  # noqa: BLE001 — capture failure only disables the cache
        _PLAN_CACHE[0] = None


def _register_emulation_views(
    spark: SparkSession, catalog: Catalog | None, inventory: list[tuple]
) -> None:
    """Build every emulation view from the given inventory (slow path)."""
    # pg_namespace lists only user-visible schemas — the reference filters its
    # engine's system schemas the same way (query_remapper_table.go:309-310),
    # and psql's own \d queries exclude pg_catalog/information_schema by name
    # anyway, so hiding them here matches both pg tooling and the reference.
    schemas = sorted({s for s, _, _ in inventory} | {"public"})
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
        classes,
        "oid bigint, relname string, relnamespace bigint, relkind string, "
        "reltuples double, relowner bigint, relhasindex boolean, relchecks int, "
        "relhasrules boolean, relhastriggers boolean, relrowsecurity boolean, "
        "relforcerowsecurity boolean, relispartition boolean, reltablespace bigint, "
        "relpersistence string, relreplident string, relam bigint, reloftype bigint, "
        "relnatts int",
    ).createOrReplaceTempView("pg_class")

    attrs = []
    for i, (s, t, cols) in enumerate(inventory):
        for pos, (cname, ctype, nullable, pg_tag) in enumerate(cols, start=1):
            if pg_tag and pg_tag.startswith("vector"):
                # pgvector: atttypmod IS the dim count (vector(n) echoes in
                # \d via format_type(atttypid, atttypmod))
                tm = re.match(r"vector\((\d+)\)", pg_tag)
                pg_name = "vector"
                typmod = int(tm.group(1)) if tm else -1
            else:
                pg_name = pg_type_name(ctype)
                typmod = -1
            attrs.append(
                (16384 + i, cname, pos, pg_name, not nullable,
                 pg_type_oid(pg_name), typmod, False, False, "", "", 0)
            )
    spark.createDataFrame(
        attrs,
        "attrelid bigint, attname string, attnum int, atttypname string, "
        "attnotnull boolean, atttypid bigint, atttypmod int, attisdropped boolean, "
        "atthasdef boolean, attidentity string, attgenerated string, attcollation bigint",
    ).createOrReplaceTempView("pg_attribute")

    # pg_type: oid/name plus typlen (pg's fixed sizes; -1 = varlena) — psql,
    # pgAdmin, and drivers key on these (reference unions the same rows onto
    # DuckDB's builtin pg_type, query_remapper_table.go:346-...).
    _TYPLEN = {"bool": 1, "char": 1, "int2": 2, "int4": 4, "oid": 4,
               "float4": 4, "date": 4, "int8": 8, "float8": 8, "time": 8,
               "timestamp": 8, "timestamptz": 8, "timetz": 12, "interval": 16,
               "uuid": 16, "name": 64}
    spark.createDataFrame(
        [(oid, name, 0, _TYPLEN.get(name, -1), 11,
          "b" if not name.startswith("_") else "b")
         for name, (oid, _) in sorted(_PG_TYPE_INFO.items(), key=lambda kv: kv[1][0])],
        "oid bigint, typname string, typcollation bigint, typlen int, "
        "typnamespace bigint, typtype string",
    ).createOrReplaceTempView("pg_type")

    # pg_user / pg_roles / pg_shadow carry pg's full column sets in pg's
    # column order (reference seeds identical views,
    # query_remapper_table.go:298-306).
    spark.sql(
        f"SELECT '{PG_USER}' AS usename, CAST(10 AS BIGINT) AS usesysid, "
        "true AS usecreatedb, true AS usesuper, true AS userepl, "
        "true AS usebypassrls, '' AS passwd, "
        "CAST(NULL AS TIMESTAMP) AS valuntil, "
        "CAST(NULL AS ARRAY<STRING>) AS useconfig"
    ).createOrReplaceTempView("pg_user")
    spark.sql(
        f"SELECT CAST(10 AS BIGINT) AS oid, '{PG_USER}' AS rolname, "
        "true AS rolsuper, true AS rolinherit, true AS rolcreaterole, "
        "true AS rolcreatedb, true AS rolcanlogin, false AS rolreplication, "
        "CAST(-1 AS INT) AS rolconnlimit, CAST(NULL AS STRING) AS rolpassword, "
        "CAST(NULL AS TIMESTAMP) AS rolvaliduntil, false AS rolbypassrls, "
        "CAST(NULL AS ARRAY<STRING>) AS rolconfig"
    ).createOrReplaceTempView("pg_roles")
    spark.sql(
        f"SELECT CAST(16388 AS BIGINT) AS oid, '{PG_DATABASE}' AS datname, "
        "CAST(10 AS BIGINT) AS datdba, CAST(6 AS INT) AS encoding, "
        "'c' AS datlocprovider, false AS datistemplate, true AS datallowconn, "
        "CAST(-1 AS INT) AS datconnlimit, CAST(722 AS BIGINT) AS datfrozenxid, "
        "CAST(1 AS INT) AS datminmxid, CAST(1663 AS BIGINT) AS dattablespace, "
        "'en_US.UTF-8' AS datcollate, 'en_US.UTF-8' AS datctype, "
        "'en_US.UTF-8' AS datlocale, CAST(NULL AS STRING) AS daticurules, "
        "CAST(NULL AS STRING) AS datcollversion, "
        "CAST(NULL AS ARRAY<STRING>) AS datacl"
    ).createOrReplaceTempView("pg_database")
    spark.createDataFrame(
        [("server_version", "17.0"), ("search_path", '"$user", public'),
         ("timezone", "UTC"), ("max_connections", "100"),
         ("default_null_order", "nulls_last")],
        "name string, setting string",
    ).createOrReplaceTempView("pg_settings")
    spark.createDataFrame(
        [(13823, "plpgsql", 10, 11, False, "1.0"),
         # the vector operator surface (<->, <=>, <#>, vector type/casts)
         # is served natively, so the extension row reports as installed —
         # ORMs and pgvector client libs gate on its presence
         (16699, "vector", 10, 2200, True, "0.7.0")],
        "oid bigint, extname string, extowner bigint, extnamespace bigint, "
        "extrelocatable boolean, extversion string",
    ).selectExpr(
        "*", "CAST(NULL AS ARRAY<STRING>) AS extconfig",
        "CAST(NULL AS ARRAY<STRING>) AS extcondition",
    ).createOrReplaceTempView("pg_extension")
    # `SELECT * FROM user` (reference: CREATE VIEW user AS SELECT config.User)
    spark.sql(f"SELECT '{PG_USER}' AS user").createOrReplaceTempView("user")
    # pg_proc: one representative row (clients mostly LEFT JOIN or LIMIT it;
    # pg_get_userbyid folds to the configured user regardless of proowner)
    spark.sql(
        "SELECT CAST(1 AS BIGINT) AS oid, 'version' AS proname, "
        "CAST(11 AS BIGINT) AS pronamespace, CAST(10 AS BIGINT) AS proowner, "
        "'f' AS prokind, CAST(25 AS BIGINT) AS prorettype, "
        "CAST(0 AS INT) AS pronargs, false AS proretset"
    ).createOrReplaceTempView("pg_proc")
    # Static empty tables — shape-faithful to the reference's boot DDL
    # (query_remapper_table.go:275-293); clients SELECT them and expect
    # zero rows, never errors.
    for name, ddl in _EMPTY_TABLES.items():
        spark.createDataFrame([], ddl).createOrReplaceTempView(name)
    # pg_tablespace: the single default tablespace (clients LEFT JOIN it and
    # scan it — one row, like the engine default the reference surfaces)
    # (oid 0 / NULL name mirrors the reference's engine row, which neither
    # joins pg_database.dattablespace nor carries a name on the wire)
    spark.sql(
        "SELECT CAST(0 AS BIGINT) AS oid, CAST(NULL AS STRING) AS spcname, "
        "CAST(10 AS BIGINT) AS spcowner, CAST(NULL AS STRING) AS spcacl, "
        "CAST(NULL AS STRING) AS spcoptions"
    ).createOrReplaceTempView("pg_tablespace")

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
                              CAST(NULL AS ARRAY<INT>), CAST(NULL AS BOOLEAN),
                              CAST(NULL AS ARRAY<BIGINT>))
            AS t(indexrelid, indrelid, indnatts, indisunique, indisprimary,
                 indisvalid, indisclustered, indisreplident, indkey,
                 indnullsnotdistinct, indclass) WHERE 1 = 0
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
    # exactly the reference's single default-collation row
    # (query_remapper_table.go:305)
    spark.sql(
        "SELECT CAST(100 AS BIGINT) AS oid, 'default' AS collname, "
        "CAST(11 AS BIGINT) AS collnamespace, CAST(10 AS BIGINT) AS collowner, "
        "'d' AS collprovider, true AS collisdeterministic, "
        "CAST(-1 AS INT) AS collencoding, CAST(NULL AS STRING) AS collcollate, "
        "CAST(NULL AS STRING) AS collctype, CAST(NULL AS STRING) AS colliculocale, "
        "CAST(NULL AS STRING) AS collicurules, CAST(NULL AS STRING) AS collversion"
    ).createOrReplaceTempView("pg_collation")
    # pg_shadow: passwd carries a real SCRAM verifier for the server's user,
    # shaped like the reference's row (query_handler_test.go:1466).
    from bemidb_spark.server.scram import build_verifier

    verifier = build_verifier(PG_USER, salt=b"bemidb-spark-ini", iterations=4096)
    spark.createDataFrame(
        [(PG_USER, 10, False, False, True, False, verifier, None, None)],
        "usename string, usesysid bigint, usecreatedb boolean, usesuper boolean, "
        "userepl boolean, usebypassrls boolean, passwd string, valuntil timestamp, "
        "useconfig array<string>",
    ).createOrReplaceTempView("pg_shadow")
    _MV_DDL = (
        "schemaname string, matviewname string, matviewowner string, "
        "tablespace string, hasindexes boolean, ispopulated boolean, definition string"
    )
    spark.createDataFrame(
        [(s, t, PG_USER, None, False, True,
          catalog.matview_definition("matviews", t) if catalog is not None else "")
         for s, t, _ in inventory if t in matview_names],
        _MV_DDL,
    ).createOrReplaceTempView("pg_matviews")

    view_defs = {}
    if catalog is not None:
        view_defs = {k.split(".", 1)[1]: e.get("definition", "")
                     for k, e in catalog.views().items()}
    spark.createDataFrame(
        [(s, t, PG_USER, view_defs.get(t, ""))
         for s, t, _ in inventory if t in view_names],
        "schemaname string, viewname string, viewowner string, definition string",
    ).createOrReplaceTempView("pg_views")
    # pg's full 26-column shape; relid/n_live_tup values match the
    # reference's upsert (query_remapper_table.go:216-230: relid '123456',
    # n_live_tup 1, everything else 0/NULL).
    stat_rows = [
        (123456, s, t, 0, None, 0, 0, None, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0,
         None, None, None, None, 0, 0, 0, 0)
        for i, (s, t, cols) in enumerate(inventory)
    ]
    spark.createDataFrame(
        stat_rows,
        "relid bigint, schemaname string, relname string, seq_scan bigint, "
        "last_seq_scan timestamp, seq_tup_read bigint, idx_scan bigint, "
        "last_idx_scan timestamp, idx_tup_fetch bigint, n_tup_ins bigint, "
        "n_tup_upd bigint, n_tup_del bigint, n_tup_hot_upd bigint, "
        "n_tup_newpage_upd bigint, n_live_tup bigint, n_dead_tup bigint, "
        "n_mod_since_analyze bigint, n_ins_since_vacuum bigint, "
        "last_vacuum timestamp, last_autovacuum timestamp, "
        "last_analyze timestamp, last_autoanalyze timestamp, "
        "vacuum_count bigint, autovacuum_count bigint, analyze_count bigint, "
        "autoanalyze_count bigint",
    ).createOrReplaceTempView("pg_stat_user_tables")
    # pg_stat_activity: always empty (the reference's is too,
    # query_remapper_table.go:284) — per-connection state lives in the wire
    # server; monitoring clients get zero rows, never an error.
    spark.createDataFrame(
        [],
        "datid bigint, datname string, pid int, usesysid bigint, "
        "usename string, application_name string, client_addr string, "
        "client_hostname string, client_port int, backend_start timestamp, "
        "xact_start timestamp, query_start timestamp, state_change timestamp, "
        "wait_event_type string, wait_event string, state string, "
        "backend_xid bigint, backend_xmin bigint, query string, "
        "backend_type string",
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
    # pg_get_keywords() is remapped to this view; 5-column pg shape with the
    # reference's constant catcode/barelabel fills (the reference forwards
    # its engine's keyword list the same way,
    # query_remapper_function.go:96-112: every row 'U'/TRUE/'can be bare
    # label'). 'abort' leads, as in pg's own keyword table.
    spark.createDataFrame(
        [(w, "U", True, "unreserved", "can be bare label") for w in
         ["abort", "absolute", "access", "action", "add", "admin", "after",
          "all", "alter", "analyze", "and", "any", "as", "asc", "begin",
          "between", "by", "cascade", "case", "cast", "check", "close",
          "column", "commit", "copy", "create", "cross", "current_date",
          "current_time", "current_timestamp", "current_user", "cursor",
          "database", "deallocate", "declare", "default", "delete", "desc",
          "distinct", "drop", "else", "end", "escape", "except", "execute",
          "exists", "explain", "false", "fetch", "filter", "first", "from",
          "full", "group", "having", "in", "index", "inner", "insert",
          "intersect", "interval", "into", "is", "join", "key", "last",
          "left", "like", "limit", "not", "null", "offset", "on", "or",
          "order", "outer", "over", "partition", "prepare", "primary",
          "recursive", "references", "release", "rename", "reset", "right",
          "rollback", "savepoint", "schema", "select", "set", "show",
          "table", "then", "to", "true", "truncate", "union", "unique",
          "update", "user", "using", "values", "view", "when", "where",
          "window", "with"]],
        "word string, catcode string, barelabel boolean, catdesc string, "
        "baredesc string",
    ).createOrReplaceTempView("pg_keywords_view")

    # information_schema (B6) — pg's full 12-column tables shape
    spark.createDataFrame(
        [(PG_DATABASE, s, t, "VIEW" if t in view_names else "BASE TABLE",
          None, None, None, None, None, "YES", "NO", None)
         for s, t, _ in inventory],
        "table_catalog string, table_schema string, table_name string, "
        "table_type string, self_referencing_column_name string, "
        "reference_generation string, user_defined_type_catalog string, "
        "user_defined_type_schema string, user_defined_type_name string, "
        "is_insertable_into string, is_typed string, commit_action string",
    ).createOrReplaceTempView("information_schema_tables")

    info_cols = []
    for s, t, cols in inventory:
        for pos, (cname, ctype, nullable, pg_tag) in enumerate(cols, start=1):
            udt = _udt_name(ctype, pg_tag)
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
        # schemata lists system schemas too (pg does; pg_namespace above is
        # the user-visible subset)
        [(PG_DATABASE, s, PG_USER)
         for s in sorted(set(schemas) | {"pg_catalog", "information_schema"})],
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
