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

from pyspark.sql import SparkSession

from bemidb_spark.sources.catalog import Catalog

PG_USER = "bemidb"
PG_DATABASE = "bemidb"

# (oid, typname) — the common subset clients introspect (reference seeds ~90,
# query_remapper_table.go:566-703; this is the same idea, truncated to types
# the engine can actually produce).
_PG_TYPES = [
    (16, "bool"), (17, "bytea"), (18, "char"), (19, "name"), (20, "int8"),
    (21, "int2"), (23, "int4"), (25, "text"), (26, "oid"), (114, "json"),
    (700, "float4"), (701, "float8"), (1042, "bpchar"), (1043, "varchar"),
    (1082, "date"), (1083, "time"), (1114, "timestamp"), (1184, "timestamptz"),
    (1186, "interval"), (1266, "timetz"), (1700, "numeric"), (2950, "uuid"),
    (3802, "jsonb"),
]

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
# MATERIALIZED VIEW, replace_table) re-points them at the new location.
_BOUND_BARE_NAMES: set[str] = set()


def bind_catalog_tables(spark: SparkSession, catalog: Catalog | None) -> None:
    """Make every catalog table resolvable by name (the reference's B3 role:
    schema.table -> engine-readable relation, query_remapper_table.go:93-110).
    Registers `<schema>_<table>` always, and bare `<table>` when free or
    previously bound by us."""
    if catalog is None:
        return
    existing = {t.name for t in spark.catalog.listTables() if t.tableType == "TEMPORARY"}
    for key, entry in catalog.tables().items():
        schema, table = key.split(".", 1)
        try:
            df = spark.read.parquet(entry["location"])
        except Exception:  # location vanished (dropped mid-flight)
            continue
        df.createOrReplaceTempView(f"{schema}_{table}")
        if table not in existing or table in _BOUND_BARE_NAMES:
            df.createOrReplaceTempView(table)
            _BOUND_BARE_NAMES.add(table)


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
    classes = [
        (16384 + i, t, ns_oid[s], "r", float(len(cols)))
        for i, (s, t, cols) in enumerate(inventory)
    ]
    spark.createDataFrame(
        classes or [(0, "", 0, "", 0.0)],
        "oid bigint, relname string, relnamespace bigint, relkind string, reltuples double",
    ).createOrReplaceTempView("pg_class")

    attrs = []
    for i, (s, t, cols) in enumerate(inventory):
        for pos, (cname, ctype, nullable) in enumerate(cols, start=1):
            attrs.append((16384 + i, cname, pos, pg_type_name(ctype), not nullable))
    spark.createDataFrame(
        attrs or [(0, "", 0, "", False)],
        "attrelid bigint, attname string, attnum int, atttypname string, attnotnull boolean",
    ).createOrReplaceTempView("pg_attribute")

    spark.createDataFrame(
        _PG_TYPES, "oid bigint, typname string"
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

    # information_schema (B6)
    spark.createDataFrame(
        [(PG_DATABASE, s, t, "BASE TABLE") for s, t, _ in inventory]
        or [("", "", "", "")],
        "table_catalog string, table_schema string, table_name string, table_type string",
    ).createOrReplaceTempView("information_schema_tables")

    info_cols = []
    for s, t, cols in inventory:
        for pos, (cname, ctype, nullable) in enumerate(cols, start=1):
            info_cols.append(
                (PG_DATABASE, s, t, cname, pos,
                 "YES" if nullable else "NO", pg_type_name(ctype))
            )
    spark.createDataFrame(
        info_cols or [("", "", "", "", 0, "", "")],
        "table_catalog string, table_schema string, table_name string, "
        "column_name string, ordinal_position int, is_nullable string, udt_name string",
    ).createOrReplaceTempView("information_schema_columns")
