"""pg DML over catalog tables: INSERT / UPDATE / DELETE / ON CONFLICT.

Beyond-reference write path (the reference server is read-only over the wire;
its writes happen in syncers — syncer-common + iceberg_table_writer.go). Real
clients and ORMs issue small DML against their analytics tables, so this maps
the idiomatic statements onto the same storage machinery the syncers use:

- ``INSERT … VALUES``                 → append files (never rewrites data)
- ``INSERT … ON CONFLICT DO NOTHING`` → anti-join then append new keys only
- ``INSERT … ON CONFLICT (k) DO UPDATE SET c = EXCLUDED.c`` →
  ``writer.upsert_by_key`` (partition-pruned MERGE on key-bucketed tables)
- ``UPDATE … SET … WHERE …``          → matched rows recomputed, then
  partition-pruned upsert (bucketed) or rewrite-and-swap (unbucketed)
- ``DELETE FROM … WHERE …``           → ``writer.delete_by_key`` (bucketed)
  or rewrite-and-swap

Scale notes: the VALUES payload of an INSERT is tiny (client-side literals),
so every path's cost is bounded by the *affected key buckets*, not table
size, on bucketed tables — a 1-row upsert touches 1 partition directory.
UPDATE/DELETE predicates are ordinary Spark expressions, so partition/file
pruning applies to the matched-row scan as well.

All SET right-hand sides see the OLD row (pg semantics): the new row is built
in a single ``select`` so one SET cannot observe another's result.

``RETURNING`` works on every form: the projection is materialized BEFORE the
table mutates (a lazy plan would re-read the swapped/overwritten location)
and is streamed back as a result set with the DML CommandComplete tag —
the `INSERT … RETURNING id` shape every ORM emits.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bemidb_spark.pgcompat.transpiler import transpile
from bemidb_spark.sources.catalog import Catalog
from bemidb_spark.sources.writer import (
    BUCKET_COL,
    _bucket_expr,
    delete_by_key,
    read_table,
    replace_table,
    upsert_by_key,
)

_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+([A-Za-z_][\w.\"]*)\s*(?:\(([^)]*)\))?\s*"
    r"VALUES\s*(.+?)\s*"
    r"(?:ON\s+CONFLICT\s*\(([^)]*)\)\s*DO\s+(NOTHING|UPDATE\s+SET\s+.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+([A-Za-z_][\w.\"]*)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+([A-Za-z_][\w.\"]*)(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_EXCLUDED_SET_RE = re.compile(
    r'^\s*"?([\w]+)"?\s*=\s*EXCLUDED\s*\.\s*"?([\w]+)"?\s*$', re.IGNORECASE
)


def _split_name(name: str) -> tuple[str, str]:
    schema, _, table = name.replace('"', "").rpartition(".")
    return schema or "public", table


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on sep outside parens/quotes (SET lists, VALUES rows)."""
    out, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n:
                if s[i] == "'" and not (i + 1 < n and s[i + 1] == "'"):
                    break
                i += 2 if s[i] == "'" else 1
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == sep and depth == 0:
            out.append(s[start:i])
            start = i + 1
        i += 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


def _not_matching(cond: F.Column) -> F.Column:
    # pg DELETE/UPDATE act on rows where the predicate IS TRUE; NULL keeps.
    return ~F.coalesce(cond.cast("boolean"), F.lit(False))


class DmlError(Exception):
    sqlstate = "42601"


def _bucket_keys(catalog: Catalog, schema: str, table: str) -> list[str] | None:
    props = catalog.table_props(schema, table) or {}
    return props.get("bucket_keys") or None


def _read_target(
    spark: SparkSession, catalog: Catalog, schema: str, table: str
) -> DataFrame:
    try:
        return read_table(spark, catalog, schema, table)
    except KeyError:
        err = DmlError(f'relation "{schema}.{table}" does not exist')
        err.sqlstate = "42P01"
        raise err from None


def _append(
    spark: SparkSession, catalog: Catalog, schema: str, table: str, typed: DataFrame
) -> None:
    """Append-only write (the COPY-FROM path): new files, old files untouched."""
    props = catalog.table_props(schema, table) or {}
    loc = catalog.location(schema, table)
    if props.get("bucket_keys"):
        out = typed.withColumn(
            BUCKET_COL, _bucket_expr(props["bucket_keys"], props["n_buckets"])
        )
        out.write.mode("append").partitionBy(BUCKET_COL).parquet(loc)
    else:
        typed.write.mode("append").parquet(loc)
    spark.catalog.refreshByPath(loc)
    catalog.commit_table(schema, table, loc, catalog.columns(schema, table))


def _values_df(
    spark: SparkSession,
    target: DataFrame,
    cols: list[str],
    values_sql: str,
) -> DataFrame:
    """Evaluate the (transpiled) VALUES payload and conform it to the target
    schema: listed columns cast to their table types, absent columns NULL."""
    fields = {f.name: f for f in target.schema.fields}
    unknown = [c for c in cols if c not in fields]
    if unknown:
        err = DmlError(f'column "{unknown[0]}" does not exist')
        err.sqlstate = "42703"
        raise err
    alias = ", ".join(f"c{i}" for i in range(len(cols)))
    raw = spark.sql(transpile(f"SELECT * FROM (VALUES {values_sql}) AS t({alias})"))
    if len(raw.columns) != len(cols):
        err = DmlError(
            f"INSERT has {len(raw.columns)} expressions but {len(cols)} target columns"
        )
        err.sqlstate = "42601"
        raise err
    typed = raw.select(
        *[raw[f"c{i}"].cast(fields[c].dataType).alias(c) for i, c in enumerate(cols)]
    )
    for f in target.schema.fields:
        if f.name not in cols:
            typed = typed.withColumn(f.name, F.lit(None).cast(f.dataType))
    return typed.select(*[f.name for f in target.schema.fields])


def _materialize(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Pin a RETURNING projection's rows BEFORE the table mutates — the lazy
    plan would otherwise re-read the (swapped/overwritten) table location."""
    return spark.createDataFrame(df.collect(), df.schema)


def _project_returning(
    spark: SparkSession, df: DataFrame, clause: str | None
) -> DataFrame | None:
    if clause is None:
        return None
    if clause.strip() == "*":
        return _materialize(spark, df)
    items = [transpile(i) for i in _split_top_level(clause)]
    return _materialize(spark, df.selectExpr(*items))


def _merge_conflict_updates(
    spark: SparkSession,
    target: DataFrame,
    typed: DataFrame,
    keys: list[str],
    sets: list[str],
) -> DataFrame:
    """Evaluate ON CONFLICT SET expressions with pg scoping: for rows whose
    key already exists, bare columns bind to the OLD row and ``EXCLUDED.col``
    to the proposed row; unmatched rows insert as proposed. One join on the
    conflict key (the proposed side is client-literal-sized, so Catalyst
    broadcasts it); the result feeds the partition-pruned upsert."""
    from bemidb_spark.pgcompat.transpiler import _shield_strings, _unshield

    fields = {f.name: f for f in target.schema.fields}
    set_map: dict[str, str] = {}
    for item in sets:
        sm = re.match(r'^\s*"?([\w]+)"?\s*=\s*(.+)$', item, re.DOTALL)
        if not sm or sm.group(1) not in fields:
            raise DmlError(f"unsupported SET clause: {item}")
        shielded, lits = _shield_strings(transpile(sm.group(2).strip()))
        shielded = re.sub(
            r"\bEXCLUDED\s*\.\s*\"?(\w+)\"?", r"__new_\1", shielded,
            flags=re.IGNORECASE,
        )
        for c in fields:  # bare refs -> the old (target) row
            shielded = re.sub(
                rf'(?<![\w."])({re.escape(c)})\b(?!\s*\()', f"__old_{c}",
                shielded, flags=re.IGNORECASE,
            )
        set_map[sm.group(1)] = _unshield(shielded, lits)
    old = target.select(*[F.col(c).alias(f"__old_{c}") for c in fields])
    new = typed.select(*[F.col(c).alias(f"__new_{c}") for c in fields])
    cond = None
    for k in keys:
        eq = new[f"__new_{k}"] == old[f"__old_{k}"]
        cond = eq if cond is None else (cond & eq)
    joined = new.join(old, on=cond, how="left")
    matched = F.col(f"__old_{keys[0]}").isNotNull()
    return joined.select(*[
        F.when(
            matched,
            F.expr(set_map[c]) if c in set_map else F.col(f"__old_{c}"),
        ).otherwise(F.col(f"__new_{c}")).cast(fields[c].dataType).alias(c)
        for c in fields
    ])


def handle_dml(
    spark: SparkSession, catalog: Catalog | None, sql: str
) -> tuple[str, int, DataFrame | None] | None:
    """Execute one DML statement; returns (tag_head, n_affected,
    returning_df | None) or None if the statement is not DML."""
    head = sql.lstrip().split(None, 1)[0].upper() if sql.strip() else ""
    if head not in ("INSERT", "UPDATE", "DELETE"):
        return None
    if catalog is None:
        raise DmlError("DML requires a table catalog")
    rm = re.search(r"\bRETURNING\b\s+(.+?)\s*;?\s*$", sql,
                   re.IGNORECASE | re.DOTALL)
    returning = rm.group(1) if rm else None
    if rm:
        sql = sql[:rm.start()]

    if head == "INSERT":
        m = _INSERT_RE.match(sql)
        if not m:
            raise DmlError("unsupported INSERT form (expected INSERT … VALUES …)")
        schema, table = _split_name(m.group(1))
        target = _read_target(spark, catalog, schema, table)
        cols = (
            [c.strip().strip('"') for c in m.group(2).split(",")]
            if m.group(2)
            else [f.name for f in target.schema.fields]
        )
        typed = _values_df(spark, target, cols, m.group(3))
        conflict_keys = (
            [c.strip().strip('"') for c in m.group(4).split(",")] if m.group(4) else None
        )
        action = (m.group(5) or "").strip()
        if conflict_keys is None:
            n = typed.count()
            ret = _project_returning(spark, typed, returning)
            _append(spark, catalog, schema, table, typed)
            return "INSERT", n, ret
        if action.upper() == "NOTHING":
            fresh = typed.join(
                target.select(*conflict_keys), on=conflict_keys, how="left_anti"
            )
            n = fresh.count()
            ret = _project_returning(spark, fresh, returning)
            if n:
                _append(spark, catalog, schema, table, fresh)
            return "INSERT", n, ret
        # DO UPDATE SET …: the idiomatic full-row case (every SET is
        # `col = EXCLUDED.col`) merges the new rows directly; arbitrary SET
        # expressions get a real old-row merge — bare column refs mean the
        # TARGET row, EXCLUDED.col the proposed row, exactly pg's scoping.
        if re.search(r"\bWHERE\b", action, re.IGNORECASE):
            raise DmlError("ON CONFLICT DO UPDATE ... WHERE is not supported")
        sets = _split_top_level(action[len("UPDATE"):].strip()[len("SET"):].strip())
        full_row = all(
            (sm := _EXCLUDED_SET_RE.match(item)) and sm.group(1) == sm.group(2)
            for item in sets
        )
        n = typed.count()
        effective = typed if full_row else _merge_conflict_updates(
            spark, target, typed, conflict_keys, sets
        )
        ret = _project_returning(spark, effective, returning)
        upsert_by_key(spark, catalog, schema, table, effective, conflict_keys)
        return "INSERT", n, ret

    if head == "DELETE":
        m = _DELETE_RE.match(sql)
        if not m:
            raise DmlError("unsupported DELETE form")
        schema, table = _split_name(m.group(1))
        current = _read_target(spark, catalog, schema, table)
        if m.group(2) is None:
            n = current.count()
            ret = _project_returning(spark, current, returning)
            replace_table(catalog, schema, table, current.limit(0))
            return "DELETE", n, ret
        cond = F.expr(transpile(m.group(2)))
        keys = _bucket_keys(catalog, schema, table)
        matched = current.filter(cond)
        n = matched.count()
        ret = _project_returning(spark, matched, returning)
        if n == 0:
            return "DELETE", 0, ret
        if keys:
            delete_by_key(spark, catalog, schema, table, matched.select(*keys), keys)
        else:
            replace_table(catalog, schema, table, current.filter(_not_matching(cond)))
        return "DELETE", n, ret

    m = _UPDATE_RE.match(sql)
    if not m:
        raise DmlError("unsupported UPDATE form")
    schema, table = _split_name(m.group(1))
    current = _read_target(spark, catalog, schema, table)
    fields = {f.name: f for f in current.schema.fields}
    set_map: dict[str, str] = {}
    for item in _split_top_level(m.group(2)):
        sm = re.match(r'^\s*"?([\w]+)"?\s*=\s*(.+)$', item, re.DOTALL)
        if not sm:
            raise DmlError(f"unsupported SET clause: {item}")
        col = sm.group(1)
        if col not in fields:
            err = DmlError(f'column "{col}" does not exist')
            err.sqlstate = "42703"
            raise err
        set_map[col] = transpile(sm.group(2).strip())
    cond = F.expr(transpile(m.group(3))) if m.group(3) else F.lit(True)
    matched = current.filter(cond)
    n = matched.count()
    updated = matched.select(
        *[
            F.expr(set_map[c]).cast(fields[c].dataType).alias(c)
            if c in set_map
            else F.col(c)
            for c in fields
        ]
    )
    ret = _project_returning(spark, updated, returning)
    if n == 0:
        return "UPDATE", 0, ret
    keys = _bucket_keys(catalog, schema, table)
    if keys and not any(k in set_map for k in keys):
        upsert_by_key(spark, catalog, schema, table, updated, keys)
    else:
        kept = current.filter(_not_matching(cond))
        replace_table(catalog, schema, table, kept.unionByName(updated))
    return "UPDATE", n, ret
