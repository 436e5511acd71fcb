"""Column-level permissions via query comment (B20).

The reference accepts ``/*BEMIDB_PERMISSIONS {"schema.table": ["col", …]}*/``
in the query text and applies per-table column projection; a table mapped to
an empty list is denied entirely and reads as zero rows (reference
query_remapper.go:70-77, 713-731; parser_table.go:53-106).

Here the same contract is applied as a source rewrite before Spark parses:
each permitted table reference becomes a column-pruned inline subselect
(Catalyst then pushes the pruned schema into the scan — the projection is
enforcement *and* an optimization), and a denied table becomes an empty
relation with a NULL column, matching the reference's ``SELECT NULL WHERE
FALSE`` shape.
"""

from __future__ import annotations

import json
import re

_PERM_RE = re.compile(r"/\*\s*BEMIDB_PERMISSIONS\s*(\{.*?\})\s*\*/", re.DOTALL)


def extract_permissions(sql: str) -> tuple[str, dict[str, list[str]] | None]:
    """Strip the permissions comment; return (clean_sql, perms or None)."""
    m = _PERM_RE.search(sql)
    if not m:
        return sql, None
    perms = json.loads(m.group(1))
    return _PERM_RE.sub("", sql), perms


def apply_permissions(sql: str, perms: dict[str, list[str]]) -> str:
    """Rewrite FROM/JOIN references per the permission map."""
    for qualified, cols in perms.items():
        table = qualified.split(".")[-1]
        if cols:
            proj = ", ".join(cols)
            replacement = f"(SELECT {proj} FROM {table}) AS {table}"
        else:
            replacement = f"(SELECT NULL AS denied WHERE FALSE) AS {table}"
        sql = re.sub(
            rf"\b(FROM|JOIN)\s+{re.escape(qualified)}(?!\w)",
            rf"\1 {replacement}",
            sql,
            flags=re.IGNORECASE,
        )
        if "." in qualified:
            sql = re.sub(
                rf"\b(FROM|JOIN)\s+{re.escape(table)}(?!\w)",
                rf"\1 {replacement}",
                sql,
                flags=re.IGNORECASE,
            )
    return sql
