"""Postgres-dialect → Spark SQL transpiler (targeted rewrite rules).

The reference parses queries with the real Postgres parser and rewrites the
AST (SURVEY.md §2.B). No Postgres parser ships in this environment, so this is
a rule-based source rewriter covering the same remap set — each rule cites the
reference behavior it reproduces:

- B8  function remaps: ``format``→``format_string``,
  ``encode(sha256(x),'hex')``→``sha2(x,256)``,
  ``jsonb_agg``/``json_agg``→``to_json(collect_list(…))``
  (reference query_remapper_function.go:134-175, parser_function.go:71-137)
- B9  JSON operators: ``->>``/``->`` → ``get_json_object``, ``?`` →
  ``IS NOT NULL`` test (parser_a_expr.go:34-77)
- B10 ``= ANY('{a,b}')`` string-array literal → ``IN ('a','b')``
  (parser_a_expr.go:106-154)
- B11 type casts: strip ``pg_catalog.`` prefixes; ``x::type`` →
  ``CAST(x AS sparktype)`` with the §1.3 type mapping; ``::jsonb``/``::json``
  → string passthrough; ``::regclass`` → name literal
  (query_remapper_expression.go:37-83, parser_type_cast.go:90-206)
- table-qualifier routing: ``pg_catalog.t`` / ``information_schema.t`` →
  emulation view names (B5/B6)
- ``~`` / ``!~`` regex operators → ``RLIKE`` / ``NOT RLIKE``

Rules are regex-based and deliberately conservative: they rewrite only
well-delimited patterns and leave everything else for Spark's parser to
accept or reject. String literals are shielded from rewriting.
"""

from __future__ import annotations

import re

# Postgres type name -> Spark type (SURVEY.md §1.3 mapping).
TYPE_MAP = {
    "text": "STRING",
    "varchar": "STRING",
    "bpchar": "STRING",
    "char": "STRING",
    "name": "STRING",
    "uuid": "STRING",
    "json": "STRING",
    "jsonb": "STRING",
    "xml": "STRING",
    "inet": "STRING",
    "cidr": "STRING",
    "macaddr": "STRING",
    "bool": "BOOLEAN",
    "boolean": "BOOLEAN",
    "int2": "SMALLINT",
    "smallint": "SMALLINT",
    "int4": "INT",
    "int": "INT",
    "integer": "INT",
    "int8": "BIGINT",
    "bigint": "BIGINT",
    "oid": "BIGINT",
    "regclass": "STRING",
    "regproc": "STRING",
    "regtype": "STRING",
    "regrole": "STRING",
    "regnamespace": "STRING",
    "float4": "FLOAT",
    "real": "FLOAT",
    "float8": "DOUBLE",
    "numeric": "DECIMAL(38,6)",
    "decimal": "DECIMAL(38,6)",
    "date": "DATE",
    "timestamp": "TIMESTAMP_NTZ",
    "timestamptz": "TIMESTAMP",
    "time": "STRING",
    "timetz": "STRING",
    "interval": "INTERVAL DAY TO SECOND",
    "bytea": "BINARY",
}

_IDENT = r"[A-Za-z_][A-Za-z_0-9]*"

# pg keywords OUTSIDE the "unreserved" category (reserved + col_name +
# type_func_name, pg16 kwlist.h): quote_ident quotes these even when they
# are lowercase-safe (`quote_ident('select')` -> `"select"`). The
# pg_get_keywords VIEW keeps the reference's all-'U' fill (parity); this
# set exists only for quote_ident's quoting rule.
_QI_KEYWORDS = (
    # reserved (R)
    "all analyse analyze and any array as asc asymmetric both case cast "
    "check collate column constraint create current_catalog current_date "
    "current_role current_time current_timestamp current_user default "
    "deferrable desc distinct do else end except false fetch for foreign "
    "from grant group having in initially intersect into lateral leading "
    "limit localtime localtimestamp not null offset on only or order "
    "placing primary references returning select session_user some "
    "symmetric system_user table then to trailing true union unique user "
    "using variadic when where window with "
    # col_name (C)
    "between bigint bit boolean char character coalesce dec decimal exists "
    "extract float greatest grouping inout int integer interval least "
    "national nchar none normalize nullif numeric out overlay position "
    "precision real row setof smallint substring time timestamp treat trim "
    "values varchar xmlattributes xmlconcat xmlelement xmlexists xmlforest "
    "xmlnamespaces xmlparse xmlpi xmlroot xmlserialize xmltable "
    # type_func_name (T)
    "authorization binary collation concurrently cross current_schema "
    "freeze full ilike inner is isnull join left like natural notnull "
    "outer overlaps right similar tablesample verbose"
).split()
_QI_KEYWORDS_SQL = ", ".join(f"'{w}'" for w in _QI_KEYWORDS)
_CASTABLE = rf"(?:'(?:[^']|'')*'|\({_IDENT}(?:\.{_IDENT})*\)|{_IDENT}(?:\.{_IDENT})*|\d+(?:\.\d+)?)"


def _shield_strings(sql: str) -> tuple[str, list[str]]:
    """Replace string literals with placeholders so rules can't touch them.

    Captures both plain literals and pg escape-strings (``E'...'``, the E
    kept in the stored text so _unshield can tell them apart)."""
    literals: list[str] = []

    def repl(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    return re.sub(r"(?<![A-Za-z0-9_\x00])[Ee]'(?:[^']|'')*'|'(?:[^']|'')*'",
                  repl, sql), literals


def _unshield(sql: str, literals: list[str]) -> str:
    """Restore shielded literals with pg semantics intact.

    pg defaults to standard_conforming_strings: ``'\\d+'`` is the two chars
    backslash-d (and DuckDB agrees), while Spark's literal parser applies
    C-style escapes (``'\\d'`` → ``d`` — silently corrupting every regex a
    pg client sends). So plain literals get their backslashes doubled here —
    the single escaping point for BOTH user literals and rule-generated ones
    (whose stored text is likewise verbatim content). ``E'...'`` strings,
    where pg itself applies C-style escapes, drop the E and keep the body
    for Spark's own escape processing (same \\n/\\t/\\\\ core)."""

    def restore(m: re.Match) -> str:
        lit = literals[int(m.group(1))]
        if lit[0] in "Ee":
            # pg's doubled-quote convention ('' = one quote char) holds
            # inside E-strings too, but Spark parses '…''…' as two adjacent
            # literals concatenated (dropping the quote). Rewrite '' → \'
            # in the body; Spark's escape processing restores the quote.
            body = lit[2:-1].replace("''", "\\'")
            return f"'{body}'"
        return lit.replace("\\", "\\\\")

    return re.sub(r"\x00(\d+)\x00", restore, sql)


def _rewrite_casts(sql: str, literals: list[str]) -> str:
    """x::type → CAST(x AS spark_type) (repeated for chained casts)."""

    def cast_repl(m: re.Match) -> str:
        # `'x'::"char"` (pg's 1-byte char, quoted) arrives backticked after
        # _rewrite_quoted_idents — strip the quoting and map like bare char
        expr, pgtype = m.group(1), m.group(2).strip("`").lower()
        if m.group(3):
            # '{a,b,c}'::type[] — pg array literal into a typed array. Spark
            # cannot cast STRING→ARRAY, so decode via from_json (pg_dump 15
            # feeds its table-oid list as `unnest('{16384,…}'::oid[])`).
            ph = re.fullmatch(r"\x00(\d+)\x00", expr)
            if ph:
                lit = literals[int(ph.group(1))][1:-1].replace("''", "'")
                if lit.startswith("{") and lit.endswith("}"):
                    import json as _json

                    items = [v.strip() for v in lit[1:-1].split(",")
                             if v.strip()]
                    st = TYPE_MAP.get(pgtype, "STRING")
                    if st in ("STRING",) or not all(
                            re.fullmatch(r"-?\d+(\.\d+)?", v) for v in items):
                        st = "STRING"
                        body = _json.dumps([v.strip('"') for v in items])
                    else:
                        body = "[" + ",".join(items) + "]"
                    body = body.replace("'", "\\'")
                    return f"from_json('{body}', 'array<{st.lower()}>')"
        if pgtype.startswith("regclass"):
            # 'schema.table'::regclass on a literal → real oid lookup over
            # pg_class/pg_namespace, like the reference's scalar-subquery
            # rewrite (parser_type_cast.go:90-206) — clients join the result
            # against pg_class.oid.
            ph = re.fullmatch(r"\x00(\d+)\x00", expr)
            if ph:
                lit = literals[int(ph.group(1))][1:-1].replace("''", "'")
                parts = lit.replace('"', "").split(".")
                name = parts[-1].replace("'", "''")
                if name.startswith("pg_") and len(parts) <= 2:
                    # system catalogs have stable, public oids — emit the
                    # constant instead of a scalar subquery (pg_dump puts
                    # `'pg_class'::regclass` inside JOIN ON conditions,
                    # where Spark rejects subqueries)
                    from bemidb_spark.pgcompat.catalog_views import (
                        _CATALOG_TABLEOIDS,
                    )

                    oid = _CATALOG_TABLEOIDS.get(name)
                    if oid is not None:
                        return f"CAST({oid} AS BIGINT)"
                if len(parts) > 1:
                    schema = parts[-2].replace("'", "''")
                    return (
                        "(SELECT c.oid FROM pg_class c JOIN pg_namespace n "
                        "ON n.oid = c.relnamespace "
                        f"WHERE c.relname = '{name}' AND n.nspname = '{schema}' LIMIT 1)"
                    )
                return f"(SELECT oid FROM pg_class WHERE relname = '{name}' LIMIT 1)"
            return expr
        if pgtype.startswith("regproc"):
            # ::regproc on a constant → the function name itself
            return expr
        if pgtype == "vector":
            # pgvector literal casts: '[0.1,0.2]'::vector → a double array
            # the <-> / <=> / <#> operator rewrites consume
            return f"from_json({expr}, 'array<double>')"
        spark_type = TYPE_MAP.get(pgtype)
        if spark_type is None:
            return f"CAST({expr} AS {m.group(2)})"
        if pgtype == "interval":
            # '1 week'::interval → INTERVAL '1 week'
            return f"INTERVAL {expr}"
        if m.group(3):  # x::type[] — array cast keeps the element type
            return f"CAST({expr} AS ARRAY<{spark_type}>)"
        return f"CAST({expr} AS {spark_type})"

    pattern = re.compile(
        rf"({_CASTABLE}|\x00\d+\x00)\s*::\s*({_IDENT}|`[^`]+`)"
        rf"(?:\(\d+(?:,\s*\d+)?\))?(\[\])?"
    )
    prev = None
    while prev != sql:
        prev = sql
        sql = pattern.sub(cast_repl, sql)
        sql = _rewrite_paren_casts(sql)
    return sql


def _rewrite_paren_casts(sql: str) -> str:
    """Handle `<call-or-paren-expr>)::type` by matching parens backwards."""
    m = re.search(rf"\)\s*::\s*({_IDENT}|`[^`]+`)(?:\(\d+(?:,\s*\d+)?\))?", sql)
    if not m:
        return sql
    close = m.start()
    depth = 0
    i = close
    while i >= 0:
        if sql[i] == ")":
            depth += 1
        elif sql[i] == "(":
            depth -= 1
            if depth == 0:
                break
        i -= 1
    # include a leading function name if present
    j = i
    while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] in "_."):
        j -= 1
    expr = sql[j:close + 1]
    pgtype = m.group(1).strip("`").lower()
    spark_type = TYPE_MAP.get(pgtype)
    if pgtype.startswith(("regclass", "regproc")):
        replacement = expr
    elif pgtype == "vector":
        replacement = f"from_json({expr}, 'array<double>')"
    elif pgtype == "interval":
        replacement = f"INTERVAL {expr}"
    elif spark_type is None:
        replacement = f"CAST({expr} AS {m.group(1)})"
    else:
        replacement = f"CAST({expr} AS {spark_type})"
    return sql[:j] + replacement + sql[m.end():]


def _rewrite_json_ops(sql: str) -> str:
    """``a -> 'k'`` / ``a ->> 'k'`` / chains thereof / ``a ? 'k'``.

    pg semantics via Spark's variant type: ``->`` returns the element AS
    JSON (strings stay quoted, objects compact) = ``to_json(variant_get)``;
    ``->>`` returns the unwrapped text = ``CAST(variant_get AS STRING)``.
    A whole chain ``a->'k1'->>'k2'`` collapses into ONE variant_get with a
    concatenated path (constant-folded by Catalyst), which also fixes the
    old per-step rewrite that mangled chained operators. A no-op ``::json``/
    ``::jsonb`` cast on the base is absorbed."""
    base = rf"({_IDENT}(?:\.{_IDENT})*|\x00\d+\x00)"

    def repl(m: re.Match) -> str:
        expr, ops = m.group(1), m.group(2)
        steps = re.findall(r"(->>|->)\s*(\x00\d+\x00)", ops)
        path_parts = ["'$'"] + [
            f"'.', trim(BOTH '''' FROM {ph})" for _, ph in steps
        ]
        path = "concat(" + ", ".join(path_parts) + ")"
        getter = f"try_variant_get(parse_json({expr}), {path})"
        return (f"CAST({getter} AS STRING)" if steps[-1][0] == "->>"
                else f"to_json({getter})")

    sql = re.sub(
        base + r"(?:\s*::\s*jsonb?\b)?((?:\s*->>?\s*\x00\d+\x00)+)",
        repl,
        sql,
    )
    sql = re.sub(
        base + r"\s*\?\s*(\x00\d+\x00)",
        r"(get_json_object(\1, concat('$.', trim(BOTH '''' FROM \2))) IS NOT NULL)",
        sql,
    )
    return sql


def _rewrite_any_string_array(sql: str, literals: list[str]) -> str:
    """x = ANY('{a,b,c}') → x IN ('a','b','c')  (B10)."""

    def repl(m: re.Match) -> str:
        expr, ph = m.group(1), m.group(2)
        lit = literals[int(ph.strip("\x00"))]
        body = lit[1:-1]  # strip quotes
        if not (body.startswith("{") and body.endswith("}")):
            return m.group(0)
        items = [v.strip() for v in body[1:-1].split(",") if v.strip()]
        quoted = ", ".join("'" + v.strip('"') + "'" for v in items)
        return f"{expr} IN ({quoted})"

    return re.sub(
        rf"({_CASTABLE})\s*=\s*ANY\s*\(\s*(\x00\d+\x00)\s*\)",
        repl,
        sql,
        flags=re.IGNORECASE,
    )


def _rewrite_eq_brace_array(sql: str, literals: list[str]) -> str:
    """``expr = '{1,2}'`` (pg array-literal equality, integer elements) →
    ``expr = from_json('[1,2]', 'array<bigint>')``. psql 15's \\d policy
    query does ``pol.polroles = '{0}'`` against an oid[] column; Spark has
    no string→array coercion, so the brace literal must become a typed
    array. Digits-only contents keep the rewrite off genuine string
    comparisons (a string column compared to a typed array then fails
    analysis loudly instead of silently mismatching)."""

    def repl(m: re.Match) -> str:
        expr, op, ph = m.group(1), m.group(2), m.group(3)
        lit = literals[int(ph.strip("\x00"))]
        body = lit[1:-1]
        if not (body.startswith("{") and body.endswith("}")):
            return m.group(0)
        items = [v.strip() for v in body[1:-1].split(",") if v.strip()]
        if not items or not all(re.fullmatch(r"\d+", v) for v in items):
            return m.group(0)
        arr = f"from_json('[{','.join(items)}]', 'array<bigint>')"
        return f"{expr} {op} {arr}"

    return re.sub(
        rf"({_CASTABLE})\s*(=|<>|!=)\s*(\x00\d+\x00)",
        repl,
        sql,
    )


_RENAMED_FUNCS = (
    "to_char", "jsonb_object_agg", "json_object_agg", "json_build_object",
    "jsonb_build_object", "json_array_elements", "jsonb_array_elements",
    "jsonb_pretty", "jsonb_array_length", "jsonb_extract_path_text",
    "row_to_json", "string_to_array", "array_to_string", "array_upper",
    "array_length", "strpos",
)
_BAL2 = r"(?:[^()]|\((?:[^()]|\([^()]*\))*\))*"


def _alias_renamed_funcs(sql: str) -> str:
    """pg names an unaliased select item after its function (B15); later
    rewrites rename these functions, so pin the pg name with an explicit
    alias while the original spelling is still visible. Only fires when the
    call is itself a whole select-list item with no alias."""
    for fn in _RENAMED_FUNCS:
        sql = re.sub(
            rf"(SELECT\s+|,\s*)({fn}\s*\({_BAL2}\))"
            rf"(?=\s*(?:,|FROM\b|WHERE\b|GROUP\b|ORDER\b|LIMIT\b|UNION\b|;|\s*$))",
            rf"\1\2 AS {fn}",
            sql,
            flags=re.IGNORECASE,
        )
    return sql


def _rewrite_ref_funcs(sql: str, literals: list[str]) -> str:
    """Literal-aware remaps mirroring reference macros the generic function
    table can't express (query_remapper_function.go:17-72)."""

    def _lit(ph: str) -> str:
        return literals[int(ph.strip("\x00"))][1:-1]  # strip quotes

    def _new_ph(text: str) -> str:
        literals.append("'" + text.replace("'", "''") + "'")
        return f"\x00{len(literals) - 1}\x00"

    # jsonb_pretty('…'::jsonb) — constant-fold literal args to pg/DuckDB's
    # 4-space pretty form
    def pretty(m: re.Match) -> str:
        import json as _json

        try:
            return _new_ph(_json.dumps(_json.loads(_lit(m.group(1))), indent=4))
        except Exception:  # noqa: BLE001 — non-JSON literal: leave as-is
            return m.group(0)

    sql = re.sub(
        r"jsonb_pretty\s*\(\s*(\x00\d+\x00)\s*(?:::\s*jsonb?)?\s*\)",
        pretty,
        sql,
        flags=re.IGNORECASE,
    )
    # '…'::jsonb / ::json literal casts normalize to compact JSON (DuckDB's
    # JSON type renders compact; pg jsonb also normalizes)
    def compact(m: re.Match) -> str:
        import json as _json

        try:
            return _new_ph(
                _json.dumps(_json.loads(_lit(m.group(1))), separators=(",", ":"))
            )
        except Exception:  # noqa: BLE001
            return m.group(1)

    sql = re.sub(r"(\x00\d+\x00)\s*::\s*JSONB\b", compact, sql, flags=re.IGNORECASE)
    # jsonb_extract_path_text(x, 'k1'[, 'k2'…]) / (x, VARIADIC ARRAY['k'])
    def extract_path(m: re.Match) -> str:
        src = m.group(1)
        keys = re.findall(r"\x00\d+\x00", m.group(2))
        path = "$." + ".".join(_lit(k) for k in keys)
        return f"get_json_object({src}, {_new_ph(path)})"

    sql = re.sub(
        r"jsonb?_extract_path_text\s*\(\s*([^,()]+?)\s*,\s*"
        r"((?:VARIADIC\s+)?(?:ARRAY\s*\[|array\s*\()?\s*\x00\d+\x00"
        r"(?:\s*,\s*\x00\d+\x00)*\s*[\]\)]?)\s*\)",
        extract_path,
        sql,
        flags=re.IGNORECASE,
    )
    # array_to_string('[1, 2, 3]', sep): string-literal first arg is parsed
    # as a JSON array (DuckDB's implicit VARCHAR→LIST cast)
    def a2s_literal(m: re.Match) -> str:
        if not _lit(m.group(1)).lstrip().startswith("["):
            return m.group(0)
        return f"array_join(from_json({m.group(1)}, 'array<string>'),"

    sql = re.sub(
        r"array_to_string\s*\(\s*(\x00\d+\x00)\s*,",
        a2s_literal,
        sql,
        flags=re.IGNORECASE,
    )
    # 'ns.func'::regproc — pg renders regproc without the namespace
    sql = re.sub(
        r"(\x00\d+\x00)\s*::\s*(?:pg_catalog\s*\.\s*)?regproc\b",
        lambda m: _new_ph(_lit(m.group(1)).rsplit(".", 1)[-1]),
        sql,
        flags=re.IGNORECASE,
    )
    # json_build_object with literal keys: emit keys in sorted order (DuckDB's
    # json_object sorts keys; pg clients see that ordering from the reference)
    def build_sorted(m: re.Match) -> str:
        args = _split_top_level(m.group(2))
        if len(args) % 2 or not all(
            re.fullmatch(r"\x00\d+\x00", args[i].strip()) for i in range(0, len(args), 2)
        ):
            return m.group(0)
        pairs = sorted(
            (args[i].strip(), args[i + 1].strip()) for i in range(0, len(args), 2)
        )
        pairs.sort(key=lambda kv: _lit(kv[0]))
        inner = ", ".join(f"{k}, {v}" for k, v in pairs)
        return f"{m.group(1)}({inner})"

    sql = re.sub(
        rf"(jsonb?_build_object)\s*\(({_BAL2})\)",
        build_sorted,
        sql,
        flags=re.IGNORECASE,
    )
    # unaliased select-item `x -> 'k'` / `x ->> 'k'`: the reference names the
    # output column `<col>_<key>` (its remapper's generated alias); pin it
    # before the operator rewrite erases the spelling
    def json_item_alias(m: re.Match) -> str:
        key = re.sub(r"\W", "_", _lit(m.group(4)))
        return f"{m.group(1)}{m.group(2)} AS {m.group(3)}_{key}"

    sql = re.sub(
        rf"(SELECT\s+|,\s*)(({_IDENT})\s*(?:::\s*jsonb?\s*)?->>?\s*(\x00\d+\x00))"
        rf"(?=\s*(?:,|FROM\b))",
        json_item_alias,
        sql,
        flags=re.IGNORECASE,
    )
    # pg array literal cast to an array type: '{a,b}'::text[] → array('a','b')
    def pg_array_cast(m: re.Match) -> str:
        body = _lit(m.group(1))
        if not (body.startswith("{") and body.endswith("}")):
            return m.group(0)
        items = [v.strip().strip('"') for v in body[1:-1].split(",") if v.strip()]
        if m.group(2).lower() in ("int2", "int4", "int8", "int", "integer", "bigint"):
            return "array(" + ", ".join(items) + ")"
        return "array(" + ", ".join(_new_ph(v) for v in items) + ")"

    sql = re.sub(
        r"(\x00\d+\x00)\s*::\s*(?:pg_catalog\s*\.\s*)?"
        r"(text|varchar|int2|int4|int8|int|integer|bigint|name)\s*\[\s*\]",
        pg_array_cast,
        sql,
        flags=re.IGNORECASE,
    )
    # FORMAT(…)::regclass — a computed (non-literal) regclass stays
    # unresolved → NULL, exactly like the reference, whose parse-time
    # regclass rewrite only folds constants (parser_type_cast.go:90-206)
    sql = re.sub(
        r"(FORMAT\s*\((?:[^()]|\([^()]*\))*\))\s*::\s*regclass\b",
        r"CAST(NULL AS BIGINT)",
        sql,
        flags=re.IGNORECASE,
    )
    sql = _rewrite_values_table(sql)
    return sql


def _rewrite_values_table(sql: str) -> str:
    """Column-aliased derived-table VALUES → UNION ALL of SELECTs.

    ``(VALUES (r1…), (r2…)) t(c1, c2)`` becomes ``(SELECT r1c1 AS c1, …
    UNION ALL SELECT r2c1 AS c1, …) t``. pg allows arbitrary expressions in
    VALUES rows; Spark's inline tables reject anything it can't constant-
    fold at analysis time (NULLIF, COALESCE over it, subqueries such as the
    ``::regclass`` rewrite's scalar lookup), so every aliased VALUES table
    is rewritten. Depth-aware scan, any expression nesting (the previous
    regex capped at two paren levels and silently skipped deeper rows)."""
    pat = re.compile(r"\(\s*VALUES\s*\(", re.IGNORECASE)
    pos = 0
    while True:
        m = pat.search(sql, pos)
        if not m:
            return sql
        rows = []
        i = m.end() - 1  # at the '(' opening the first row
        k = i
        ok = True
        while True:
            depth, j = 0, i
            while j < len(sql):
                if sql[j] == "(":
                    depth += 1
                elif sql[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if j >= len(sql):
                ok = False
                break
            rows.append(sql[i + 1:j])
            k = j + 1
            while k < len(sql) and sql[k].isspace():
                k += 1
            if k < len(sql) and sql[k] == ",":
                k += 1
                while k < len(sql) and sql[k].isspace():
                    k += 1
                if k < len(sql) and sql[k] == "(":
                    i = k
                    continue
                ok = False
            break
        if not ok or k >= len(sql) or sql[k] != ")":
            pos = m.end()
            continue
        am = re.match(r"\s*(?:AS\s+)?(\w+)\s*\(([^()]*)\)", sql[k + 1:],
                      re.IGNORECASE)
        if not am:
            pos = m.end()
            continue
        alias = am.group(1)
        cols = [c.strip() for c in am.group(2).split(",")]
        split_rows = [_split_top_level(r) for r in rows]
        if any(len(vals) != len(cols) for vals in split_rows):
            pos = m.end()
            continue
        selects = " UNION ALL ".join(
            "SELECT " + ", ".join(
                f"{v.strip()} AS {c}" for v, c in zip(vals, cols)
            )
            for vals in split_rows
        )
        replacement = f"({selects}) {alias}"
        end = k + 1 + am.end()
        sql = sql[:m.start()] + replacement + sql[end:]
        pos = m.start() + len(replacement)


def _split_top_level(s: str) -> list[str]:
    """Split a comma-separated arg list at paren/bracket depth 0."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur or out:
        out.append("".join(cur))
    return out


def _rewrite_functions(sql: str) -> str:
    # encode(sha256(x), 'hex'[::text]) → sha2(x, 256): placeholder is the
    # 'hex' literal, optionally cast (clients send both spellings)
    sql = re.sub(
        r"encode\s*\(\s*sha256\s*\(([^()]*)\)\s*,\s*\x00\d+\x00\s*(?:::\s*\w+)?\s*\)",
        r"sha2(\1, 256)",
        sql,
        flags=re.IGNORECASE,
    )
    # jsonb_array_length → Spark's builtin (reference macro maps the same,
    # query_remapper_function.go:45)
    sql = re.sub(
        r"\bjsonb_array_length\s*\(", "json_array_length(", sql, flags=re.IGNORECASE
    )
    # agg FILTER on rewritten-to-composite aggregates: jsonb_agg(x) FILTER
    # (WHERE c) — Spark's FILTER clause can't attach to the to_json wrapper,
    # so fold the predicate into the collected expression (collect_list skips
    # NULLs, which is exactly pg's FILTER semantics here)
    def jsonb_agg_filter(m: re.Match) -> str:
        elem, cond = m.group(1), m.group(2)
        if "->>" not in elem and "->" in elem:
            # the element is already JSON text (`->` keeps quoting) —
            # assemble the array textually instead of double-encoding
            return (f"concat('[', concat_ws(',', "
                    f"collect_list(CASE WHEN ({cond}) THEN ({elem}) END)), ']')")
        # the space after to_json( keeps this already-balanced form out of
        # _balance_double_open's "to_json(collect_list(" marker below
        return f"to_json( collect_list(CASE WHEN ({cond}) THEN ({elem}) END))"

    sql = re.sub(
        rf"\b(?:jsonb_agg|json_agg)\s*\(({_BAL2})\)\s*FILTER\s*\(\s*WHERE\s+({_BAL2})\)",
        jsonb_agg_filter,
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(r"\bformat\s*\(", "format_string(", sql, flags=re.IGNORECASE)
    sql = re.sub(r"\bgen_random_uuid\s*\(\s*\)", "uuid()", sql, flags=re.IGNORECASE)
    sql = re.sub(r"\brandom\s*\(\s*\)", "rand()", sql, flags=re.IGNORECASE)
    sql = re.sub(r"\bsetseed\s*\([^)]*\)", "CAST(NULL AS STRING)", sql,
                 flags=re.IGNORECASE)
    # json[b]_build_object('k', v, …) → to_json(named_struct('k', v, …)):
    # the alternating name/value argument shape is identical
    sql = re.sub(
        r"\bjsonb?_build_object\s*\(", "to_json(named_struct(", sql,
        flags=re.IGNORECASE,
    )
    sql = _balance_double_open(sql, "to_json(named_struct(")
    # json[b]_object_agg(k, v) → JSON object from grouped key/value pairs
    sql = re.sub(
        r"\bjsonb?_object_agg\s*\(([^,()]+),\s*([^()]+?)\)",
        r"to_json(map_from_entries(collect_list(struct(CAST(\1 AS STRING), \2))))",
        sql,
        flags=re.IGNORECASE,
    )
    # row_to_json(t) → the row rendered as a JSON object
    sql = re.sub(
        rf"\brow_to_json\s*\(\s*({_IDENT})\s*\)", r"to_json(struct(\1.*))",
        sql, flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"\b(?:jsonb_agg|json_agg)\s*\(", "to_json(collect_list(", sql, flags=re.IGNORECASE
    )
    # close the extra paren opened by the collect_list rewrite
    sql = _balance_double_open(sql, "to_json(collect_list(")
    # pg ORDER-inside-agg: string_agg(x, ',' ORDER BY y) -> Spark's
    # string_agg(x, ',') WITHIN GROUP (ORDER BY y)
    sql = re.sub(
        r"\bstring_agg\s*\(([^,()]+),\s*(\x00\d+\x00)\s+ORDER\s+BY\s+([^()]+?)\s*\)",
        r"string_agg(\1, \2) WITHIN GROUP (ORDER BY \3)",
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(r"\bstring_agg\s*\(", "concat_ws_agg_placeholder(", sql, flags=re.IGNORECASE)
    sql = sql.replace("concat_ws_agg_placeholder(", "string_agg(")  # Spark 4 has string_agg
    # pg ordered aggregate: array_agg(x ORDER BY y [DESC]) — Spark's
    # array_agg/collect_list takes no ORDER BY, so sort a (key, value) struct
    # array and project the values back out (array_sort on structs compares
    # fields left-to-right).
    def array_agg_ordered(m: re.Match) -> str:
        val, key, desc = m.group(1).strip(), m.group(2).strip(), m.group(3)
        sorted_ = f"array_sort(collect_list(struct({key} AS _o, {val} AS _v)))"
        if desc:
            sorted_ = f"reverse({sorted_})"
        return f"transform({sorted_}, s -> s._v)"

    sql = re.sub(
        r"\barray_agg\s*\(([^,()]+?)\s+ORDER\s+BY\s+([^(),]+?)(\s+DESC)?\s*\)",
        array_agg_ordered,
        sql,
        flags=re.IGNORECASE,
    )
    _arg = r"((?:[^(),]|\((?:[^()]|\([^()]*\))*\))+)"
    sql = re.sub(rf"\barray_upper\s*\(\s*{_arg}\s*,\s*1\s*\)", r"size(\1)", sql, flags=re.IGNORECASE)
    sql = re.sub(r"\barray_to_string\s*\(", "array_join(", sql, flags=re.IGNORECASE)
    sql = re.sub(rf"\barray_length\s*\(\s*{_arg}\s*,\s*1\s*\)", r"size(\1)", sql, flags=re.IGNORECASE)
    # pg strpos(str, sub) == Spark instr(str, sub) (both 1-based, 0 = absent)
    sql = re.sub(r"\bstrpos\s*\(", "instr(", sql, flags=re.IGNORECASE)
    # pg starts_with (pg11+) == Spark startswith
    sql = re.sub(r"\bstarts_with\s*\(", "startswith(", sql, flags=re.IGNORECASE)
    # pg regexp_split_to_array == Spark split (both regex, both keep empties)
    sql = re.sub(r"\bregexp_split_to_array\s*\(", "split(", sql,
                 flags=re.IGNORECASE)
    # quote_ident: pg quotes only when necessary (lowercase identifiers pass
    # through bare) — but ALSO quotes any keyword that is not in pg's
    # "unreserved" category, regardless of case shape (ruleutils.c
    # quote_identifier: safe chars AND ScanKeywordCategory == UNRESERVED);
    # quote_literal doubles embedded quotes
    sql = re.sub(
        r"\bquote_ident\s*\(((?:[^()]|\([^()]*\))*)\)",
        rf"""(CASE WHEN (\1) RLIKE '^[a-z_][a-z0-9_]*$' """
        rf"""AND (\1) NOT IN ({_QI_KEYWORDS_SQL}) THEN (\1) """
        r"""ELSE concat('"', replace((\1), '"', '""'), '"') END)""",
        sql, flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"\bquote_literal\s*\(((?:[^()]|\([^()]*\))*)\)",
        r"concat(char(39), replace(CAST((\1) AS STRING), char(39), "
        r"concat(char(39), char(39))), char(39))",
        sql, flags=re.IGNORECASE,
    )
    sql = re.sub(r"\bpg_catalog\s*\.\s*", "", sql, flags=re.IGNORECASE)
    return sql


# pg to_char date tokens → Java SimpleDateFormat (longest match first).
_TO_CHAR_TOKENS = [
    ("HH24", "HH"), ("HH12", "hh"), ("YYYY", "yyyy"), ("Month", "MMMM"),
    ("MONTH", "MMMM"), ("Mon", "MMM"), ("MON", "MMM"), ("Day", "EEEE"),
    ("DAY", "EEEE"), ("Dy", "EEE"), ("DY", "EEE"), ("DDD", "DDD"),
    ("DD", "dd"), ("MM", "MM"), ("YY", "yy"), ("MI", "mm"), ("SS", "ss"),
    ("MS", "SSS"), ("US", "SSSSSS"), ("AM", "a"), ("PM", "a"),
    ("am", "a"), ("pm", "a"), ("HH", "hh"), ("TZ", "z"), ("WW", "ww"),
    ("Q", "Q"),
]


def _to_char_java_pattern(pg_pattern: str) -> str | None:
    """Translate a pg to_char date/time pattern to a Java pattern; None when
    the pattern has no date tokens (numeric to_char — not supported)."""
    src = pg_pattern.replace("FM", "")
    out, i, n, hit = [], 0, len(src), False
    while i < n:
        if src[i] == '"':  # pg literal chunk "text" → Java 'text'
            j = src.find('"', i + 1)
            j = n if j < 0 else j
            out.append("'" + src[i + 1:j] + "'")
            i = j + 1
            continue
        for tok, java in _TO_CHAR_TOKENS:
            if src.startswith(tok, i):
                out.append(java)
                i += len(tok)
                hit = True
                break
        else:
            out.append(src[i])
            i += 1
    return "".join(out) if hit else None


def _rewrite_to_char(sql: str, literals: list[str]) -> str:
    """to_char(expr, 'YYYY-MM-DD…') → date_format(expr, 'yyyy-MM-dd…')."""
    _arg = r"((?:[^(),]|\((?:[^()]|\([^()]*\))*\))+)"

    def repl(m: re.Match) -> str:
        pattern = literals[int(m.group(2))].strip("'")
        java = _to_char_java_pattern(pattern)
        if java is None:
            return m.group(0)  # numeric to_char: leave (and fail) as-is
        literals.append("'" + java + "'")
        return f"date_format({m.group(1)}, \x00{len(literals) - 1}\x00)"

    return re.sub(
        rf"\bto_char\s*\(\s*{_arg}\s*,\s*\x00(\d+)\x00\s*\)",
        repl, sql, flags=re.IGNORECASE,
    )


def _rewrite_string_to_array(sql: str, literals: list[str]) -> str:
    """pg string_to_array(s, delim) → Spark split(s, delim) — Spark's split
    takes a REGEX, so a literal delimiter gets its metacharacters escaped
    (pg splits on the plain string)."""

    def repl(m: re.Match) -> str:
        expr, ph = m.group(1), m.group(2)
        lit = literals[int(ph.strip("\x00"))]
        delim = lit[1:-1].replace("''", "'")
        # regex-escape for split(); _unshield doubles backslashes for
        # Spark's literal parser (single escaping point for all literals)
        literals.append(
            "'" + re.escape(delim).replace("'", "''") + "'")
        return f"split({expr}, \x00{len(literals) - 1}\x00)"

    return re.sub(
        r"\bstring_to_array\s*\(\s*((?:[^(),\x00]|\x00\d+\x00)+)\s*,\s*(\x00\d+\x00)\s*\)",
        repl,
        sql,
        flags=re.IGNORECASE,
    )


def _balance_double_open(sql: str, marker: str) -> str:
    """After rewriting f( → g(h(, add one ')' at the matching close paren."""
    out = []
    i = 0
    while True:
        j = sql.find(marker, i)
        if j < 0:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        out.append(marker)
        depth = 2
        k = j + len(marker)
        while k < len(sql) and depth > 1:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        # k points just past the paren that closed the original '(' (now
        # collect_list's) — add the close for the wrapping to_json(
        out.append(sql[j + len(marker):k])
        out.append(")")
        i = k
    return "".join(out)


def _rewrite_pg_macros(sql: str) -> str:
    """psql-introspection macro emulation (B7 breadth — the reference installs
    these as engine macros, query_remapper_function.go:14-112). Runs on the
    string-shielded text; inserted literals survive unshielding because only
    \\x00N\\x00 placeholders are resolved."""
    from bemidb_spark.pgcompat.catalog_views import PG_USER, format_type_case_sql

    # set_config(name, value, is_local) returns the value (reference macro,
    # query_remapper_function.go:35) — capture before the generic folds
    sql = re.sub(
        r"set_config\s*\(\s*[^,()]+,\s*([^,()]+),\s*[^()]+\)",
        r"\1",
        sql,
        flags=re.IGNORECASE,
    )
    # pg's `name` type is char-subscriptable from 0 (C string): pg_dump 15
    # tests `typname[0] = '_'` to detect array types. Only the name-typed
    # catalog columns are ever subscripted this way.
    sql = re.sub(
        r"\b((?:typ|rel|att|pro|nsp|con|opr)name)\s*\[\s*(\d+)\s*\]",
        lambda m: f"substring({m.group(1)}, {int(m.group(2)) + 1}, 1)",
        sql,
    )
    simple = {
        r"pg_get_userbyid\s*\([^()]*\)": f"'{PG_USER}'",
        r"pg_table_is_visible\s*\([^()]*\)": "true",
        r"pg_function_is_visible\s*\([^()]*\)": "true",
        r"pg_(?:type|operator|opclass|opfamily|conversion|collation|"
        r"ts_config|ts_dict|ts_parser|ts_template|statistics_obj)"
        r"_is_visible\s*\([^()]*\)": "true",
        r"pg_get_expr\s*\([^()]*\)": "CAST(NULL AS STRING)",
        r"pg_get_indexdef\s*\([^()]*\)": "''",
        r"pg_get_constraintdef\s*\([^()]*\)": "''",
        r"pg_get_ruledef\s*\([^()]*\)": "''",
        r"pg_get_triggerdef\s*\([^()]*\)": "''",
        r"pg_get_partkeydef\s*\([^()]*\)": "CAST(NULL AS STRING)",
        r"pg_get_statisticsobjdef_columns\s*\([^()]*\)": "CAST(NULL AS STRING)",
        r"pg_get_viewdef\s*\([^()]*\)": "CAST(NULL AS STRING)",
        r"pg_get_function_identity_arguments\s*\([^()]*\)": "''",
        r"pg_get_function_result\s*\([^()]*\)": "CAST(NULL AS STRING)",
        r"pg_get_function_arguments\s*\([^()]*\)": "''",
        r"pg_get_function_sqlbody\s*\([^()]*\)": "CAST(NULL AS STRING)",
        r"pg_tablespace_location\s*\([^()]*\)": "''",
        r"pg_encoding_to_char\s*\([^()]*\)": "'UTF8'",
        r"pg_cancel_backend\s*\([^()]*\)": "true",
        r"pg_relation_is_publishable\s*\([^()]*\)": "CAST(NULL AS BOOLEAN)",
        # acldefault(objtype, owner) → NULL: privileges are at their
        # defaults for every object here (pg_dump 15 calls this for each
        # collected object and diffs it against the stored acl). STRING, not
        # ARRAY, so pg_dump's `CASE WHEN … THEN acldefault(…) ELSE '{}' END`
        # type-unifies. Inner args may hold nested CASE parens.
        r"acldefault\s*\((?:[^()]|\([^()]*\))*\)": "CAST(NULL AS STRING)",
        r"has_database_privilege\s*\([^()]*\)": "true",
        r"has_schema_privilege\s*\([^()]*\)": "true",
        r"has_table_privilege\s*\([^()]*\)": "true",
        r"pg_(?:total_relation|relation|table|indexes)_size\s*\([^()]*\)": "CAST(0 AS BIGINT)",
        r"pg_size_pretty\s*\((?:[^()]|\([^()]*\))*\)": "'0 bytes'",
        r"(?:obj|col|shobj)_description\s*\([^()]*\)": "CAST(NULL AS STRING)",
        # table alias preserves `pg_get_keywords.word`-style qualified refs
        r"pg_get_keywords\s*\(\s*\)": "pg_keywords_view AS pg_get_keywords",
    }
    for pat, repl in simple.items():
        sql = re.sub(pat, repl, sql, flags=re.IGNORECASE)
    # quote_ident: quote only when the identifier needs it (pg semantics,
    # incl. non-unreserved keywords — see _QI_KEYWORDS_SQL).
    sql = re.sub(
        r"quote_ident\s*\(([^()]+)\)",
        f"(CASE WHEN \\1 RLIKE '^[a-z_][a-z0-9_]*$'"
        f" AND \\1 NOT IN ({_QI_KEYWORDS_SQL}) THEN \\1"
        " ELSE concat('\"', replace(\\1, '\"', '\"\"'), '\"') END)",
        sql,
        flags=re.IGNORECASE,
    )
    # format_type(oid, typmod) -> display name via inline CASE over the oid;
    # pgvector's 16700 renders its typmod as the dim count (vector(3)).
    def _format_type(m: re.Match) -> str:
        oid, typmod = m.group(1), m.group(2)
        base = format_type_case_sql(oid)
        return (
            f"(CASE WHEN CAST({oid} AS BIGINT) = 16700 "
            f"AND CAST({typmod} AS INT) > 0 "
            f"THEN concat('vector(', CAST({typmod} AS INT), ')') "
            f"ELSE {base} END)"
        )

    sql = re.sub(
        r"format_type\s*\(([^,()]+),\s*([^()]+)\)",
        _format_type,
        sql,
        flags=re.IGNORECASE,
    )
    # aclexplode in FROM position: a set-returning call over NULL acls
    # yields zero rows (pg semantics; we model a single superuser with NULL
    # acls)
    sql = re.sub(
        r"\b(FROM|JOIN|,)\s*aclexplode\s*\([^()]*\)",
        r"\1 (SELECT CAST(NULL AS BIGINT) AS grantor, "
        r"CAST(NULL AS BIGINT) AS grantee, "
        r"CAST(NULL AS STRING) AS privilege_type, "
        r"CAST(NULL AS BOOLEAN) AS is_grantable WHERE FALSE)",
        sql,
        flags=re.IGNORECASE,
    )
    # aclexplode(acl) -> NULL grant struct (we model a single superuser with
    # NULL acls, like the reference's json(NULL) macro result) — composite
    # field access (d).grantee then yields NULL per field.
    sql = re.sub(
        r"aclexplode\s*\([^()]*\)",
        "CAST(NULL AS STRUCT<grantee: STRING, grantor: STRING, "
        "is_grantable: STRING, privilege_type: STRING>)",
        sql,
        flags=re.IGNORECASE,
    )
    # (information_schema._pg_expandarray(arr)).x / .n — the composite-access
    # form psql's \d index queries use: a per-element generator in the select
    # list (pg: setof (x, n); n is the 1-based position).
    def expand_field(m: re.Match) -> str:
        arr, field, alias = m.group(1), m.group(2).lower(), m.group(3)
        gen = (f"explode({arr})" if field == "x"
               else f"explode(transform({arr}, (_v, _i) -> CAST(_i + 1 AS INT)))")
        return f"{gen}{alias or ' AS ' + field}"

    sql = re.sub(
        r"\(\s*(?:information_schema\s*\.\s*)?_pg_expandarray\s*"
        r"\(((?:[^()]|\([^()]*\))+)\)\s*\)\s*\.\s*(x|n)\b(\s+AS\s+\w+)?",
        expand_field,
        sql,
        flags=re.IGNORECASE,
    )
    # information_schema._pg_expandarray(arr) -> (x, n) rows, n 1-based.
    sql = re.sub(
        r"(?:information_schema\s*\.\s*)?_pg_expandarray\s*\(((?:[^()]|\([^()]*\))+)\)",
        r"(SELECT col AS x, CAST(pos + 1 AS INT) AS n "
        r"FROM (SELECT posexplode(\1) AS (pos, col)))",
        sql,
        flags=re.IGNORECASE,
    )
    # pg composite-field access `(d).field` -> struct access `d.field`
    sql = re.sub(rf"\(\s*({_IDENT})\s*\)\s*\.\s*({_IDENT})", r"\1.\2", sql)
    # COLLATE clauses have no Spark equivalent; our collation is binary.
    sql = re.sub(
        rf"\s+COLLATE\s+(?:pg_catalog\.)?(?:{_IDENT}|`[^`]*`|\x00\d+\x00)",
        "", sql, flags=re.IGNORECASE,
    )
    return sql


def _rewrite_array_sublink(sql: str) -> str:
    """ARRAY(SELECT x FROM ... ORDER BY x) -> array_sort(collect_list(x))
    scalar subquery (the sorted sublink form clients actually send; pg's
    ARRAY sublink, parser reference query_remapper_select.go ARRAY handling).
    The general ordered form (ORDER BY a different key) sorts a (key, value)
    struct array and projects the values back out; an unordered sublink is a
    plain collect_list."""
    def _top_level_find(text: str, pat: re.Pattern) -> re.Match | None:
        depth = 0
        for m in pat.finditer(text):
            depth = 0
            for ch in text[:m.start()]:
                depth += {"(": 1, ")": -1}.get(ch, 0)
            if depth == 0:
                return m
        return None

    from_pat = re.compile(r"\sFROM\s", re.IGNORECASE)
    order_pat = re.compile(r"\sORDER\s+BY\s", re.IGNORECASE)
    while True:
        # rightmost candidate is always innermost — rewriting it first lets
        # arbitrarily nested sublinks (psql \dp nests ARRAY inside ARRAY)
        # resolve bottom-up
        cands = list(re.finditer(r"ARRAY\s*\(\s*SELECT\s", sql, re.IGNORECASE))
        if not cands:
            return sql
        m = cands[-1]
        open_paren = sql.index("(", m.start())
        depth, j = 1, open_paren + 1
        while j < len(sql) and depth:
            depth += {"(": 1, ")": -1}.get(sql[j], 0)
            j += 1
        body = sql[open_paren + 1:j - 1].strip()[len("SELECT"):].strip()
        fm = _top_level_find(body, from_pat)
        if fm is None:
            return sql  # malformed; leave for Spark to report
        expr, rest = body[:fm.start()].strip(), body[fm.end():].strip()
        om = _top_level_find(rest, order_pat)
        if om is not None:
            key = rest[om.end():].strip().rstrip(";").strip()
            rest = rest[:om.start()].rstrip()
            key = re.sub(r"\s+(ASC|DESC)\s*$", "", key, flags=re.IGNORECASE)
            if key == "1" or key.lower() == expr.lower():
                repl = (f"(SELECT array_sort(collect_list({expr})) "
                        f"FROM {rest})")
            else:
                repl = (f"(SELECT transform(array_sort(collect_list("
                        f"struct({key} AS _o, {expr} AS _v))), s -> s._v) "
                        f"FROM {rest})")
        else:
            repl = f"(SELECT collect_list({expr}) FROM {rest})"
        sql = sql[:m.start()] + repl + sql[j:]


def _rewrite_array_literal(sql: str) -> str:
    """pg ``ARRAY[a, b]`` constructor → Spark ``array(a, b)`` (bracket-matched
    so nested ARRAY[ARRAY[..]] and subscripts inside work)."""
    while True:
        m = re.search(r"\bARRAY\s*\[", sql, re.IGNORECASE)
        if not m:
            return sql
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "[":
                depth += 1
            elif sql[i] == "]":
                depth -= 1
            i += 1
        sql = sql[:m.start()] + "array(" + sql[m.end():i - 1] + ")" + sql[i:]


_SRF_ARGS = r"((?:[^()\x00]|\x00\d+\x00|\((?:[^()]|\([^()]*\))*\))*)"
# a bare (no AS) alias after a FROM-position SRF must not swallow the next
# clause keyword: `SELECT x, unnest(c) FROM t` puts a comma before unnest,
# which the FROM-form regexes treat as a lateral-style source — the word
# FROM itself must then not parse as the alias
_SRF_NOKW = (r"(?!FROM\b|JOIN\b|WHERE\b|ON\b|GROUP\b|ORDER\b|LIMIT\b|"
             r"UNION\b|INTERSECT\b|EXCEPT\b|HAVING\b|CROSS\b|LEFT\b|"
             r"RIGHT\b|INNER\b|FULL\b|USING\b|AS\b|WITH\b|OFFSET\b|"
             r"FETCH\b)")


_JSON_TABLE_COL_RE = re.compile(
    r'^\s*"?(\w+)"?\s+(?:FOR\s+ORDINALITY|([\w\s()\[\]]+?)\s+'
    r"PATH\s+(\x00\d+\x00|'[^']*'))\s*$",
    re.IGNORECASE,
)


_JT_ALIAS_STOPWORDS = frozenset(
    "where on join left right inner cross full outer natural using group "
    "order limit offset union except intersect having fetch for window "
    "when returning qualify".split()
)


def _rewrite_json_table(sql: str, literals: list[str]) -> str:
    """pg17 ``JSON_TABLE(expr, 'rowpath' COLUMNS (...)) [AS] alias`` → an
    exploded variant derived table.

    Supported grammar (the shape clients actually write): a row path of
    ``$`` / ``$[*]`` / ``$.path[*]``, and COLUMNS entries of
    ``name type PATH '$.field'`` or ``name FOR ORDINALITY``. The row set
    becomes ``posexplode(from_json(.... 'array<variant>'))`` — one JVM-side
    generator, each column a typed ``variant_get`` — and the derived table
    is LATERAL so the expr may reference tables to its left (pg auto-
    LATERALs JSON_TABLE). NESTED PATH / EXISTS / DEFAULT clauses are out of
    scope and left untouched (Spark then reports the unsupported syntax)."""
    def lit_text(tok: str) -> str:
        ph = re.fullmatch(r"\x00(\d+)\x00", tok)
        raw = literals[int(ph.group(1))] if ph else tok
        return raw[1:-1].replace("''", "'")

    while True:
        m = re.search(r"\b(FROM|JOIN|,)\s*(?:LATERAL\s+)?JSON_TABLE\s*\(",
                      sql, re.IGNORECASE)
        if not m:
            return sql
        open_p = sql.index("(", m.end() - 1)
        depth, i = 0, open_p
        while i < len(sql):
            depth += {"(": 1, ")": -1}.get(sql[i], 0)
            i += 1
            if depth == 0:
                break
        inner = sql[open_p + 1:i - 1]
        am = re.match(r"\s*(AS\s+)?([A-Za-z_]\w*)?", sql[i:], re.IGNORECASE)
        cand = am.group(2)
        # pg17 allows alias-less JSON_TABLE: a bare following keyword (WHERE,
        # JOIN, GROUP, ...) is NOT the alias unless preceded by AS (ADVICE r7)
        if cand and not am.group(1) and cand.lower() in _JT_ALIAS_STOPWORDS:
            cand = None
        alias = cand or "json_table"
        tail_at = i + (am.end() if cand else 0)
        # inner = <expr> , <'rowpath'> COLUMNS ( <col list> )
        cm = re.match(
            r"^(.*?),\s*(\x00\d+\x00|'[^']*')\s+COLUMNS\s*\((.*)\)\s*$",
            inner, re.IGNORECASE | re.DOTALL,
        )
        if not cm:
            return sql  # unsupported shape: leave for Spark to report
        expr, rowpath = cm.group(1).strip(), lit_text(cm.group(2))
        if rowpath in ("$", "$[*]"):
            base = expr
        elif rowpath.endswith("[*]"):
            base = f"get_json_object({expr}, '{rowpath[:-3]}')"
        else:
            base = f"get_json_object({expr}, '{rowpath}')"
        rows = (f"from_json({base}, 'array<variant>')" if rowpath.endswith("[*]")
                else f"array(from_json({base}, 'variant'))")
        cols = []
        for item in cm.group(3).split(","):
            im = _JSON_TABLE_COL_RE.match(item)
            if not im:
                return sql
            name = im.group(1)
            if im.group(2) is None:  # FOR ORDINALITY
                cols.append(f"CAST(_jt_pos + 1 AS BIGINT) AS {name}")
            else:
                pg_t = re.sub(r"\(.*", "", im.group(2).strip().lower()).strip()
                stype = {
                    "int": "int", "integer": "int", "int4": "int",
                    "smallint": "smallint", "int2": "smallint",
                    "bigint": "bigint", "int8": "bigint",
                    "real": "float", "float4": "float",
                    "double": "double", "float8": "double",
                    "numeric": "decimal(38,6)", "decimal": "decimal(38,6)",
                    "boolean": "boolean", "bool": "boolean",
                    "date": "date", "timestamp": "timestamp_ntz",
                    "timestamptz": "timestamp",
                }.get(pg_t, "string")
                path = lit_text(im.group(3))
                cols.append(
                    f"variant_get(_jt_row, '{path}', '{stype}') AS {name}")
        lat = " LATERAL" if m.group(1).strip() in (",", "JOIN", "join") else ""
        derived = (
            f"{m.group(1)}{lat} (SELECT {', '.join(cols)} FROM "
            f"(SELECT posexplode({rows}) AS (_jt_pos, _jt_row))) AS {alias}"
        )
        sql = sql[:m.start()] + derived + sql[tail_at:]


_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
_ORDER_STOP_RE = re.compile(
    r"\b(LIMIT|OFFSET|FETCH|FOR|WINDOW|ROWS|RANGE|GROUPS|UNION|EXCEPT|"
    r"INTERSECT)\b",
    re.IGNORECASE,
)
_NULLS_EXPL_RE = re.compile(r"\bNULLS\s+(FIRST|LAST)\s*$", re.IGNORECASE)
_DESC_RE = re.compile(r"\b(DESC)\s*$", re.IGNORECASE)
_ASC_RE = re.compile(r"\b(ASC)\s*$", re.IGNORECASE)


def _rewrite_order_by_nulls(sql: str) -> str:
    """pg default null ordering: NULLS LAST for ASC, NULLS FIRST for DESC —
    Spark's defaults are the OPPOSITE (nulls first on ASC), so every ORDER
    BY item without an explicit NULLS clause gets pg's default appended.
    Applies at every nesting level, including window OVER(ORDER BY …)
    clauses, where the peer order feeds rank/frame results. Runs on
    shielded text (no string-literal false positives)."""
    out = sql
    while True:  # re-scan after each edit: explicit-NULLS items are
        changed = False  # skipped, so the loop terminates (idempotent)
        for m in reversed(list(_ORDER_BY_RE.finditer(out))):
            start = m.end()
            depth = 0
            end = len(out)
            i = start
            while i < len(out):
                c = out[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    if depth == 0:
                        end = i
                        break
                    depth -= 1
                elif depth == 0 and c.isalpha():
                    if _ORDER_STOP_RE.match(out, i):
                        end = i
                        break
                    while i < len(out) and (out[i].isalnum() or out[i] == "_"):
                        i += 1
                    continue
                i += 1
            segment = out[start:end]
            items, buf, d = [], [], 0
            for ch in segment:  # split top-level commas
                if ch == "(":
                    d += 1
                elif ch == ")":
                    d -= 1
                if ch == "," and d == 0:
                    items.append("".join(buf))
                    buf = []
                else:
                    buf.append(ch)
            items.append("".join(buf))
            fixed = []
            for item in items:
                body = item.rstrip()
                pad = item[len(body):]
                if (not body.strip() or _NULLS_EXPL_RE.search(body)
                        or re.search(r"\bUSING\b", body, re.IGNORECASE)):
                    fixed.append(item)
                elif _DESC_RE.search(body):
                    fixed.append(f"{body} NULLS FIRST{pad}")
                else:
                    fixed.append(f"{body} NULLS LAST{pad}")
            rebuilt = ",".join(fixed)
            if rebuilt != segment:
                out = out[:start] + rebuilt + out[end:]
                changed = True
                break
        if not changed:
            return out


def _rewrite_srf(sql: str) -> str:
    """Set-returning functions (pg's generate_series / unnest) → Spark
    generators. FROM-clause forms become inline derived tables over
    explode/posexplode; select-list forms become bare explode calls with pg's
    default output column name. WITH ORDINALITY maps to posexplode with a
    1-based ordinal (pg counts from 1, Spark pos from 0)."""

    def _is_select_list_comma(m: re.Match) -> bool:
        # `SELECT x, unnest(c) FROM t` — a comma-preceded SRF whose next
        # clause token is FROM sits in the SELECT LIST, not a lateral FROM
        # item; leave it for the select-list rewrite
        return m.group(1) == "," and re.match(
            r"\s*FROM\b", m.string[m.end():], re.IGNORECASE) is not None

    def series_from(m: re.Match) -> str:
        if _is_select_list_comma(m):
            return m.group(0)
        kw, args, alias, col = m.group(1), m.group(2), m.group(3), m.group(4)
        alias = alias or "generate_series"
        col = col or (m.group(3) or "generate_series")
        return (f"{kw} (SELECT explode(sequence({args})) AS {col}) AS {alias}")

    sql = re.sub(
        rf"\b(FROM|JOIN|,)\s*(?:pg_catalog\s*\.\s*)?generate_series\s*\({_SRF_ARGS}\)"
        rf"(?:\s+(?:AS\s+)?{_SRF_NOKW}({_IDENT})\s*(?:\(\s*({_IDENT})\s*\))?)?",
        series_from,
        sql,
        flags=re.IGNORECASE,
    )

    def unnest_from(m: re.Match) -> str:
        if _is_select_list_comma(m):
            return m.group(0)
        kw, args, ordinal = m.group(1), m.group(2), m.group(3)
        alias = m.group(4) or "unnest"
        col = m.group(5) or (m.group(4) or "unnest")
        ordcol = m.group(6) or "ordinality"
        if ordinal:
            return (
                f"{kw} (SELECT col AS {col}, CAST(pos + 1 AS BIGINT) AS {ordcol} "
                f"FROM (SELECT posexplode({args}) AS (pos, col))) AS {alias}"
            )
        return f"{kw} (SELECT explode({args}) AS {col}) AS {alias}"

    sql = re.sub(
        rf"\b(FROM|JOIN|,)\s*(?:pg_catalog\s*\.\s*)?unnest\s*\({_SRF_ARGS}\)"
        rf"(\s+WITH\s+ORDINALITY)?"
        rf"(?:\s+(?:AS\s+)?{_SRF_NOKW}({_IDENT})\s*(?:\(\s*({_IDENT})(?:\s*,\s*({_IDENT}))?\s*\))?)?",
        unnest_from,
        sql,
        flags=re.IGNORECASE,
    )
    # pg_options_to_table(text[]) → (option_name, option_value) rows; the
    # input holds 'key=value' strings (pg reloptions/fdwoptions encoding).
    # pg_dump 15 renders every options column through this SRF.
    def options_from(m: re.Match) -> str:
        if _is_select_list_comma(m):
            return m.group(0)
        kw, args = m.group(1), m.group(2)
        alias = m.group(3) or "pg_options_to_table"
        return (
            f"{kw} (SELECT substring_index(__opt, '=', 1) AS option_name, "
            f"substring(__opt, instr(__opt, '=') + 1) AS option_value "
            f"FROM (SELECT explode({args}) AS __opt)) AS {alias}"
        )

    sql = re.sub(
        rf"\b(FROM|JOIN|,)\s*(?:pg_catalog\s*\.\s*)?pg_options_to_table\s*"
        rf"\({_SRF_ARGS}\)(?:\s+(?:AS\s+)?{_SRF_NOKW}({_IDENT}))?",
        options_from,
        sql,
        flags=re.IGNORECASE,
    )

    # select-list forms (anything not consumed by the FROM rewrites above):
    # pg names the output column after the function unless the client aliases.
    def series_sel(m: re.Match) -> str:
        tail = m.string[m.end():]
        has_alias = re.match(r"\s+AS\s", tail, re.IGNORECASE) is not None
        base = f"explode(sequence({m.group(1)}))"
        return base if has_alias else f"{base} AS generate_series"

    sql = re.sub(
        rf"\bgenerate_series\s*\({_SRF_ARGS}\)", series_sel, sql, flags=re.IGNORECASE
    )

    def unnest_sel(m: re.Match) -> str:
        tail = m.string[m.end():]
        has_alias = re.match(r"\s+AS\s", tail, re.IGNORECASE) is not None
        base = f"explode({m.group(1)})"
        return base if has_alias else f"{base} AS unnest"

    sql = re.sub(rf"\b(?:pg_catalog\s*\.\s*)?unnest\s*\({_SRF_ARGS}\)",
                 unnest_sel, sql, flags=re.IGNORECASE)

    # jsonb_array_elements[_text] — each array element as a row (elements stay
    # JSON-encoded strings, matching ->/->> downstream use); json[b]_each —
    # key/value rows from an object (values JSON-encoded; _text gives the
    # unwrapped scalar like pg).
    def json_elems_from(m: re.Match) -> str:
        kw, args = m.group(1), m.group(3)
        alias = m.group(4) or "jsonb_array_elements"
        # pg: this SRF returns setof json (a scalar), so a bare table alias
        # names the output COLUMN too; default column name is `value`
        col = m.group(5) or m.group(4) or "value"
        # elements pass through the variant type so each row is canonical
        # compact JSON (what pg/DuckDB emit), not a raw substring; the _text
        # variant unwraps scalars to bare text instead
        unwrap = "CAST(_v AS STRING)" if m.group(2).lower().endswith("_text") else "to_json(_v)"
        elems = f"transform(from_json({args}, 'array<variant>'), _v -> {unwrap})"
        # pg auto-LATERALs SRFs in FROM; Spark needs the keyword for a
        # correlated derived table after a comma/JOIN
        lat = " LATERAL" if kw.strip() in (",", "JOIN", "join") else ""
        return (f"{kw}{lat} (SELECT explode({elems}) "
                f"AS {col}) AS {alias}")

    sql = re.sub(
        rf"\b(FROM|JOIN|,)\s*(?:LATERAL\s+)?(jsonb?_array_elements(?:_text)?)\s*\({_SRF_ARGS}\)"
        rf"(?:\s+(?:AS\s+)?{_SRF_NOKW}({_IDENT})\s*(?:\(\s*({_IDENT})\s*\))?)?",
        json_elems_from,
        sql,
        flags=re.IGNORECASE,
    )

    # select-list form: SELECT json_array_elements('[…]') — a generator
    # expression named after the function (pg's default output name), unless
    # _alias_renamed_funcs already pinned an alias
    def json_elems_sel(m: re.Match) -> str:
        fn, args = m.group(1), m.group(2)
        unwrap = "CAST(_v AS STRING)" if fn.lower().endswith("_text") else "to_json(_v)"
        base = (f"explode(transform(from_json({args}, 'array<variant>'), "
                f"_v -> {unwrap}))")
        tail = m.string[m.end():]
        has_alias = re.match(r"\s+AS\s", tail, re.IGNORECASE) is not None
        return base if has_alias else f"{base} AS {fn.lower()}"

    sql = re.sub(
        rf"\b(jsonb?_array_elements(?:_text)?)\s*\({_SRF_ARGS}\)",
        json_elems_sel,
        sql,
        flags=re.IGNORECASE,
    )

    def json_each_from(m: re.Match) -> str:
        kw, args = m.group(1), m.group(3)
        alias = m.group(4) or "json_each"
        kcol = m.group(5) or "key"
        vcol = m.group(6) or "value"
        # values surface as text in both variants (the _text unwrapping; the
        # non-text variant's json-typed rendering is not distinguished here)
        lat = " LATERAL" if kw.strip() in (",", "JOIN", "join") else ""
        return (
            f"{kw}{lat} (SELECT k AS {kcol}, v AS {vcol} FROM "
            f"(SELECT explode(from_json({args}, 'map<string,string>')) AS (k, v))"
            f") AS {alias}"
        )

    sql = re.sub(
        rf"\b(FROM|JOIN|,)\s*(?:LATERAL\s+)?(jsonb?_each(?:_text)?)\s*\({_SRF_ARGS}\)"
        rf"(?:\s+(?:AS\s+)?{_SRF_NOKW}({_IDENT})\s*(?:\(\s*({_IDENT})(?:\s*,\s*({_IDENT}))?\s*\))?)?",
        json_each_from,
        sql,
        flags=re.IGNORECASE,
    )
    return sql


def _rewrite_tables(sql: str) -> str:
    """pg_catalog.x / information_schema.x → emulation view names (B5/B6)."""
    sql = re.sub(
        r"\binformation_schema\s*\.\s*(tables|columns|schemata|views|"
        r"table_constraints|key_column_usage|referential_constraints)\b",
        r"information_schema_\1",
        sql,
        flags=re.IGNORECASE,
    )
    return sql


def _rewrite_regex_ops(sql: str) -> str:
    # psql emits OPERATOR(pg_catalog.~) in \d introspection queries; the
    # pg_catalog. prefix may already be stripped by _rewrite_functions
    sql = re.sub(r"OPERATOR\s*\(\s*(?:pg_catalog\.)?!~\s*\)", " NOT RLIKE ", sql, flags=re.IGNORECASE)
    sql = re.sub(r"OPERATOR\s*\(\s*(?:pg_catalog\.)?~\s*\)", " RLIKE ", sql, flags=re.IGNORECASE)
    # any other explicit-schema operator call collapses to the bare operator
    # (pg_dump writes OPERATOR(pg_catalog.=) everywhere)
    sql = re.sub(
        r"OPERATOR\s*\(\s*(?:pg_catalog\.)?([<>=!~^@#&|/%*+-]+)\s*\)",
        r" \1 ", sql, flags=re.IGNORECASE)
    sql = re.sub(r"\s+!~\s+", " NOT RLIKE ", sql)
    sql = re.sub(r"(\S)\s+~\s+(\x00\d+\x00)", r"\1 RLIKE \2", sql)
    return sql


_SCALAR_CONTEXT = re.compile(
    r"(=|<>|<=|>=|<|>|\+|-|\*|/|\|\||\bSELECT\b|\bWHEN\b|\bTHEN\b|\bELSE\b)\s*$",
    re.IGNORECASE,
)
_TOP_AGG = re.compile(
    r"\b(?:MIN|MAX|SUM|AVG|COUNT|COLLECT_LIST|COLLECT_SET|ARRAY_AGG|STRING_AGG|LISTAGG)\s*[(#]",
    re.IGNORECASE,
)


def _inject_scalar_limit(sql: str) -> str:
    """Postgres laxness: the reference runs with
    scalar_subquery_error_on_multiple_rows=false (main.go:67) so a multi-row
    scalar subquery yields its first row; Spark raises. Emulate by injecting
    LIMIT 1 into expression-position subqueries that aren't aggregated and
    don't already carry a top-level LIMIT."""
    out = []
    i = 0
    while True:
        m = re.compile(r"\(\s*SELECT\b", re.IGNORECASE).search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        # expression context? look at what precedes the '('
        if not _SCALAR_CONTEXT.search(sql[:m.start()]):
            out.append(sql[i:m.end()])
            i = m.end()
            continue
        # find the matching close paren
        depth = 0
        j = m.start()
        while j < len(sql):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        body = sql[m.start() + 1:j]
        # top-level text only (mask nested parens with a paren-free token so
        # the reduction terminates) for LIMIT/agg detection
        top, prev_top = body, None
        while prev_top != top:
            prev_top = top
            top = re.sub(r"\([^()]*\)", "#", top)
        if re.search(r"\bLIMIT\b", top, re.IGNORECASE) or _TOP_AGG.search(top):
            out.append(sql[i:j])
            i = j
            continue
        out.append(sql[i:m.start() + 1] + _inject_scalar_limit(body) + " LIMIT 1")
        i = j
    return "".join(out)


def _alias_bare_literals(sql: str) -> str:
    """A select-list item that is just a string literal gets pg's default
    name: SELECT 'x'  ->  SELECT 'x' AS `?column?` (B15 — Spark would
    otherwise name the column after the literal's content, which is
    indistinguishable from a column reference post-hoc). Depth-aware so
    literals inside IN (...) / function args are untouched."""
    # token stream: placeholders, parens/brackets, commas, words.
    # Brackets count toward depth too: commas inside ARRAY[ 'a', f(x) ]
    # (rewritten to array(...) only later) are element separators, not
    # select-list separators.
    tokens = list(re.finditer(r"\x00\d+\x00|[()\[\]]|,|\b[A-Za-z_]\w*\b", sql))
    # select-list depth tracking: a SELECT at depth d opens a list that ends
    # at FROM (same d) or at the ')' closing depth d
    select_depths: list[int] = []
    depth = 0
    insertions: list[int] = []  # positions where ' AS `?column?`' goes
    for i, t in enumerate(tokens):
        tx = t.group(0)
        if tx in ("(", "["):
            depth += 1
        elif tx in (")", "]"):
            if select_depths and select_depths[-1] == depth:
                select_depths.pop()
            depth -= 1
        elif tx.upper() == "SELECT":
            select_depths.append(depth)
        elif tx.upper() == "FROM":
            if select_depths and select_depths[-1] == depth:
                select_depths.pop()
        elif tx.startswith("\x00"):
            if not (select_depths and select_depths[-1] == depth):
                continue
            prev = tokens[i - 1].group(0).upper() if i > 0 else ""
            nxt = tokens[i + 1].group(0).upper() if i + 1 < len(tokens) else ""
            item_start = prev in ("SELECT", ",")
            item_end = nxt in (",", "FROM") or i + 1 == len(tokens)
            if item_start and item_end:
                insertions.append(t.end())
    for pos in reversed(insertions):
        sql = sql[:pos] + " AS `?column?`" + sql[pos:]
    return sql


def _rewrite_epoch_extract(sql: str, literals: list[str]) -> str:
    """pg-specific EXTRACT / date_part fields Spark lacks or numbers
    differently:

    - ``epoch`` → ``CAST(x AS DOUBLE)`` (Spark's timestamp→double cast IS
      epoch seconds with fraction; Spark's EXTRACT has no EPOCH field)
    - ``dow``  → ``dayofweek(x) - 1`` (pg: Sunday=0..Saturday=6; Spark's
      DOW/dayofweek is Sunday=1..7 — a silent off-by-one otherwise)
    - ``isodow`` → Monday=1..Sunday=7 (Spark has no such field at all)

    Other fields are native Spark and left alone."""
    out = []
    i = 0
    pat = re.compile(
        r"\b(?:EXTRACT\s*\(\s*(EPOCH|DOW|ISODOW)\s+FROM"
        r"|date_part\s*\(\s*\x00(\d+)\x00\s*,)\s*",
        re.IGNORECASE,
    )
    templates = {
        "epoch": "(CAST(CAST({x} AS TIMESTAMP) AS DOUBLE))",
        "dow": "(dayofweek({x}) - 1)",
        "isodow": "((pmod(dayofweek({x}) + 5, 7)) + 1)",
    }
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            return "".join(out)
        if m.group(1) is not None:
            field = m.group(1).lower()
        else:
            field = literals[int(m.group(2))].strip("'").lower()
            if field not in templates:
                out.append(sql[i:m.end()])
                i = m.end()
                continue
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            depth += {"(": 1, ")": -1}.get(sql[j], 0)
            j += 1
        arg = sql[m.end():j - 1].strip()
        out.append(sql[i:m.start()] + templates[field].format(x=arg))
        i = j


def _rewrite_at_time_zone(sql: str) -> str:
    """``x AT TIME ZONE 'tz'`` with pg's two readings (ADVICE r2 low):

    - instant operand (timestamptz → timestamp, the form BI tools emit):
      ``from_utc_timestamp(x, 'tz')`` — render the UTC instant as tz
      wall-clock. Default for columns/expressions (the session stores
      instants as UTC).
    - provably-NAIVE operand (``TIMESTAMP '…'`` typed literal, pg's
      timestamp → timestamptz direction): ``to_utc_timestamp(x, 'tz')`` —
      interpret the wall-clock in tz. Naive COLUMNS can't be detected
      without source typing and keep the instant reading; divergence
      documented in PARITY.md.
    """
    pat = re.compile(r"\s+AT\s+TIME\s+ZONE\s+(\x00\d+\x00)", re.IGNORECASE)
    while True:
        m = pat.search(sql)
        if not m:
            return sql
        func = "from_utc_timestamp"
        end = m.start()
        k = end - 1
        while k >= 0 and sql[k].isspace():
            k -= 1
        if k >= 0 and sql[k] == ")":
            depth = 0
            while k >= 0:
                depth += {"(": -1, ")": 1}.get(sql[k], 0)
                k -= 1
                if depth == 0:
                    break
            start = k + 1
            # include a leading function name (CAST(...), date_trunc(...))
            while start > 0 and (sql[start - 1].isalnum()
                                 or sql[start - 1] in "_."):
                start -= 1
            # a NAIVE operand (timestamp without tz — the TIMESTAMP '…'
            # literal arrives here as CAST(… AS TIMESTAMP_NTZ)) takes pg's
            # timestamp→timestamptz reading: interpret wall-clock in tz
            if re.search(r"AS\s+TIMESTAMP_NTZ\s*\)\s*$", sql[start:end],
                         re.IGNORECASE):
                func = "to_utc_timestamp"
        else:
            while k >= 0 and (sql[k].isalnum() or sql[k] in "_.\x00"):
                k -= 1
            start = k + 1
            # typed literal: TIMESTAMP '…' arrives as TIMESTAMP + marker
            pre = re.search(r"(TIMESTAMP(?:TZ)?|DATE|TIME)\s*$",
                            sql[:start], re.IGNORECASE)
            if pre and sql[start:end].strip().startswith("\x00"):
                start = pre.start()
                if pre.group(1).upper() == "TIMESTAMP":
                    func = "to_utc_timestamp"  # naive literal: wall-clock in tz
        operand = sql[start:end].strip()
        sql = (sql[:start] + f"{func}({operand}, {m.group(1)})"
               + sql[m.end():])


def _rewrite_fetch_first(sql: str) -> str:
    """SQL-standard ``[OFFSET n {ROW|ROWS}] FETCH {FIRST|NEXT} [n] {ROW|ROWS}
    ONLY`` → ``LIMIT n`` (Spark speaks LIMIT/OFFSET; count defaults to 1)."""
    sql = re.sub(
        r"\bOFFSET\s+(\d+)\s+ROWS?\b", r"OFFSET \1", sql, flags=re.IGNORECASE
    )
    sql = re.sub(
        r"\bFETCH\s+(?:FIRST|NEXT)\s+(\d+\s+)?ROWS?\s+ONLY\b",
        lambda m: f"LIMIT {m.group(1).strip() if m.group(1) else 1}",
        sql, flags=re.IGNORECASE,
    )
    # pg order is OFFSET-then-FETCH; Spark's grammar wants LIMIT OFFSET
    return re.sub(
        r"\bOFFSET\s+(\d+)\s+LIMIT\s+(\d+)\b", r"LIMIT \2 OFFSET \1",
        sql, flags=re.IGNORECASE,
    )


def _rewrite_array_ops(sql: str) -> str:
    """pg array operators on column/paren operands: ``a && b`` (overlap) →
    ``arrays_overlap``, ``a @> b`` (contains) → forall-membership, ``a <@ b``
    → the reverse. Operands are identifier chains or balanced parens (jsonb
    containment on literals is out of scope — the array reading is the
    overwhelmingly common one on relational data)."""
    operand = rf"({_IDENT}(?:\.{_IDENT})*(?:\([^()]*\))?|\([^()]*\))"
    sql = re.sub(
        rf"{operand}\s*&&\s*{operand}",
        r"arrays_overlap(\1, \2)", sql,
    )
    sql = re.sub(
        rf"{operand}\s*@>\s*{operand}",
        r"forall(\2, __x -> array_contains(\1, __x))", sql,
    )
    sql = re.sub(
        rf"{operand}\s*<@\s*{operand}",
        r"forall(\1, __x -> array_contains(\2, __x))", sql,
    )
    return sql


def _rewrite_any_all(sql: str) -> str:
    """General ANY/ALL forms beyond the '{…}' literal (B10):
    ``x = ANY (SELECT …)`` → ``x IN (SELECT …)``; ``x <> ALL (SELECT …)`` →
    ``x NOT IN (…)``; ``x = ANY(arr_col)`` → ``array_contains(arr_col, x)``.
    """
    # `(paren-expr) = ANY(arr)` — e.g. pg_dump's scalar-subquery LHS
    # `(SELECT c.oid …) = ANY(partclass)`: match the close paren backwards.
    while True:
        pm = re.search(r"\)\s*=\s*ANY\s*\(", sql, re.IGNORECASE)
        if not pm:
            break
        close = pm.start()
        depth, i = 0, close
        while i >= 0:
            if sql[i] == ")":
                depth += 1
            elif sql[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        # include a leading function name (`lower(x) = ANY(arr)`)
        while i > 0 and (sql[i - 1].isalnum() or sql[i - 1] in "_."):
            i -= 1
        depth, j = 1, pm.end()
        while j < len(sql) and depth:
            depth += {"(": 1, ")": -1}.get(sql[j], 0)
            j += 1
        lhs = sql[i:close + 1]
        body = sql[pm.end():j - 1].strip()
        if re.match(r"SELECT\b|WITH\b", body, re.IGNORECASE):
            repl = f"{lhs} IN ({body})"
        else:
            repl = f"array_contains({body}, {lhs})"
        sql = sql[:i] + repl + sql[j:]

    out = []
    i = 0
    pat = re.compile(
        rf"({_IDENT}(?:\.{_IDENT})*|\x00\d+\x00)\s*(=|<>|!=)\s*(ANY|ALL)\s*\(",
        re.IGNORECASE,
    )
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            return "".join(out)
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            depth += {"(": 1, ")": -1}.get(sql[j], 0)
            j += 1
        lhs, op, quant = m.group(1), m.group(2), m.group(3).upper()
        body = sql[m.end():j - 1].strip()
        is_subq = re.match(r"SELECT\b|WITH\b", body, re.IGNORECASE)
        repl = None
        if quant == "ANY" and op == "=":
            repl = (f"{lhs} IN ({body})" if is_subq
                    else f"array_contains({body}, {lhs})")
        elif quant == "ALL" and op in ("<>", "!="):
            repl = (f"{lhs} NOT IN ({body})" if is_subq
                    else f"NOT array_contains({body}, {lhs})")
        if repl is None:
            out.append(sql[i:j])
        else:
            out.append(sql[i:m.start()] + repl)
        i = j


def _rewrite_tablesample(sql: str) -> str:
    """pg ``TABLESAMPLE BERNOULLI(p) / SYSTEM(p) [REPEATABLE(seed)]`` →
    Spark ``TABLESAMPLE (p PERCENT) [REPEATABLE (seed)]``. BERNOULLI's
    per-row semantics match Spark's row-level sample; SYSTEM (page-level in
    pg) has no page analogue — the row-level sample is the closest fit."""
    sql = re.sub(
        r"TABLESAMPLE\s+(?:BERNOULLI|SYSTEM)\s*\(\s*([\d.]+)\s*\)",
        r"TABLESAMPLE (\1 PERCENT)", sql, flags=re.IGNORECASE,
    )
    return re.sub(
        r"(TABLESAMPLE\s*\([^)]*\))\s*REPEATABLE\s*\(\s*(\d+)\s*\)",
        r"\1 REPEATABLE (\2)", sql, flags=re.IGNORECASE,
    )


def _quote_mask(sql: str) -> list[bool]:
    """mask[i] = True when sql[i] sits inside (or delimits) a single-quoted
    literal OR a backtick-quoted identifier (pg double-quoted idents are
    rewritten to backticks earlier — operator rewrites must not fire inside
    them: `SELECT \\`a^b\\`` is a column reference, not POWER; ADVICE r7).
    Doubled ''/`` escapes close-and-reopen and stay masked."""
    mask = [False] * len(sql)
    in_q: str | None = None
    for i, c in enumerate(sql):
        if in_q is None:
            if c in "'`":
                mask[i] = True
                in_q = c
        else:
            mask[i] = True
            if c == in_q:
                in_q = None
    return mask


def _primary_before(sql: str, end: int, mask: list[bool] | None = None) -> int:
    """Start index of the primary expression ending just before ``end``:
    an identifier chain, a string literal, or a balanced ``(...)``
    optionally preceded by a function-name identifier chain
    (``split(x, '_')``), either optionally followed by already-present
    subscript groups (``x[1][2:3]`` chains — the earlier group is part of
    the primary the later one applies to). ``mask`` (from ``_quote_mask``)
    makes the backward paren/bracket walk quote-aware, so rule-generated
    raw literals containing '(' / ')' / ']' (e.g. concat('[', …, ']'))
    don't miscount depth."""

    def masked(i: int) -> bool:
        return mask is not None and mask[i]

    i = end - 1
    while i >= 0 and sql[i].isspace():
        i -= 1
    while i >= 0 and sql[i] == "]" and not masked(i):
        depth = 0
        while i >= 0:
            if not masked(i):
                depth += {"[": -1, "]": 1}.get(sql[i], 0)
            i -= 1
            if depth == 0:
                break
    if i >= 0 and sql[i] == ")" and not masked(i):
        depth = 0
        while i >= 0:
            if not masked(i):
                depth += {"(": -1, ")": 1}.get(sql[i], 0)
            i -= 1
            if depth == 0:
                break
        # include a function name directly before the parens
        while i >= 0 and (sql[i].isalnum() or sql[i] in "_."):
            i -= 1
        return i + 1
    if i >= 0 and masked(i) and sql[i] in "'`":
        # a string-literal or backtick-identifier primary: include the span
        while i >= 0 and masked(i):
            i -= 1
        return i + 1
    while i >= 0 and (sql[i].isalnum() or sql[i] in "_."):
        i -= 1
    return i + 1


def _primary_after(sql: str, start: int, mask: list[bool] | None = None) -> int:
    """End index (exclusive) of the primary expression starting at ``start``:
    an identifier chain optionally followed by a balanced call/paren group
    and trailing subscript groups (the forward mirror of _primary_before)."""

    def masked(i: int) -> bool:
        return mask is not None and mask[i]

    n = len(sql)
    i = start
    while i < n and sql[i].isspace():
        i += 1
    begin = i
    while i < n and (sql[i].isalnum() or sql[i] in "_."):
        i += 1
    if i < n and sql[i] == "(":
        depth = 0
        while i < n:
            if not masked(i):
                depth += {"(": 1, ")": -1}.get(sql[i], 0)
            i += 1
            if depth == 0:
                break
    if i == begin:
        return start
    while i < n and sql[i] == "[":
        depth = 0
        while i < n:
            if not masked(i):
                depth += {"[": 1, "]": -1}.get(sql[i], 0)
            i += 1
            if depth == 0:
                break
    return i


_UNARY_CONTEXT_KEYWORDS = frozenset(
    "select where when then else and or not in like ilike between by on "
    "having set values returning offset limit case distinct all union "
    "except intersect as is".split()
)


def _operand_before(s: str, end: int, mask) -> int:
    """_primary_before extended over `::type` cast suffixes, shielded
    string-literal placeholders (`'[1,2]'::vector <-> v`), and a leading
    UNARY sign: pg binds unary +/- tighter than `^` (`-2 ^ 2` = 4), so a
    sign preceded by an operator/comma/open-paren/statement-start belongs
    to the operand (ADVICE r7; a binary minus — preceded by an operand
    end — is left alone)."""
    start = _primary_before(s, end, mask)
    while True:
        j = start - 1
        while j >= 0 and s[j].isspace():
            j -= 1
        if j >= 1 and s[j] == ":" and s[j - 1] == ":":
            k = j - 2
            while k >= 0 and s[k].isspace():
                k -= 1
            if k >= 0 and s[k] == "\x00":  # shielded literal ::type
                k2 = k - 1
                while k2 >= 0 and s[k2].isdigit():
                    k2 -= 1
                if k2 >= 0 and s[k2] == "\x00":
                    start = k2
                    continue
            start = _primary_before(s, j - 1, mask)
            continue
        if j >= 0 and s[j] in "+-":
            k = j - 1
            while k >= 0 and s[k].isspace():
                k -= 1
            if k < 0 or not (s[k].isalnum() or s[k] in "_)]'`\x00"):
                start = j  # unary sign: part of the operand
            elif s[k].isalpha() or s[k] == "_":
                # a KEYWORD before the sign (SELECT -2 ^ 2, WHEN -x ^ 2)
                # starts an expression, it doesn't end an operand
                w = k
                while w >= 0 and (s[w].isalnum() or s[w] == "_"):
                    w -= 1
                if s[w + 1:k + 1].lower() in _UNARY_CONTEXT_KEYWORDS:
                    start = j
            # no continue: a sign can't stack casts further left
        return start


def _operand_after(s: str, begin: int, mask) -> int:
    """Forward mirror of _operand_before (shielded literals + casts +
    numeric literals with sign/decimal point)."""
    m0 = re.match(r"\s*\x00\d+\x00", s[begin:])
    mnum = m0 or re.match(r"\s*[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?", s[begin:])
    if m0:
        end = begin + m0.end()
    elif mnum:
        end = begin + mnum.end()
    else:
        end = _primary_after(s, begin, mask)
        if end == begin:
            return begin
    m1 = re.match(r"\s*::\s*[A-Za-z_]\w*(?:\(\d+(?:,\s*\d+)?\))?(?:\[\])?",
                  s[end:])
    return end + m1.end() if m1 else end


def _rewrite_power_op(sql: str) -> str:
    """pg ``a ^ b`` is POWER (numeric exponentiation) — Spark's ``^`` is
    bitwise XOR, a silently wrong result for every pg client. Rewritten to
    ``power(a, b)``; left-associative chains fold naturally because the
    rewritten call is itself a primary for the next pass. (pg's XOR is
    ``#``, which Spark's parser rejects loudly — nothing silent there.)"""
    while True:
        mask = _quote_mask(sql)
        m = next(
            (mm for mm in re.finditer(r"\^", sql) if not mask[mm.start()]),
            None,
        )
        if m is None:
            return sql
        start = _operand_before(sql, m.start(), mask)
        lhs = sql[start:m.start()].strip()
        rend = _operand_after(sql, m.end(), mask)
        rhs = sql[m.end():rend].strip()
        if not lhs or not rhs:
            return sql
        sql = sql[:start] + f"power({lhs}, {rhs})" + sql[rend:]


def _vector_dot(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            f"CAST(0 AS DOUBLE), (s, v) -> s + v)")


_VECTOR_FUNC_RE = re.compile(
    r"\b(vector_dims|l2_distance|l1_distance|inner_product|cosine_distance|"
    r"l2_norm|vector_norm|l2_normalize|subvector)\s*\(",
    re.IGNORECASE,
)


def _rewrite_vector_funcs(sql: str) -> str:
    """pgvector's FUNCTION forms (the operator spellings' siblings — clients
    and ORMs call these directly: pgvector README). Same JVM-side
    zip_with/aggregate algebra as ``_rewrite_vector_ops``; no UDF:

    - vector_dims(v)            → size(v)
    - l2_distance(a, b)         → the `<->` expansion
    - l1_distance(a, b)         → Σ|x−y| (taxicab)
    - inner_product(a, b)       → Σxy (POSITIVE — unlike the `<#>` operator,
                                  which pgvector negates for ASC ordering)
    - cosine_distance(a, b)     → the `<=>` expansion
    - l2_norm / vector_norm(v)  → sqrt(Σx²)
    - l2_normalize(v)           → v / ‖v‖
    - subvector(v, start, n)    → slice(v, start, n) (both 1-based)
    """
    pos = 0
    while True:
        m = _VECTOR_FUNC_RE.search(sql, pos)
        if m is None:
            return sql
        open_p = m.end() - 1
        depth, i = 0, open_p
        while i < len(sql):
            depth += {"(": 1, ")": -1}.get(sql[i], 0)
            i += 1
            if depth == 0:
                break
        if depth != 0:
            return sql  # unbalanced: leave for Spark to report
        args = _split_top_level_commas(sql[open_p + 1:i - 1])
        fn = m.group(1).lower()
        need = {"vector_dims": 1, "l2_norm": 1, "vector_norm": 1,
                "l2_normalize": 1, "subvector": 3}.get(fn, 2)
        if len(args) != need:
            pos = m.end()
            continue
        a = args[0]
        b = args[1] if len(args) > 1 else None
        if fn == "vector_dims":
            repl = f"size({a})"
        elif fn in ("l2_norm", "vector_norm"):
            repl = f"sqrt({_vector_dot(a, a)})"
        elif fn == "l2_normalize":
            # pgvector returns the zero vector unchanged (division by the
            # zero norm would yield NaN elements — ADVICE r8)
            repl = (f"CASE WHEN {_vector_dot(a, a)} = 0 THEN {a} "
                    f"ELSE transform({a}, x -> x / sqrt({_vector_dot(a, a)})) END")
        elif fn == "subvector":
            repl = f"slice({a}, {args[1]}, {args[2]})"
        elif fn == "inner_product":
            repl = f"({_vector_dot(a, b)})"
        elif fn == "l1_distance":
            repl = (f"aggregate(zip_with({a}, {b}, (x, y) -> abs(x - y)), "
                    f"CAST(0 AS DOUBLE), (s, v) -> s + v)")
        elif fn == "l2_distance":
            repl = (f"sqrt(aggregate(zip_with({a}, {b}, "
                    f"(x, y) -> (x - y) * (x - y)), "
                    f"CAST(0 AS DOUBLE), (s, v) -> s + v))")
        else:  # cosine_distance
            repl = (f"(1 - {_vector_dot(a, b)} / "
                    f"(sqrt({_vector_dot(a, a)}) * sqrt({_vector_dot(b, b)})))")
        sql = sql[:m.start()] + repl + sql[i:]
        # rescan from the same offset: args may hold nested vector funcs
        pos = m.start()


def _split_top_level_commas(s: str) -> list[str]:
    out, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


def _rewrite_vector_ops(sql: str) -> str:
    """pgvector distance operators → Spark higher-order-function algebra:

    - ``a <-> b``  euclidean distance  → sqrt(Σ (x-y)²)
    - ``a <=> b``  cosine DISTANCE     → 1 − Σxy / (‖a‖·‖b‖)
    - ``a <#> b``  NEGATIVE inner product → −Σxy (pgvector returns the
      negation so ascending ORDER BY ranks nearest-first)
    - ``a <+> b``  L1 (taxicab) distance → Σ|x−y| (pgvector 0.7)

    Element math runs JVM-side in zip_with/aggregate — no UDF, stays inside
    whole-stage codegen; at scale this is the brute-force rank arm the ANN
    operators (operators/similarity.py IVF/LSH) accelerate. Operands are
    primary expressions (column chains, function calls, array(...) literals,
    parenthesized exprs). All three ops are IEEE-deterministic given
    identical inputs (mul/add/div/sqrt are correctly rounded), so integer-
    valued inputs give bit-identical results in any engine — the driver
    entry pg_vector_ops_route pins that against DuckDB."""
    while True:
        mask = _quote_mask(sql)
        m = next((mm for mm in re.finditer(r"<->|<=>|<#>|<\+>", sql)
                  if not mask[mm.start()]), None)
        if m is None:
            return sql
        op = m.group(0)
        start = _operand_before(sql, m.start(), mask)
        lhs = sql[start:m.start()].strip()
        rend = _operand_after(sql, m.end(), mask)
        rhs = sql[m.end():rend].strip()
        if not lhs or not rhs:
            return sql  # malformed operand: leave the statement untouched

        def dot(a: str, b: str) -> str:
            return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                    f"CAST(0 AS DOUBLE), (s, v) -> s + v)")

        if op == "<#>":
            repl = f"(-{dot(lhs, rhs)})"
        elif op == "<->":
            repl = (f"sqrt(aggregate(zip_with({lhs}, {rhs}, "
                    f"(x, y) -> (x - y) * (x - y)), "
                    f"CAST(0 AS DOUBLE), (s, v) -> s + v))")
        elif op == "<+>":
            repl = (f"aggregate(zip_with({lhs}, {rhs}, "
                    f"(x, y) -> abs(x - y)), "
                    f"CAST(0 AS DOUBLE), (s, v) -> s + v)")
        else:  # <=>
            repl = (f"(1 - {dot(lhs, rhs)} / "
                    f"(sqrt({dot(lhs, lhs)}) * sqrt({dot(rhs, rhs)})))")
        sql = sql[:start] + repl + sql[rend:]


def _rewrite_array_slice(sql: str) -> str:
    """pg 1-based inclusive array slices ``expr[lo:hi]`` → Spark
    ``slice(expr, lo, hi-lo+1)`` (literal bounds — the form clients write).
    The sliced primary expression is an identifier chain or a balanced
    ``(...)``, found by scanning backward from the bracket."""
    search_from = 0
    while True:
        mask = _quote_mask(sql)
        m = next(
            (mm for mm in re.finditer(r"\[\s*(\d+)\s*:\s*(\d+)\s*\]", sql)
             if mm.start() >= search_from and not mask[mm.start()]),
            None,
        )
        if not m:
            return sql
        lo, hi = int(m.group(1)), int(m.group(2))
        lo = max(lo, 1)  # pg clamps a 0/low start to the first element;
        # Spark's slice() rejects start 0 outright
        start = _primary_before(sql, m.start(), mask)
        expr = sql[start:m.start()].rstrip()
        if not expr:  # stray bracket: skip it, keep scanning the rest
            search_from = m.end()
            continue
        sql = (sql[:start] + f"slice({expr}, {lo}, {max(hi - lo + 1, 0)})"
               + sql[m.end():])


def _rewrite_array_index(sql: str) -> str:
    """pg 1-based array subscripts ``expr[i]`` → ``try_element_at(expr, i)``
    (Spark's bare ``expr[i]`` is 0-based — silently off-by-one for every pg
    client). Runs after ARRAY[...] literals became array(...) and after
    slices were rewritten, so any surviving bracket is a subscript. pg
    returns NULL for out-of-range/zero/negative subscripts; try_element_at
    NULLs out-of-range, and non-positive indexes are redirected past the
    end (Spark would throw on 0 / count from the back on negatives).
    Reference parity: the engine under the reference subscripts 1-based
    (SURVEY §2.A array ops); driver entry pg_array_slice_route pins this.
    Quote-aware: earlier rewrites emit raw string literals (e.g. the
    jsonb_agg FILTER path's concat('[', …, ']')) whose brackets must not be
    treated as subscripts."""

    def _find_subscript(s: str) -> tuple[int, int] | None:
        in_q = False
        opens: list[int] = []
        for i, c in enumerate(s):
            if c == "'":
                in_q = not in_q
            elif not in_q:
                if c == "[":
                    opens.append(i)
                elif c == "]" and opens:
                    return opens.pop(), i
        return None

    # Non-rewritable brackets (empty index, non-literal slice left by
    # _rewrite_array_slice, ARRAY[...] prefix) are masked to sentinels and
    # restored at the end, so ONE unhandled pair no longer aborts the pass
    # and leaves later plain subscripts silently 0-based.
    OPEN, CLOSE = "\x01", "\x02"
    while True:
        pos = _find_subscript(sql)
        if not pos:
            return sql.replace(OPEN, "[").replace(CLOSE, "]")
        b, e = pos
        idx = sql[b + 1:e].strip()
        start = _primary_before(sql, b, _quote_mask(sql))
        expr = sql[start:b].rstrip()
        if (not idx or ":" in idx or not expr or expr.upper() == "ARRAY"):
            sql = sql[:b] + OPEN + sql[b + 1:e] + CLOSE + sql[e + 1:]
            continue
        if re.fullmatch(r"\d+", idx) and int(idx) >= 1:
            at = idx
        else:
            at = (f"CASE WHEN ({idx}) >= 1 THEN ({idx}) "
                  f"ELSE cardinality({expr}) + 1 END")
        sql = (sql[:start] + f"try_element_at({expr}, {at})" + sql[e + 1:])


def _ts_query_to_bool(query: str, arr: str) -> str:
    """Compile a tsquery expression ('a & b | !c', prefix 'd:*') into a
    boolean over the tokenized word array ``arr``. Recursive descent over
    the &/|/!/() grammar; no stemming (documented emulation limit)."""
    tokens = re.findall(r"[&|!()]|[^\s&|!()]+", query)
    pos = 0

    def peek() -> str | None:
        return tokens[pos] if pos < len(tokens) else None

    def eat() -> str:
        nonlocal pos
        t = tokens[pos]
        pos += 1
        return t

    def atom() -> str:
        t = eat()
        if t == "(":
            e = or_expr()
            if peek() == ")":
                eat()
            return f"({e})"
        if t == "!":
            return f"NOT {atom()}"
        term = t.strip("'\"").lower()
        if term.endswith(":*"):
            pre = term[:-2].replace("'", "''")
            return f"exists({arr}, w -> w LIKE '{pre}%')"
        return f"array_contains({arr}, '{term.replace(chr(39), chr(39) * 2)}')"

    def and_expr() -> str:
        parts = [atom()]
        while peek() == "&":
            eat()
            parts.append(atom())
        return " AND ".join(parts)

    def or_expr() -> str:
        parts = [and_expr()]
        while peek() == "|":
            eat()
            parts.append(and_expr())
        return " OR ".join(parts)

    return or_expr()


def _rewrite_tsearch(sql: str, literals: list[str]) -> str:
    """``to_tsvector([cfg,] x) @@ to_tsquery([cfg,] 'q')`` → a boolean over
    the lowercased word array of ``x``. ``plainto_tsquery`` ANDs its words.
    Stemming/stop-words are not emulated — terms match surface forms — but
    the operator shape (per-row, no shuffle, codegen-friendly) is what a
    corpus-scale keyword filter needs."""
    out = []
    i = 0
    pat = re.compile(r"to_tsvector\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            return "".join(out)
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            depth += {"(": 1, ")": -1}.get(sql[j], 0)
            j += 1
        args = sql[m.end():j - 1]
        vec = _split_top_level(args)[-1] if args else args
        m2 = re.match(
            r"\s*@@\s*(to_tsquery|plainto_tsquery)\s*\(", sql[j:], re.IGNORECASE
        )
        if not m2:
            out.append(sql[i:j])
            i = j
            continue
        depth, k = 1, j + m2.end()
        while k < len(sql) and depth:
            depth += {"(": 1, ")": -1}.get(sql[k], 0)
            k += 1
        qargs = _split_top_level(sql[j + m2.end():k - 1])
        qm = re.match(r"\s*\x00(\d+)\x00\s*$", qargs[-1] if qargs else "")
        if not qm:
            out.append(sql[i:k])
            i = k
            continue
        query = literals[int(qm.group(1))][1:-1]
        arr = f"filter(split(lower({vec}), '[^a-z0-9]+'), w -> w != '')"
        if m2.group(1).lower() == "plainto_tsquery":
            cond = " AND ".join(
                f"array_contains({arr}, '{w.lower()}')" for w in query.split()
            ) or "true"
        else:
            cond = _ts_query_to_bool(query, arr)
        out.append(sql[i:m.start()] + "(" + cond + ")")
        i = k


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on sep outside parens (shielded text: no string literals)."""
    parts, depth, start = [], 0, 0
    for idx, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[start:idx])
            start = idx + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _rewrite_window_filter(sql: str) -> str:
    """``agg(x) FILTER (WHERE c) OVER (…)`` → ``agg(CASE WHEN c THEN x END)
    OVER (…)``. Spark supports FILTER on plain aggregates natively but not on
    window functions; the CASE rewrite is semantically exact (NULLs are
    ignored by sum/avg/min/max, and count(*) becomes count(CASE…THEN 1))."""
    pos = 0
    while True:
        m = re.compile(r"\bFILTER\s*\(\s*WHERE\b", re.IGNORECASE).search(sql, pos)
        if not m:
            return sql
        # cond extent via paren matching from FILTER's open paren
        open_i = sql.index("(", m.start())
        depth, j = 1, open_i + 1
        while j < len(sql) and depth:
            depth += {"(": 1, ")": -1}.get(sql[j], 0)
            j += 1
        cond = sql[open_i + 1:j - 1]
        cond = re.sub(r"^\s*WHERE\s+", "", cond, flags=re.IGNORECASE)
        if not re.match(r"\s*OVER\b", sql[j:], re.IGNORECASE):
            pos = j  # plain aggregate FILTER: Spark handles it natively
            continue
        # the agg call immediately before FILTER: name( … ) balanced
        end = m.start()
        k = end - 1
        while k >= 0 and sql[k].isspace():
            k -= 1
        if k < 0 or sql[k] != ")":
            pos = j
            continue
        depth = 0
        while k >= 0:
            depth += {"(": -1, ")": 1}.get(sql[k], 0)
            k -= 1
            if depth == 0:
                break
        args_open = k + 1
        name_start = args_open - 1
        while name_start >= 0 and (sql[name_start - 1].isalnum() or sql[name_start - 1] == "_"):
            name_start -= 1
        name = sql[name_start:args_open]
        args = sql[args_open + 1:end].rstrip()[:-1].strip()  # inside ( )
        if args in ("*", "1") and name.strip().upper() == "COUNT":
            new_call = f"count(CASE WHEN {cond} THEN 1 END)"
        else:
            new_call = f"{name}(CASE WHEN {cond} THEN {args} END)"
        sql = sql[:name_start] + new_call + sql[j:]


def _rewrite_similar_to(sql: str, literals: list[str]) -> str:
    """``x [NOT] SIMILAR TO 'pat'`` → RLIKE with the pattern converted from
    pg's SQL-regex dialect (``%``→``.*``, ``_``→``.``, POSIX subset kept,
    implicitly anchored). Runs on shielded text; the converted pattern is
    appended as a fresh literal."""
    def conv(pat: str) -> str:
        out, i = [], 0
        while i < len(pat):
            ch = pat[i]
            if ch == "\\" and i + 1 < len(pat):
                out.append(pat[i:i + 2])
                i += 2
                continue
            out.append({"%": ".*", "_": "."}.get(ch, ch))
            i += 1
        return "^(?:" + "".join(out) + ")$"

    def repl(m: re.Match) -> str:
        idx = int(m.group(3))
        lit = literals[idx]
        converted = "'" + conv(lit[1:-1]).replace("'", "''") + "'"
        literals.append(converted)
        neg = "NOT " if m.group(2) else ""
        return f"{m.group(1)} {neg}RLIKE \x00{len(literals) - 1}\x00"

    return re.sub(
        r"(\S+)\s+(NOT\s+)?SIMILAR\s+TO\s+\x00(\d+)\x00",
        repl, sql, flags=re.IGNORECASE,
    )


def _find_top_level(sql: str, word: str, start: int = 0) -> int:
    """Index of the first depth-0 occurrence of keyword ``word`` in ``sql``
    (shielded text — parens in string literals are already gone); -1 if none."""
    pat = re.compile(r"\b" + word.replace(" ", r"\s+") + r"\b", re.IGNORECASE)
    depth = 0
    i = start
    while i < len(sql):
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(sql, i)
            if m:
                return i
        i += 1
    return -1


def _rewrite_distinct_on(sql: str) -> str:
    """``SELECT DISTINCT ON (k …) list FROM … ORDER BY k, s`` → row_number()
    window keeping the first row per key (B-class pg-ism; Spark has no
    DISTINCT ON). Scale note: the window partitions by the ON-keys — one hash
    shuffle, identical cost to the GROUP BY a user would hand-write; no global
    sort is introduced (the outer ORDER BY is whatever the query already had).

    Handled at the top level of the statement (the overwhelmingly common
    form); ON-expressions and the window's ORDER BY resolve against the FROM
    relation, as pg itself requires (ORDER BY must lead with the ON keys).
    """
    m = re.compile(r"\bSELECT\s+DISTINCT\s+ON\s*\(", re.IGNORECASE).search(sql)
    if not m or _find_top_level(sql, "SELECT") != m.start():
        return sql
    # ON (…) extent via paren matching
    depth, j = 1, m.end()
    while j < len(sql) and depth:
        depth += {"(": 1, ")": -1}.get(sql[j], 0)
        j += 1
    on_list = sql[m.end():j - 1].strip()
    from_i = _find_top_level(sql, "FROM", j)
    if from_i < 0:
        return sql
    select_list = sql[j:from_i].strip()
    rest = sql[from_i:]
    order_i = _find_top_level(rest, "ORDER BY")
    tail_i = _find_top_level(rest, "LIMIT")
    if tail_i < 0:
        tail_i = _find_top_level(rest, "OFFSET")
    if order_i >= 0:
        body = rest[:order_i].rstrip()
        order_clause = rest[order_i:tail_i] if tail_i > order_i else rest[order_i:]
        tail = rest[tail_i:] if tail_i > order_i else ""
        win_order = re.sub(r"^\s*ORDER\s+BY\s+", "", order_clause, flags=re.IGNORECASE)
    else:
        body = rest[:tail_i].rstrip() if tail_i >= 0 else rest.rstrip()
        order_clause, win_order = "", on_list
        tail = rest[tail_i:] if tail_i >= 0 else ""
    return (
        f"SELECT {select_list} FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY {on_list} ORDER BY {win_order}) AS __pg_don_rn {body}"
        f") __pg_don WHERE __pg_don_rn = 1 {order_clause} {tail}".rstrip()
    )


def _rewrite_quoted_idents(sql: str) -> str:
    """pg double-quoted identifiers -> Spark backticks (runs on shielded text,
    so double quotes inside string literals are untouched)."""
    def repl(m: re.Match) -> str:
        inner = m.group(1).replace('""', '"').replace("`", "``")
        return f"`{inner}`"

    return re.sub(r'"((?:[^"]|"")*)"', repl, sql)


def _rewrite_tableoid(sql: str) -> str:
    """Resolve references to pg's hidden ``tableoid`` system column into the
    owning catalog's constant relation oid (public, stable pg values —
    _CATALOG_TABLEOIDS). pg_dump reads ``x.tableoid`` / bare ``tableoid`` on
    every catalog it collects; the emulated views deliberately do NOT carry
    the column (SELECT * must not show it, exactly like pg)."""
    if not re.search(r"\btableoid\b", sql, re.IGNORECASE):
        return sql
    from bemidb_spark.pgcompat.catalog_views import _CATALOG_TABLEOIDS

    # alias / bare-name → catalog table, from every FROM/JOIN site; bare
    # (unqualified) tableoid binds to the query's OWN relation, so the
    # fallback only considers paren-depth-0 sites (pg_dump's getTypes has
    # `FROM pg_class` subqueries inside a top-level `FROM pg_type`)
    amap: dict[str, str] = {}
    top_level: set[str] = set()
    for m in re.finditer(
        r"\b(?:FROM|JOIN)\s+(?:pg_catalog\s*\.\s*)?(pg_\w+)"
        r"(?:\s+(?:AS\s+)?(?!ON\b|WHERE\b|JOIN\b|LEFT\b|RIGHT\b|INNER\b|"
        r"CROSS\b|GROUP\b|ORDER\b|UNION\b|USING\b|SET\b)(\w+))?",
        sql,
        re.IGNORECASE,
    ):
        name = m.group(1).lower()
        if name in _CATALOG_TABLEOIDS:
            amap[(m.group(2) or name).lower()] = name
            depth = 0
            for ch in sql[:m.start()]:
                depth += {"(": 1, ")": -1}.get(ch, 0)
            if depth == 0:
                top_level.add(name)

    def repl(m: re.Match) -> str:
        qual = (m.group(1) or "").strip().rstrip(".").strip().lower()
        if not qual and re.search(r"\bAS\s*$", m.string[:m.start()],
                                  re.IGNORECASE):
            return m.group(0)  # alias position (`x.tableoid AS tableoid`)
        if qual:
            cat = amap.get(qual)
        elif len(top_level) == 1:
            cat = next(iter(top_level))
        elif len(set(amap.values())) == 1:
            cat = next(iter(amap.values()))
        else:
            cat = None
        if cat is None:
            return m.group(0)
        const = f"CAST({_CATALOG_TABLEOIDS[cat]} AS BIGINT)"
        # bare select-list item (next token is `,` or FROM): keep pg's
        # output column name; an explicit `AS alias` follows otherwise
        tail = m.string[m.end():]
        if re.match(r"\s*(,|FROM\b)", tail, re.IGNORECASE):
            return f"{const} AS tableoid"
        return const

    return re.sub(
        r"((?:\w+\s*\.\s*)?)\btableoid\b(?!\s*\.)",
        repl,
        sql,
        flags=re.IGNORECASE,
    )


def _rewrite_recursive_union(sql: str) -> str:
    """``WITH RECURSIVE w AS (a UNION b)`` → ``UNION ALL``. Spark executes
    recursive CTEs natively but only with UNION ALL; pg also allows the
    deduplicating UNION (pg_dump's matview-dependency walk uses it). On the
    acyclic graphs these queries traverse the fixpoint is identical — only
    duplicate rows can differ, and per-iteration dedup never changes which
    rows are reachable."""
    for m in re.finditer(r"\bWITH\s+RECURSIVE\b", sql, re.IGNORECASE):
        # walk every top-level CTE body after the keyword
        i = sql.find("(", m.end())
        while i != -1:
            depth, j = 1, i + 1
            while j < len(sql) and depth:
                depth += {"(": 1, ")": -1}.get(sql[j], 0)
                j += 1
            body = sql[i:j]
            fixed = re.sub(r"\bUNION\b(?!\s+ALL\b)", "UNION ALL", body,
                           flags=re.IGNORECASE)
            if fixed != body:
                sql = sql[:i] + fixed + sql[j:]
                j += len(fixed) - len(body)
            # `w(cols) AS (` — the paren just closed was the column list —
            # or another `, name AS (` CTE follows
            nm = re.match(r"\s*AS\s*\(", sql[j:], re.IGNORECASE) or re.match(
                r"\s*,\s*\w+(?:\s*\([\w\s,]*\))?\s+AS\s*\(",
                sql[j:], re.IGNORECASE)
            i = j + nm.end() - 1 if nm else -1
    return sql


def transpile(sql: str) -> str:
    """Rewrite a Postgres-dialect query into Spark SQL."""
    shielded, literals = _shield_strings(sql)
    shielded = _rewrite_quoted_idents(shielded)
    shielded = _alias_bare_literals(shielded)
    shielded = _alias_renamed_funcs(shielded)
    # main.<fn>( — clients address the reference's macro schema directly
    shielded = re.sub(r"\bmain\s*\.\s*(?=\w+\s*\()", "", shielded, flags=re.IGNORECASE)
    # OPERATOR(pg_catalog.<op>) → bare <op> BEFORE any operator-shape
    # rewrites (pg_dump spells every comparison this way; `= ANY(...)`
    # recognition needs the plain `=`). Bare ~ / !~ are regex-rewritten
    # later by _rewrite_regex_ops.
    shielded = re.sub(
        r"\bOPERATOR\s*\(\s*(?:pg_catalog\s*\.\s*)?([<>=!~^@#&|/%*+-]+)\s*\)",
        r" \1 ", shielded, flags=re.IGNORECASE)
    shielded = _rewrite_recursive_union(shielded)
    shielded = _rewrite_tableoid(shielded)
    shielded = _rewrite_tables(shielded)
    shielded = _rewrite_distinct_on(shielded)
    shielded = _rewrite_array_sublink(shielded)
    shielded = _rewrite_array_literal(shielded)
    shielded = _rewrite_json_table(shielded, literals)
    shielded = _rewrite_srf(shielded)
    shielded = _rewrite_pg_macros(shielded)
    shielded = _rewrite_ref_funcs(shielded, literals)
    shielded = _rewrite_functions(shielded)
    shielded = _rewrite_to_char(shielded, literals)
    shielded = _rewrite_string_to_array(shielded, literals)
    shielded = _rewrite_any_string_array(shielded, literals)
    shielded = _rewrite_eq_brace_array(shielded, literals)
    shielded = _rewrite_any_all(shielded)
    shielded = _rewrite_array_ops(shielded)
    # before _rewrite_json_ops: `<#>` contains the `#>` json-path token
    shielded = _rewrite_vector_funcs(shielded)
    shielded = _rewrite_vector_ops(shielded)
    shielded = _rewrite_power_op(shielded)
    shielded = _rewrite_json_ops(shielded)
    # pg's TIMESTAMP 'lit' is timestamp WITHOUT time zone; Spark's TIMESTAMP
    # keyword follows spark.sql.timestampType (instant by default) and would
    # render with a zone offset on the wire. TIMESTAMPTZ stays native.
    shielded = re.sub(
        r"\bTIMESTAMP\s+(\x00\d+\x00)",
        r"CAST(\1 AS TIMESTAMP_NTZ)",
        shielded,
        flags=re.IGNORECASE,
    )
    shielded = _rewrite_casts(shielded, literals)
    # explicit CAST(x AS <pgtype>): map pg type names Spark lacks (psql's
    # \dd writes CAST(conname AS text))
    _CASTABLE_PGTYPES = {
        "text": "STRING", "bpchar": "STRING", "name": "STRING",
        "int2": "SMALLINT", "int4": "INT", "int8": "BIGINT",
        "float4": "FLOAT", "float8": "DOUBLE", "oid": "BIGINT",
        "bool": "BOOLEAN", "bytea": "BINARY", "timestamptz": "TIMESTAMP",
        "regclass": "STRING", "regtype": "STRING", "regproc": "STRING",
        "uuid": "STRING", "json": "STRING", "jsonb": "STRING",
    }
    def _fix_cast_types(s: str) -> str:
        out, pos = [], 0
        for cm in re.finditer(r"\bCAST\s*\(", s, re.IGNORECASE):
            depth, j = 1, cm.end()
            while j < len(s) and depth:
                depth += {"(": 1, ")": -1}.get(s[j], 0)
                j += 1
            if j <= pos:
                continue  # nested inside an already-processed span
            span = s[cm.start():j]
            fixed = re.sub(
                r"(\bAS\s+)(" + "|".join(_CASTABLE_PGTYPES) + r")(\s*\)$)",
                lambda m: m.group(1)
                + _CASTABLE_PGTYPES[m.group(2).lower()] + m.group(3),
                span,
                flags=re.IGNORECASE,
            )
            out.append(s[pos:cm.start()] + fixed)
            pos = j
        out.append(s[pos:])
        return "".join(out)

    shielded = _fix_cast_types(shielded)
    shielded = _rewrite_regex_ops(shielded)
    shielded = _rewrite_similar_to(shielded, literals)
    shielded = _rewrite_tablesample(shielded)
    shielded = _rewrite_fetch_first(shielded)
    shielded = _rewrite_array_slice(shielded)
    shielded = _rewrite_array_index(shielded)
    shielded = _rewrite_window_filter(shielded)
    shielded = _rewrite_tsearch(shielded, literals)
    shielded = _rewrite_epoch_extract(shielded, literals)
    shielded = _rewrite_at_time_zone(shielded)
    shielded = _inject_scalar_limit(shielded)
    shielded = _rewrite_order_by_nulls(shielded)
    # Row-locking clauses from ORMs (SELECT … FOR UPDATE / FOR SHARE …):
    # this engine is a read-only analytics replica — pg itself allows these
    # on read-only standbys as no-ops, so stripping preserves semantics.
    shielded = re.sub(
        r"\bFOR\s+(?:NO\s+KEY\s+)?(?:UPDATE|KEY\s+SHARE|SHARE)"
        r"(?:\s+OF\s+[\w.\s,\"]+?)?(?:\s+NOWAIT|\s+SKIP\s+LOCKED)?\s*(?=;|\)|$)",
        "",
        shielded,
        flags=re.IGNORECASE,
    )
    # pg folds unquoted identifiers to lowercase — column aliases included
    # (`AS CASE` → column "case"); quoted ones are backticked by now and
    # unaffected. CAST type names (also written after AS) are left alone.
    _TYPEISH = {
        "string", "bigint", "int", "integer", "smallint", "tinyint", "long",
        "double", "float", "real", "decimal", "numeric", "boolean", "date",
        "timestamp", "timestamp_ntz", "binary", "array", "map", "struct",
        "varchar", "char", "interval", "variant", "byte", "short", "void",
    }
    shielded = re.sub(
        r"\bAS\s+([A-Za-z_][A-Za-z0-9_]*)",
        lambda m: m.group(0) if m.group(1).lower() in _TYPEISH
        else "AS " + m.group(1).lower(),
        shielded,
        flags=re.IGNORECASE,
    )
    out = _unshield(shielded, literals)
    # json-op rewrite leaves concat('$.', trim(BOTH '''' FROM 'key')) — fold it
    out = re.sub(
        r"concat\('\$\.', trim\(BOTH '''' FROM '([^']*)'\)\)",
        r"'$.\1'",
        out,
    )
    return out
