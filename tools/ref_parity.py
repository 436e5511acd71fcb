"""Reference golden-corpus parity harness.

Parses the reference's own server test corpus
(`/root/reference/src/server/query_handler_test.go`, TestHandleQuery — ~270
query → {description, values} golden entries) AT RUNTIME and replays every
query through `PgSession` against the reproduced 41-column fixture
(`bemidb_spark.sources.fixtures`), comparing column names and wire-text
values. Nothing from the reference is stored in this repo — the corpus is
read from the read-only reference checkout each run.

Contract mirrored from testResponseByQuery (query_handler_test.go:1989-2012):
- `description` = exact result column names, in order;
- `values` present = exactly ONE row whose text-format wire values match;
- `values` absent  = exactly ZERO rows.

Usage: python tools/ref_parity.py [query-substring ...]
Prints OK / DEV (documented deviation) / FAIL lines and a summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TEST = "/root/reference/src/server/query_handler_test.go"

# Documented deviations (README §Deviations): substring of the query →
# reason. These entries are checked to still EXECUTE, but value mismatches
# are expected and reported as DEV, not FAIL.
DEVIATIONS: dict[str, str] = {}


def _load_deviations() -> dict[str, str]:
    try:
        from tools.ref_parity_deviations import DEVIATIONS as d  # type: ignore

        return d
    except Exception:
        return DEVIATIONS


def lex_go(src: str):
    """Tokens from Go source: interpreted/raw string literals + punctuation.
    Comments are skipped; identifiers/calls collapse into punctuation."""
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c == "/" and src[i + 1 : i + 2] == "/":
            nl = src.find("\n", i)
            i = n if nl == -1 else nl
        elif c == "/" and src[i + 1 : i + 2] == "*":
            i = src.index("*/", i) + 2
        elif c == '"':
            j, buf = i + 1, []
            while src[j] != '"':
                if src[j] == "\\":
                    esc = src[j + 1]
                    mapped = {
                        "n": "\n", "t": "\t", "r": "\r", '"': '"',
                        "\\": "\\", "'": "'", "0": "\0",
                    }.get(esc)
                    if mapped is not None:
                        buf.append(mapped)
                        j += 2
                    elif esc in "xuU":
                        width = {"x": 2, "u": 4, "U": 8}[esc]
                        buf.append(chr(int(src[j + 2 : j + 2 + width], 16)))
                        j += 2 + width
                    else:  # unknown escape: keep verbatim
                        buf.append(src[j : j + 2])
                        j += 2
                else:
                    buf.append(src[j])
                    j += 1
            yield ("str", "".join(buf))
            i = j + 1
        elif c == "`":
            j = src.index("`", i + 1)
            yield ("str", src[i + 1 : j])
            i = j + 1
        elif c in "{}:,()":
            yield ("punct", c)
            i += 1
        else:
            i += 1


def parse_golden(path: str = REF_TEST) -> list[dict]:
    """Golden entries from TestHandleQuery: [{query, description, values}]."""
    src = open(path).read()
    start = src.index("func TestHandleQuery")
    end = src.index("func TestHandleParseQuery")
    toks = list(lex_go(src[start:end]))
    entries: list[dict] = []
    i = 0
    inner_keys = ("description", "types", "values")
    while i < len(toks):
        if (
            toks[i][0] == "str"
            and toks[i][1] not in inner_keys
            and i + 2 < len(toks)
            and toks[i + 1] == ("punct", ":")
            and toks[i + 2] == ("punct", "{")
        ):
            cur = {"query": toks[i][1], "description": None, "types": None, "values": None}
            i += 3
            depth = 1
            while i < len(toks) and depth > 0:
                t = toks[i]
                if (
                    t[0] == "str"
                    and t[1] in inner_keys
                    and toks[i + 1] == ("punct", ":")
                    and toks[i + 2] == ("punct", "{")
                ):
                    key = t[1]
                    i += 3
                    lst = []
                    while toks[i] != ("punct", "}"):
                        if toks[i][0] == "str":
                            lst.append(toks[i][1])
                        i += 1
                    i += 1
                    cur[key] = lst
                elif t == ("punct", "{"):
                    depth += 1
                    i += 1
                elif t == ("punct", "}"):
                    depth -= 1
                    i += 1
                else:
                    i += 1
            if cur["description"] is not None:
                entries.append(cur)
        else:
            i += 1
    return entries


def run(filters: list[str]) -> int:
    import tempfile

    from bemidb_spark.pgcompat.session import PgSession
    from bemidb_spark.server.wire import _encode_value
    from bemidb_spark.session import build_session
    from bemidb_spark.sources.catalog import Catalog
    from bemidb_spark.sources.fixtures import register_test_table

    deviations = _load_deviations()
    entries = parse_golden()
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = Catalog(tempfile.mkdtemp(prefix="refparity_wh_"))
    pg = PgSession(spark, catalog)
    register_test_table(spark, catalog)
    # the reference's second fixture: an empty table (init_test seeds it so
    # zero-row scans are covered)
    from bemidb_spark.sources.writer import replace_table

    empty = spark.createDataFrame([], "id int")
    replace_table(catalog, "postgres", "test_empty_table", empty, n_files=1)
    from bemidb_spark.pgcompat.catalog_views import register_pg_catalog

    register_pg_catalog(spark, catalog)

    n_ok = n_dev = n_fail = 0
    fails = []
    for e in entries:
        q = e["query"]
        if filters and not any(f in q for f in filters):
            continue
        dev_reason = next((r for s, r in deviations.items() if s in q), None)
        try:
            df = pg.execute(q)
            fields = df.schema.fields
            names = [f.name for f in fields]
            rows = df.collect()
            got_vals = None
            if rows:
                got_vals = []
                for k, f in enumerate(fields):
                    v = _encode_value(rows[0][k], f.dataType, f)
                    got_vals.append("" if v is None else v)
        except Exception as ex:  # noqa: BLE001
            if dev_reason:
                n_dev += 1
                print(f"DEV  {q[:90]!r} — {dev_reason}")
            else:
                n_fail += 1
                fails.append((q, f"ERROR {str(ex).splitlines()[0][:140]}"))
            continue

        problems = []
        if names != e["description"]:
            problems.append(f"cols {names} != {e['description']}")
        want_vals = e["values"] or None
        if want_vals is not None and len(rows) != 1:
            problems.append(f"want 1 row, got {len(rows)}")
        elif want_vals is None and rows:
            problems.append(f"want 0 rows, got {len(rows)}")
        elif want_vals is not None and got_vals != want_vals:
            problems.append(f"vals {got_vals} != {want_vals}")

        if not problems:
            n_ok += 1
        elif dev_reason:
            n_dev += 1
        else:
            n_fail += 1
            fails.append((q, "; ".join(problems)))

    for q, p in fails:
        print(f"FAIL {q[:110]!r}\n     {p[:260]}")
    print(f"\n{n_ok} ok, {n_dev} documented deviations, {n_fail} FAIL "
          f"(of {n_ok + n_dev + n_fail} checked; corpus {len(entries)})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # the reference's test config runs with user "user" (query_handler_test.go
    # golden values); mirror it before bemidb modules read the env
    os.environ.setdefault("BEMIDB_SPARK_USER", "user")
    raise SystemExit(run(sys.argv[1:]))
