"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at sf0.01, compares
against ``oracle_sql()`` via DuckDB (rows + schema + order-insensitive value
multiset), times each query, and additionally flags output columns with
complex Spark types (array/map/struct) — the driver's pandas canonicalizer
cannot hash those, so they must be serialized (``to_json``) at the contract
boundary.

Usage: python tools/run_gate.py [--no-snapshot] [name-substring ...]

``--no-snapshot`` skips writing gate_last.json — for judge/CI spot checks of
a few entries that shouldn't dirty the working tree with a partial merge.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")


def _commit() -> str:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True,
            text=True,
            timeout=10,
        )
        return out.stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001
        return "unknown"


def main() -> int:
    import __spark_entry__ as entry_mod
    from pyspark.sql import types as T

    from bemidb_spark.oracle import compare
    from bemidb_spark.session import build_session

    args = sys.argv[1:]
    snapshot = "--no-snapshot" not in args
    filters = [a for a in args if not a.startswith("--")]
    spark = build_session()
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    commit = _commit()
    stamp = time.strftime("%Y-%m-%dT%H:%M:%S")

    results: dict[str, dict] = {}
    failed = []
    for name, fn in queries.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.monotonic()
        row = {
            "ok": None,
            "sec": None,
            "rows": None,
            "complex_cols": [],
            "oracle": name in oracles,
            "commit": commit,
            "ran_at": stamp,
        }
        try:
            df = fn(spark, SF_DIR)
            row["complex_cols"] = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
            ]
            if name in oracles:
                compare(df, oracles[name], SF_DIR)
                row["rows"] = df.count()
            else:
                row["rows"] = df.count()  # rows-only entry (e.g. sketches)
            row["ok"] = True
        except Exception as e:  # noqa: BLE001
            row["ok"] = False
            row["err"] = f"{type(e).__name__}: {e}"[:500]
            failed.append(name)
            traceback.print_exc()
        row["sec"] = round(time.monotonic() - t0, 2)
        results[name] = row
        flag = "OK " if row["ok"] else "FAIL"
        extra = f" COMPLEX={row['complex_cols']}" if row["complex_cols"] else ""
        extra += "" if row["oracle"] else " (rows-only)"
        print(f"{flag} {name:34s} {row['sec']:6.2f}s rows={row['rows']}{extra}", flush=True)

    n = len(results)
    n_ok = sum(1 for r in results.values() if r["ok"])
    n_complex = sum(1 for r in results.values() if r["complex_cols"])
    print(f"\n{n_ok}/{n} ok, {len(failed)} failed, {n_complex} with complex output cols")
    if failed:
        print("FAILED:", ", ".join(failed))
    if not snapshot:
        return 1 if failed else 0
    out_path = os.path.join(os.path.dirname(__file__), "gate_last.json")
    if filters and os.path.exists(out_path):
        # Filtered run: merge into the last snapshot instead of clobbering, but
        # flag the result as partial — per-entry commit/ran_at stamps show which
        # code version each row actually ran at, and only a full unfiltered run
        # clears the flag (so a "green" snapshot can't be stitched from runs of
        # different code versions without that being visible).
        with open(out_path) as f:
            merged = json.load(f)
        merged.pop("_meta", None)
        merged.update(results)
        results = merged
        meta = {"partial": True, "merged_at": stamp, "merged_commit": commit}
    else:
        meta = {"partial": False, "full_run_commit": commit, "ran_at": stamp}
    results["_meta"] = meta
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
