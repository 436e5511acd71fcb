"""Capture .explain("formatted") for arbitrary registry entries.

Usage: python tools/capture_entry_plan.py <tag> <suffix> <name> [name ...]
Writes plans/<tag>/<name>_<suffix>.txt against the gate SF dir (sf0.01 by
default, like tools/run_gate.py) so plan shapes match what the gate runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")


def main() -> None:
    import __spark_entry__ as entry_mod

    from bemidb_spark.session import build_session

    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    spark = build_session(app_name="capture-entry-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs, "
              f"{len(plan)} chars)")


if __name__ == "__main__":
    main()
