"""Capture the ivf index build's nearest-centroid assignment plan.

The assignment statement only exists *during* the k-means index build (the
materialized ``_km_cells`` view hides it behind a localCheckpoint), so
``capture_entry_plan.py`` can't see it.  This script rebuilds exactly what
``_kmeans_views`` runs — the centroid chain, checkpointed, then the final
assignment SELECT against ``_km_centroids`` — and dumps the assignment's
formatted plan before execution.

Usage: python tools/capture_kmeans_assign_plan.py <tag> <suffix> [out_root]
  e.g. (at HEAD)          python tools/capture_kmeans_assign_plan.py r10 after
       (in a worktree at the pre-change commit, writing into the main repo)
                          python tools/capture_kmeans_assign_plan.py r10 before /root/repo
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")


def main() -> None:
    from bemidb_spark.operators.similarity import _assign_select, _kmeans_ctes
    from bemidb_spark.session import build_session
    from bemidb_spark.tables import register_views

    tag, suffix = sys.argv[1], sys.argv[2]
    out_root = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    spark = build_session(app_name="capture-kmeans-assign-plan")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, SF_DIR)

    ctes, final_c = _kmeans_ctes(True)
    with_block = ",\n    ".join(ctes[:-1])
    cent = spark.sql(
        f"WITH {with_block}\n    SELECT cell, centroid FROM {final_c}"
    ).localCheckpoint(eager=True)
    cent.createOrReplaceTempView("_km_centroids")
    assign_df = spark.sql(_assign_select("_km_centroids", True))
    plan = assign_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    out_dir = os.path.join(out_root, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"kmeans_assign_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(
        f"wrote {path} ({plan.count('Exchange')} Exchange, "
        f"{plan.count('Sort')} Sort, {plan.count('Window')} Window, "
        f"{plan.count('HashAggregate')} HashAggregate refs)"
    )


if __name__ == "__main__":
    main()
