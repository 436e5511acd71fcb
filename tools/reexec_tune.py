"""Empirical knob sweep for the honest re-execution suite (bench.py's
`reexec_sequential_sec`).

The suite's floor at sf0.1 is distributed-execution fixed cost (stage
scheduling, exchange setup, range-partition sampling for sorts) — not data
work. This harness re-runs the 22-query reexec pass under a grid of
RUNTIME-settable conf variants inside one JVM (so JIT/codegen state is
shared and variants are comparable) and reports the median pass time per
variant. Used to choose the small-input profile in
`bemidb_spark.session.apply_input_size_policy`.

Usage: python tools/reexec_tune.py [passes_per_variant=3] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bemidb_spark.operators import tpch
from bemidb_spark.session import apply_input_size_policy, build_session, reexecute
from bemidb_spark.warehouse import ensure_warehouse

PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

# Each variant: label -> {conf: value}. Only runtime-settable SQLConf /
# mutable core confs. The baseline is the current small-input profile
# (adaptive off, 8 shuffle partitions).
_NC = {"spark.sql.constraintPropagation.enabled": "false"}
VARIANTS: dict[str, dict[str, str]] = {
    # Round 2 of the sweep: round 1 (recorded in the r4 notes) found
    # noconstraints the only material win (6.05 -> 5.65 median); partitions
    # 8/4/2 within noise, sp1 / minPartitionNum=1 / AQE-on all regressions.
    "baseline_sp8": {},
    "nc": dict(_NC),
    "nc_nocompress": {
        **_NC,
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
    "nc_norule_per": {
        **_NC,
        "spark.sql.optimizer.excludedRules": (
            "org.apache.spark.sql.catalyst.optimizer.PropagateEmptyRelation"
        ),
    },
    "nc_maxpart64m": {
        **_NC,
        "spark.sql.files.maxPartitionBytes": str(64 * 1024 * 1024),
    },
    "nc_opencost1m": {
        **_NC,
        "spark.sql.files.openCostInBytes": str(1 * 1024 * 1024),
    },
    # Round 3 of the sweep (r5): probe telemetry shows a sf0.1 pass runs 94
    # jobs — ~4.3 per query — because every broadcast join is its own job
    # plus a single-threaded driver hash-relation build (gap_ms 1.7 s/pass,
    # pre_job 1.0 s/pass). With AQE off a pure shuffle-join query is ONE
    # job, and sf0.1 shuffles are <= 7 MB; test whether killing broadcasts
    # outright trades cheap tiny shuffles for all that driver fixed cost.
    "nc_nobcast": {
        **_NC,
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    },
    "nc_bcast1m": {
        **_NC,
        "spark.sql.autoBroadcastJoinThreshold": str(1 * 1024 * 1024),
    },
    "nc_nobcast_sp4": {
        **_NC,
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "4",
    },
    # Round 4 of the sweep: stack the 1 MB winner with the other marginal
    # round-2 wins to see whether they compose toward the 4.6 s budget.
    "b1m": {
        **_NC,
        "spark.sql.autoBroadcastJoinThreshold": str(1 * 1024 * 1024),
    },
    "b1m_maxpart64m": {
        **_NC,
        "spark.sql.autoBroadcastJoinThreshold": str(1 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(64 * 1024 * 1024),
    },
    "b1m_norule_per": {
        **_NC,
        "spark.sql.autoBroadcastJoinThreshold": str(1 * 1024 * 1024),
        "spark.sql.optimizer.excludedRules": (
            "org.apache.spark.sql.catalyst.optimizer.PropagateEmptyRelation"
        ),
    },
    "b1m_sp4": {
        **_NC,
        "spark.sql.autoBroadcastJoinThreshold": str(1 * 1024 * 1024),
        "spark.sql.shuffle.partitions": "4",
    },
    # Round 5 of the sweep (r9 optimization round): shave per-query driver
    # re-optimization (pre_job ~45 ms/query) by dropping rules that cannot
    # fire on this workload at sub-GB scale (no partitioned tables -> DPP
    # never applies; no bloom filter ever injected at these sizes — grep of
    # the committed plans shows zero bloom_filter_agg).
    "b1m_norules2": {
        **_NC,
        "spark.sql.autoBroadcastJoinThreshold": str(1 * 1024 * 1024),
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
        "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
    },
    # Spark 4's single-pass analyzer (HybridAnalyzer runs it when enabled):
    # targets the analysis share of cold/prepared planning.
    "b1m_singlepass": {
        **_NC,
        "spark.sql.autoBroadcastJoinThreshold": str(1 * 1024 * 1024),
        "spark.sql.analyzer.singlePassResolver.enabled": "true",
    },
}

BASE_SMALL = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": "8",
    "spark.sql.constraintPropagation.enabled": "true",
    # r5: the shipped default dropped 64 MB -> 10 MB (driver-side hash-
    # relation builds at sf1 were the bimodal-slow-mode source); keep the
    # sweep baseline identical to what build_session ships.
    "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
}
# Confs a variant may set that have no valid "default" value — unset on reset.
UNSET_ON_RESET = [
    "spark.sql.files.minPartitionNum",
    "spark.sql.optimizer.excludedRules",
]
BASE_SMALL.update({
    "spark.shuffle.compress": "true",
    "spark.shuffle.spill.compress": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
})


def main() -> None:
    spark = build_session(app_name="reexec-tune")
    spark.sparkContext.setLogLevel("ERROR")
    wh = ensure_warehouse(spark, SF_DIR)
    apply_input_size_policy(spark, [wh])
    prepared = {i: tpch.QUERIES[f"tpch_q{i}"](spark, wh) for i in range(1, 23)}

    def one_pass() -> float:
        t0 = time.perf_counter()
        for i in range(1, 23):
            reexecute(prepared[i]).collect()
        return round(time.perf_counter() - t0, 3)

    # Global warm-up to steady-state JIT (same shape as bench.py).
    for _ in range(2):
        for i in range(1, 23):
            prepared[i].collect()
    for _ in range(6):
        one_pass()

    # Interleave passes ROUND-ROBIN across variants (ADVICE r4): sequential
    # per-variant blocks let later variants ride accumulated JIT/codegen
    # state, biasing comparisons at the ~0.4 s effect sizes this sweep is
    # used to justify. Round-robin spreads any drift evenly; medians are
    # taken across the interleaved samples.
    def _apply(label: str, conf: dict[str, str]) -> None:
        skipped = []
        for k in UNSET_ON_RESET:
            try:
                spark.conf.unset(k)
            except Exception:  # noqa: BLE001 — static conf; note and move on
                skipped.append(k)
        for k, v in {**BASE_SMALL, **conf}.items():
            try:
                spark.conf.set(k, v)
            except Exception:  # noqa: BLE001 — static conf; note and move on
                skipped.append(k)
        if skipped:
            print(f"# {label}: not runtime-settable: {skipped}", flush=True)

    # Optional focus list: SPARK_GRAFT_TUNE_VARIANTS="nc,nc_bcast1m" runs a
    # targeted A/B instead of the full grid (tighter interleave -> the two
    # arms share each other's host window almost sample-for-sample).
    focus = os.environ.get("SPARK_GRAFT_TUNE_VARIANTS")
    variants = dict(VARIANTS)
    if focus:
        keep = [v.strip() for v in focus.split(",")]
        variants = {k: VARIANTS[k] for k in keep}

    def _steal() -> tuple[int, int]:
        with open("/proc/stat") as fh:
            f = fh.readline().split()
        vals = [int(x) for x in f[1:9]]
        return sum(vals), vals[7]

    samples: dict[str, list[float]] = {label: [] for label in variants}
    steals: dict[str, list[float]] = {label: [] for label in variants}
    for label, conf in variants.items():  # per-variant codegen warm-up
        _apply(label, conf)
        one_pass()
    for rnd in range(PASSES):
        order = list(variants.items())
        if rnd % 2:  # alternate direction so slot-in-round effects cancel
            order = order[::-1]
        for label, conf in order:
            _apply(label, conf)
            c0 = _steal()
            t = one_pass()
            c1 = _steal()
            samples[label].append(t)
            steals[label].append(
                round(100.0 * (c1[1] - c0[1]) / max(1, c1[0] - c0[0]), 2))

    results: dict[str, dict] = {}
    for label in samples:
        s = sorted(samples[label])
        results[label] = {
            "median": s[len(s) // 2],
            "samples": s,
            "steal_pct": steals[label],
        }
        print(f"{label:24s} median={results[label]['median']:6.3f}  {s}  "
              f"steal={steals[label]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
