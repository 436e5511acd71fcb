"""bench.py driver contract: stdout is EXACTLY one parseable JSON line.

The driver records bench.py's stdout as BENCH_r{N}.json — any stray print,
JVM log line, or progress bar on stdout corrupts the round's performance
artifact (it happened once at sf10: a GC warning landed in front of the
JSON; bench now routes JVM unified logging to stderr). This test runs the
real script end-to-end at sf0.001 in a subprocess and pins:

- the LAST stdout line is compact valid JSON (the driver parses a bounded
  tail window — VERDICT r7 #4) with totals + per-query + headline arms;
- the full telemetry rides a preceding '# bench-telemetry:' line AND the
  tools/bench_last_full.json artifact, with every field the driver and the
  judge read, including the r6/r7 additions (per-phase steal% + bandwidth
  canaries, GC ms, wire soak with error count, wire value check);
- the wire soak finished with zero unexpected errors.

~2 min of runtime buys regression-proofing for the artifact every round's
grading depends on.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_stdout_is_one_json_line_with_contract_fields():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    # 1800 s: the bench itself runs ~3-6 min at sf0.001 on a quiet host, but
    # the sandbox shares hardware — a co-tenant steal window stretched one
    # full-suite run past the old 900 s bound (r10 inherited-state triage:
    # same tree re-ran green at 707 s in isolation, prepare phase alone hit
    # 74 s under 10% steal). The timeout bounds a genuine hang, not host
    # noise, so give it the headroom noise needs.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    # contract: a compact final JSON line + one telemetry line before it
    assert len(lines) == 2, f"stdout must be telemetry + final line, got {lines[:5]}"
    assert lines[0].startswith("# bench-telemetry: ")
    compact = json.loads(lines[-1])
    assert len(lines[-1]) < 1900, "final line must fit the driver tail window"
    assert compact["metric"] == "tpch_22q_total" and compact["unit"] == "sec"
    assert compact["sf"] == 0.001
    assert set(compact["queries"]) == {f"q{i}" for i in range(1, 23)}
    for field in ("reexec_sequential_sec", "wire_sequential_sec",
                  "pipeline_sec"):
        assert field in compact, f"missing compact field {field}"
    d = json.loads(lines[0][len("# bench-telemetry: "):])
    # the committed artifact mirrors the telemetry line
    with open(os.path.join(REPO, "tools", "bench_last_full.json")) as fh:
        assert json.load(fh) == d

    assert d["metric"] == "tpch_22q_total" and d["unit"] == "sec"
    assert d["sf"] == 0.001
    assert set(d["queries"]) == {f"q{i}" for i in range(1, 23)}
    for field in (
        "sequential_sec", "sequential_samples",
        "reexec_sequential_sec", "reexec_sequential_samples",
        "reexec_steal_pct", "reexec_bw_canary_sec",
        "reexec_min_sec", "reexec_max_sec",
        "concurrent_sec",
        "wire_sequential_sec", "wire_steal_pct", "wire_bw_canary_sec",
        "wire_reexec_sequential_sec", "wire_reexec_steal_pct",
        "wire_reexec_bw_canary_sec",
        "wire_concurrent_sec", "wire_concurrent_errors",
        "wire_concurrent_steal_pct", "wire_concurrent_bw_canary_sec",
        "cold_sequential_sec", "cold_steal_pct", "cold_bw_canary_sec",
        "prepare_sec", "ingest_sec", "pipeline_sec", "small_input_profile",
        # r7 additions: multi-thread bandwidth canary + per-pass GC time
        # (sf1 tail attribution), dual-profile marker, wire value check
        "reexec_bw_canary_mt_sec", "reexec_gc_ms", "wire_reexec_gc_ms",
        "wire_value_check", "dual_profile",
    ):
        assert field in d, f"missing contract field {field}"
    # every timed phase carries one host-condition reading per sample; the
    # reexec canaries BRACKET the samples (n+1 readings: one before each
    # sample plus a closing one — mid-pass-burst coverage, r6)
    assert len(d["reexec_steal_pct"]) == len(d["reexec_sequential_samples"])
    assert (len(d["reexec_bw_canary_sec"])
            == len(d["reexec_sequential_samples"]) + 1)
    # the multi-client soak must have completed cleanly
    assert d["wire_concurrent_errors"] == 0
    assert d["wire_concurrent_sec"] is not None and d["wire_concurrent_sec"] > 0
    # the wire value spot-check ran and byte-matched the resident arm
    assert d["wire_value_check"] and d["wire_value_check"]["match"] is True
    assert len(d["reexec_gc_ms"]) == len(d["reexec_sequential_samples"])
    # deliberate soak errors are labeled on stderr, not anonymous
    assert "# soak-expected-error: BEGIN" in proc.stderr
