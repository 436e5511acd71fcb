"""Reexec variance probe with per-task telemetry.

Round 3 used this to isolate the 85-119 s GC-stall passes at sf0.1 (fixed by
ExplicitGCInvokesConcurrent). Round 5 extends it for the sf1 bimodal slow
mode (judge repro: passes 26-176 s concentrated in q2/q5/q18/q21, ZERO full
GCs): wall timings alone can't distinguish a straggler task from spill from
driver-side (optimize/broadcast-build) time, so the probe now also enables
the Spark event log and, after the run, attributes every (pass, query) to:

  - task_run_ms   summed executor run time across tasks
  - gc_ms         summed JVM GC time charged to tasks
  - spill_mb      memory+disk bytes spilled
  - shuffle_w_mb  shuffle bytes written
  - max_task_ms   slowest single task (straggler detector)
  - tasks         task count
  - jobs_span_ms  first-job-submit .. last-job-complete wall
  - pre_job_ms    query wall before the first job (driver: re-optimize,
                  physical planning, codegen lookup)
  - gap_ms        jobs_span - sum(job walls): driver time BETWEEN jobs
                  (broadcast builds, AQE stage barriers)

Usage: python tools/reexec_probe.py [passes=8] [sf_dir] [--json out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bemidb_spark.operators import tpch
from bemidb_spark.session import apply_input_size_policy, build_session
from bemidb_spark.session import reexecute
from bemidb_spark.warehouse import ensure_warehouse

PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT_JSON = None
if "--json" in sys.argv:
    OUT_JSON = sys.argv[sys.argv.index("--json") + 1]
# experiment knobs (sf1 slow-mode bisection):
DRAIN = "--drain" in sys.argv  # bench-style System.gc()+sleep between passes
BCAST = None  # override autoBroadcastJoinThreshold (bytes)
if "--bcast" in sys.argv:
    BCAST = sys.argv[sys.argv.index("--bcast") + 1]
CONFS = {}  # arbitrary runtime-conf overrides, applied before plan prep
for i, a in enumerate(sys.argv):
    if a == "--conf":
        k, v = sys.argv[i + 1].split("=", 1)
        CONFS[k] = v

EVLOG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".probe_eventlog"
)


def gc_stats(spark) -> dict[str, tuple[int, int]]:
    out = {}
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    it = beans.iterator()
    while it.hasNext():
        b = it.next()
        out[b.getName()] = (b.getCollectionCount(), b.getCollectionTime())
    return out


# per-pass host-steal attribution + memory-bandwidth canary: steal% catches
# a CPU-stealing co-tenant; bw_canary_sec catches neighbor memory-bandwidth
# pressure steal% is blind to (r5 judge's 18.9 s idle-host window vs the
# builder's 14.9 s, both ~0% steal). Shared with bench.py (telemetry.py).
from bemidb_spark.telemetry import (  # noqa: E402
    bw_canary_mt_sec,
    bw_canary_sec,
    cpu_stat,
)


def parse_event_log(path: str) -> dict[str, dict]:
    """Aggregate task/job metrics per job-group id from a Spark event log."""
    stage_to_group: dict[int, str] = {}
    job_to_group: dict[int, str] = {}
    job_submit: dict[int, int] = {}
    job_complete: dict[int, int] = {}
    agg: dict[str, dict] = defaultdict(lambda: {
        "task_run_ms": 0, "gc_ms": 0, "spill_b": 0, "shuffle_w_b": 0,
        "max_task_ms": 0, "tasks": 0, "sched_delay_ms": 0,
        "jobs": [],
    })
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                if not grp:
                    continue
                jid = ev["Job ID"]
                job_to_group[jid] = grp
                job_submit[jid] = ev.get("Submission Time", 0)
                for sid in ev.get("Stage IDs", []):
                    stage_to_group[sid] = grp
            elif t == "SparkListenerJobEnd":
                job_complete[ev["Job ID"]] = ev.get("Completion Time", 0)
            elif t == "SparkListenerTaskEnd":
                grp = stage_to_group.get(ev.get("Stage ID"))
                if grp is None:
                    continue
                m = ev.get("Task Metrics") or {}
                info = ev.get("Task Info") or {}
                a = agg[grp]
                run = m.get("Executor Run Time", 0)
                a["task_run_ms"] += run
                a["gc_ms"] += m.get("JVM GC Time", 0)
                a["spill_b"] += m.get("Memory Bytes Spilled", 0) + m.get(
                    "Disk Bytes Spilled", 0
                )
                a["shuffle_w_b"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                a["max_task_ms"] = max(a["max_task_ms"], run)
                a["tasks"] += 1
                launch, finish = info.get("Launch Time", 0), info.get("Finish Time", 0)
                task_wall = max(0, finish - launch)
                a["sched_delay_ms"] += max(
                    0,
                    task_wall
                    - run
                    - m.get("Executor Deserialize Time", 0)
                    - m.get("Result Serialization Time", 0),
                )
    for jid, grp in job_to_group.items():
        s, c = job_submit.get(jid, 0), job_complete.get(jid, 0)
        if s and c:
            agg[grp]["jobs"].append((s, c))
    out = {}
    for grp, a in agg.items():
        jobs = sorted(a.pop("jobs"))
        if jobs:
            span = jobs[-1][1] - jobs[0][0]
            gap = span - sum(c - s for s, c in jobs)
            first_submit = jobs[0][0]
        else:
            span, gap, first_submit = 0, 0, None
        a["jobs_span_ms"] = span
        a["gap_ms"] = gap
        a["n_jobs"] = len(jobs)
        a["first_submit"] = first_submit
        a["spill_mb"] = round(a.pop("spill_b") / (1 << 20), 1)
        a["shuffle_w_mb"] = round(a.pop("shuffle_w_b") / (1 << 20), 1)
        out[grp] = a
    return out


def main() -> None:
    shutil.rmtree(EVLOG_DIR, ignore_errors=True)
    os.makedirs(EVLOG_DIR, exist_ok=True)
    spark = build_session(app_name="reexec-probe", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{EVLOG_DIR}",
        # single plain-text file (Spark 4 defaults to rolling + zstd)
        "spark.eventLog.rolling.enabled": "false",
        "spark.eventLog.compress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    wh = ensure_warehouse(spark, SF_DIR)
    small = apply_input_size_policy(spark, [wh])
    if BCAST is not None:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", BCAST)
    for k, v in CONFS.items():
        spark.conf.set(k, v)
    prepared = {i: tpch.QUERIES[f"tpch_q{i}"](spark, wh) for i in range(1, 23)}
    # same warm-up shape as bench.py
    for _ in range(2):
        for i in range(1, 23):
            prepared[i].collect()
    for _ in range(2):
        for i in range(1, 23):
            reexecute(prepared[i]).collect()

    print(f"# small_profile={small} passes={PASSES} sf_dir={SF_DIR} "
          f"drain={DRAIN} bcast={BCAST} confs={CONFS}", flush=True)
    passes: list[dict] = []
    query_wall: dict[str, float] = {}  # group -> wall sec
    query_start: dict[str, float] = {}  # group -> epoch ms at python call
    bw_canary_sec()  # untimed: first call pays buffer allocation
    bw_canary_mt_sec()
    for p in range(PASSES):
        if DRAIN:
            spark._jvm.System.gc()
            time.sleep(1.0)
        bw_canary = bw_canary_sec()
        # N-thread canary (VERDICT r6 #2): the 1-thread triad provably
        # under-measures the contention a 32-thread suite feels (a 151 s
        # degraded pass read 0.37 s ≈ 1.5× baseline on 1 thread); 8
        # GIL-released triads contend for the controller like a stage does
        bw_canary_mt = bw_canary_mt_sec()
        gc0, t0 = gc_stats(spark), time.perf_counter()
        cpu0 = cpu_stat()
        per_q = {}
        for i in range(1, 23):
            grp = f"p{p}.q{i}"
            sc.setJobGroup(grp, grp)
            query_start[grp] = time.time() * 1000.0
            t1 = time.perf_counter()
            reexecute(prepared[i]).collect()
            w = time.perf_counter() - t1
            per_q[f"q{i}"] = round(w, 3)
            query_wall[grp] = w
        total = round(time.perf_counter() - t0, 3)
        gc1 = gc_stats(spark)
        cpu1 = cpu_stat()
        # end-of-pass canary: the start-of-pass sample misses contention
        # bursts that begin mid-pass (seen in probe_sf1_r6wave2 pass 5 —
        # 124 s wall, normal start canary); bracketing the pass catches
        # bursts still active at pass end
        bw_canary_end = bw_canary_sec()
        bw_canary_mt_end = bw_canary_mt_sec()
        steal_pct = round(
            100.0 * (cpu1[1] - cpu0[1]) / max(1, cpu1[0] - cpu0[0]), 2)
        gc_delta = {
            n: (gc1[n][0] - gc0.get(n, (0, 0))[0], gc1[n][1] - gc0.get(n, (0, 0))[1])
            for n in gc1
        }
        gc_ms_total = sum(v[1] for v in gc_delta.values())
        worst = sorted(per_q.items(), key=lambda kv: -kv[1])[:4]
        passes.append({"pass": p, "total": total, "per_q": per_q,
                       "steal_pct": steal_pct, "bw_canary_sec": bw_canary,
                       "bw_canary_end_sec": bw_canary_end,
                       "bw_canary_mt_sec": bw_canary_mt,
                       "bw_canary_mt_end_sec": bw_canary_mt_end,
                       "gc_ms": gc_ms_total})
        print(json.dumps({
            "pass": p, "total": total, "steal_pct": steal_pct,
            "bw_canary_sec": bw_canary, "bw_canary_end_sec": bw_canary_end,
            "bw_canary_mt_sec": bw_canary_mt,
            "bw_canary_mt_end_sec": bw_canary_mt_end,
            "gc_count_ms": gc_delta, "worst4": worst,
        }), flush=True)

    app_id = sc.applicationId
    spark.stop()  # closes/renames the event log
    log_path = None
    for cand in (os.path.join(EVLOG_DIR, app_id),
                 os.path.join(EVLOG_DIR, app_id + ".inprogress")):
        if os.path.isfile(cand):
            log_path = cand
            break
    report = {"sf_dir": SF_DIR, "small_profile": small, "passes": passes}
    # Tail attribution (VERDICT r6 #2): bucket every >1.5x-median pass by
    # cause. A pass can carry several attributions; "unattributed" survivors
    # are the engine-bug candidates the round must chase.
    totals = sorted(p["total"] for p in passes)
    median = totals[len(totals) // 2]
    bw_all = [p["bw_canary_sec"] for p in passes] + [p["bw_canary_end_sec"] for p in passes]
    mt_all = [p["bw_canary_mt_sec"] for p in passes] + [p["bw_canary_mt_end_sec"] for p in passes]
    bw_med = sorted(bw_all)[len(bw_all) // 2]
    mt_med = sorted(mt_all)[len(mt_all) // 2]
    tail = []
    for p in passes:
        if p["total"] <= 1.5 * median:
            continue
        causes = []
        if p["steal_pct"] > 3.0:
            causes.append("cpu-steal")
        if max(p["bw_canary_sec"], p["bw_canary_end_sec"]) > 1.4 * bw_med:
            causes.append("bandwidth-1t")
        if max(p["bw_canary_mt_sec"], p["bw_canary_mt_end_sec"]) > 1.4 * mt_med:
            causes.append("bandwidth-mt")
        if p["gc_ms"] > 0.2 * p["total"] * 1000:
            causes.append("gc")
        tail.append({"pass": p["pass"], "total": p["total"],
                     "vs_median": round(p["total"] / median, 2),
                     "causes": causes or ["UNATTRIBUTED"]})
    report["tail_attribution"] = {
        "median_total": median, "bw_canary_median": bw_med,
        "bw_canary_mt_median": mt_med, "slow_passes": tail,
        "unattributed": sum(1 for t in tail if t["causes"] == ["UNATTRIBUTED"]),
    }
    if tail:
        print(json.dumps({"tail_attribution": report["tail_attribution"]},
                         ), flush=True)
    if log_path:
        groups = parse_event_log(log_path)
        detail = {}
        for grp, a in groups.items():
            wall_ms = query_wall.get(grp, 0) * 1000.0
            start_ms = query_start.get(grp)
            pre = (a["first_submit"] - start_ms) if (start_ms and a["first_submit"]) else None
            detail[grp] = {
                "wall_ms": round(wall_ms),
                "pre_job_ms": round(pre) if pre is not None else None,
                **{k: a[k] for k in (
                    "task_run_ms", "gc_ms", "spill_mb", "shuffle_w_mb",
                    "max_task_ms", "tasks", "sched_delay_ms",
                    "jobs_span_ms", "gap_ms", "n_jobs",
                )},
            }
        report["queries"] = detail
        # print the 10 slowest (pass, query) cells with attribution
        slowest = sorted(detail.items(), key=lambda kv: -kv[1]["wall_ms"])[:10]
        for grp, d in slowest:
            print(json.dumps({"slow": grp, **d}), flush=True)
    else:
        print("# event log not found", flush=True)
    if OUT_JSON:
        with open(OUT_JSON, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"# wrote {OUT_JSON}", flush=True)


if __name__ == "__main__":
    main()
