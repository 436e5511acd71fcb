"""Targeted sf10 wire re-execution probe (VERDICT r5 #2b).

BENCH_sf10.json recorded `wire_reexec_sequential_sec: null` — the full-bench
pass was lost to a co-tenant steal burst (honestly disclosed), leaving
README's sf10 wire number uncited. This probe measures ONLY that phase:
warm server, `SET bemidb.plan_cache_mode = reexecute` (protocol AND work
matched against the reference's `time psql` — every statement re-optimized
and re-executed, results wire-encoded), N timed passes of the 22 statements,
per-pass steal% + bandwidth canary.

Usage: SPARK_GRAFT_SF_DIR=.synth/sf10 python tools/probe_sf10_wire.py \
         [passes=2] [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bemidb_spark.operators import tpch
from bemidb_spark.session import apply_input_size_policy, build_session
from bemidb_spark.telemetry import bw_canary_sec, cpu_stat, steal_pct
from bemidb_spark.warehouse import ensure_warehouse

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", ".synth/sf10")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2
OUT = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else None


def main() -> None:
    from bemidb_spark.server.minipg import MiniPgClient
    from bemidb_spark.server.wire import WireServer
    from bemidb_spark.tables import register_views

    spark = build_session(app_name="sf10-wire-probe")
    spark.sparkContext.setLogLevel("ERROR")
    wh = ensure_warehouse(spark, SF_DIR)
    small = apply_input_size_policy(spark, [wh])
    register_views(spark, wh)
    srv = WireServer(spark)
    srv.start()
    cli = MiniPgClient(srv.host, srv.port, timeout=900)
    wire_sqls = [tpch.ORACLES[f"tpch_q{i}"] for i in range(1, 23)]
    r = cli.query("SET bemidb.plan_cache_mode = reexecute")
    assert not r["errors"], r["errors"]
    bw_canary_sec()  # untimed alloc
    # warm: 2 passes (plan-cache fill + codegen/JIT steady state)
    for _ in range(2):
        for s in wire_sqls:
            r = cli.query(s)
            assert not r["errors"], r["errors"]
    samples, st, bw, per_pass_q = [], [], [], []
    for _ in range(PASSES):
        bw.append(bw_canary_sec())
        c0 = cpu_stat()
        t0 = time.perf_counter()
        per_q = []
        for s in wire_sqls:
            t1 = time.perf_counter()
            cli.query(s)
            per_q.append(round(time.perf_counter() - t1, 3))
        samples.append(round(time.perf_counter() - t0, 3))
        st.append(steal_pct(c0, cpu_stat()))
        per_pass_q.append(per_q)
        print(json.dumps({"pass_sec": samples[-1], "steal_pct": st[-1],
                          "bw_canary_sec": bw[-1]}), flush=True)
    cli.close()
    srv.stop()
    report = {
        "sf_dir": SF_DIR, "small_profile": small, "mode": "wire_reexecute",
        "samples_sec": samples, "steal_pct": st, "bw_canary_sec": bw,
        "per_query_sec": per_pass_q,
    }
    if OUT:
        with open(OUT, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"# wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
