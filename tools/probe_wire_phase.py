"""Phase attribution for the wire-protocol serving path (bench.py's
wire_sequential_sec).

wire_sequential at sf0.1 runs ~3.8 s vs ~0.9 s for the same 22 resident
Datasets collected directly — ~130 ms/statement of serving overhead. This
probe splits that overhead into its phases, per statement and summed:

  execute_ms   PgSession.execute on a warm plan cache (dict hit + guards)
  collect_ms   df.collect() on the resident Dataset (1 job)
  tolocal_ms   list(df.toLocalIterator(prefetchPartitions=True)) —
               what the server's _row_stream actually pays (job/partition)
  encode_ms    text-encoding every cell of the collected rows
  wire_ms      full client round trip via MiniPgClient (socket + server)

Usage: python tools/probe_wire_phase.py [sf_dir] [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bemidb_spark.operators import tpch
from bemidb_spark.session import apply_input_size_policy, build_session
from bemidb_spark.warehouse import ensure_warehouse

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT_JSON = None
if "--json" in sys.argv:
    OUT_JSON = sys.argv[sys.argv.index("--json") + 1]


def main() -> None:
    from bemidb_spark.server.minipg import MiniPgClient
    from bemidb_spark.server.wire import WireServer, _encode_value
    from bemidb_spark.tables import register_views

    spark = build_session(app_name="probe-wire-phase")
    spark.sparkContext.setLogLevel("ERROR")
    wh = ensure_warehouse(spark, SF_DIR)
    apply_input_size_policy(spark, [wh])
    register_views(spark, wh)

    srv = WireServer(spark)
    srv.start()
    cli = MiniPgClient(srv.host, srv.port, timeout=600)
    sqls = {f"q{i}": tpch.ORACLES[f"tpch_q{i}"] for i in range(1, 23)}

    # Warm: 2 passes through the wire (fills the per-connection plan cache
    # and JITs the resident plans), plus direct collects.
    for _ in range(2):
        for s in sqls.values():
            r = cli.query(s)
            assert not r["errors"], r["errors"]

    # A private PgSession mirroring the wire connection's cache behavior for
    # the server-side phases (the wire connection's own session is not
    # reachable from here; same class, same settings).
    from bemidb_spark.pgcompat.session import PgSession

    sess = PgSession(spark, None, isolate=False)
    for s in sqls.values():
        sess.execute(s)
    dfs = {n: sess.execute(s) for n, s in sqls.items()}
    for df in dfs.values():
        df.collect()

    out: dict[str, dict[str, float]] = {}
    for name, s in sqls.items():
        df = dfs[name]
        t0 = time.perf_counter(); sess.execute(s); execute_ms = (time.perf_counter() - t0) * 1000
        t0 = time.perf_counter(); rows = df.collect(); collect_ms = (time.perf_counter() - t0) * 1000
        t0 = time.perf_counter(); rows2 = list(df.toLocalIterator(prefetchPartitions=True)); tolocal_ms = (time.perf_counter() - t0) * 1000
        fields = df.schema.fields
        t0 = time.perf_counter()
        for row in rows:
            for v, f in zip(row, fields):
                _encode_value(v, f.dataType, f)
        encode_ms = (time.perf_counter() - t0) * 1000
        t0 = time.perf_counter(); cli.query(s); wire_ms = (time.perf_counter() - t0) * 1000
        out[name] = {
            "rows": len(rows),
            "parts": df.rdd.getNumPartitions() if False else -1,  # skipped: .rdd re-plans
            "execute_ms": round(execute_ms, 2),
            "collect_ms": round(collect_ms, 2),
            "tolocal_ms": round(tolocal_ms, 2),
            "encode_ms": round(encode_ms, 2),
            "wire_ms": round(wire_ms, 2),
        }
        assert len(rows) == len(rows2)

    tot = {k: round(sum(v[k] for v in out.values()), 1)
           for k in ("execute_ms", "collect_ms", "tolocal_ms", "encode_ms", "wire_ms")}
    print(json.dumps({"per_query": out, "totals": tot}, indent=2))
    if OUT_JSON:
        with open(OUT_JSON, "w") as fh:
            json.dump({"per_query": out, "totals": tot}, fh, indent=2)
    cli.close()
    srv.stop()


if __name__ == "__main__":
    main()
