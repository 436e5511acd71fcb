"""Decompose the streaming-entry fixed cost (VERDICT r9 #6, guide §1.1).

Each streaming_* gate entry costs ~4-4.7 s at sf0.01. Before touching
anything, attribute the time: bounded-source setup (schema read), micro-batch
planning, state-store machinery (per shuffle-partition store setup/commit),
sink, and the actual work — by timing one representative entry under
controlled variations:

  - repeat runs in one session (JIT/codegen warm vs cold),
  - SPARK_GRAFT_STREAM_SHUFFLE = 1 / 8 / 32 (state-store count),
  - the batch equivalent of the same aggregation (the work floor),
  - a trivial streaming query with no stateful operator (machinery floor).

Usage: python tools/probe_streaming.py [sf_dir] [reps]
Writes tools/probe_streaming_r10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from bemidb_spark.session import build_session  # noqa: E402


def main() -> None:
    spark = build_session(app_name="probe-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    from bemidb_spark.streaming import windows as W

    out: dict = {"sf_dir": SF_DIR, "reps": REPS, "phases": {}}

    # machinery floor: no aggregation at all, availableNow into memory sink
    def trivial() -> None:
        ev = W._events_stream(spark, SF_DIR)
        q = (ev.selectExpr("user_id").writeStream.format("memory")
             .queryName(f"probe_trivial_{time.monotonic_ns()}")
             .outputMode("append").trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    # the entry under test
    def entry() -> None:
        W.QUERIES["streaming_tumbling_daily"](spark, SF_DIR).collect()

    # batch work floor: identical aggregation as plain SQL
    def batch() -> None:
        from bemidb_spark.tables import register_views

        register_views(spark, SF_DIR)
        spark.sql(W.ORACLES["streaming_tumbling_daily"]
                  .replace("date_trunc", "date_trunc")).collect()

    def timed(label: str, fn, n: int = REPS) -> list[float]:
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            samples.append(round(time.perf_counter() - t0, 3))
        out["phases"][label] = samples
        print(label, samples, flush=True)
        return samples

    timed("entry_cold_then_warm", entry, max(REPS, 3))
    timed("trivial_stream", trivial)
    timed("batch_equivalent", batch)
    for shuf in ("1", "2", "4", "8", "32"):
        os.environ["SPARK_GRAFT_STREAM_SHUFFLE"] = shuf
        timed(f"entry_shuffle_{shuf}", entry)
    os.environ.pop("SPARK_GRAFT_STREAM_SHUFFLE", None)

    path = os.path.join(os.path.dirname(__file__), "probe_streaming_r10.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
