"""Steal-gated sf0.1 bench: wait for a QUIET host window, then measure.

The sf0.1 budget line (BASELINE.md <= 4.6 s re-executed) is only meaningful
in a near-zero-steal window — the r6 evidence artifact ran at <= 0.03 %
steal; r7/r8 never saw such a window and their attempts are recorded as
telemetry. This harness samples /proc/stat steal every PROBE_EVERY seconds;
when a window reads below GATE_PCT it runs `python bench.py` at sf0.1 and
appends the attempt (gated or run, with its telemetry line) to the output
JSON. Stops after a run whose reexec median meets the budget, or after
MAX_ATTEMPTS bench runs / DEADLINE_S wall.

Usage: python tools/quiet_bench.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

GATE_PCT = float(os.environ.get("QUIET_GATE_PCT", "0.5"))
PROBE_EVERY = float(os.environ.get("QUIET_PROBE_EVERY", "120"))
PROBE_LEN = float(os.environ.get("QUIET_PROBE_LEN", "20"))
MAX_ATTEMPTS = int(os.environ.get("QUIET_MAX_ATTEMPTS", "4"))
DEADLINE_S = float(os.environ.get("QUIET_DEADLINE_S", "7200"))
BUDGET_S = 4.6
OUT = sys.argv[1] if len(sys.argv) > 1 else "tools/bench_sf01_r9_quiet.json"


def steal_pct(dt: float) -> float:
    def read():
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:]))
        return vals, sum(vals)

    a, ta = read()
    time.sleep(dt)
    b, tb = read()
    d = [y - x for x, y in zip(a, b)]
    return 100.0 * d[7] / max(1, tb - ta)


def main() -> None:
    t0 = time.time()
    log: dict = {"gate_pct": GATE_PCT, "attempts": [], "met_budget": False}
    runs = 0
    while time.time() - t0 < DEADLINE_S and runs < MAX_ATTEMPTS:
        s = steal_pct(PROBE_LEN)
        if s > GATE_PCT:
            log["attempts"].append(
                {"t": round(time.time() - t0), "probe_steal_pct": round(s, 3),
                 "action": "gated"})
            json.dump(log, open(OUT, "w"), indent=1)
            time.sleep(PROBE_EVERY)
            continue
        runs += 1
        env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
        p = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                           text=True, env=env, timeout=1800,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        tele = None
        for line in p.stdout.splitlines():
            if line.startswith("# bench-telemetry:"):
                tele = json.loads(line.split(":", 1)[1])
        att = {"t": round(time.time() - t0), "probe_steal_pct": round(s, 3),
               "action": "ran", "telemetry": tele}
        log["attempts"].append(att)
        if tele:
            med = tele.get("reexec_sequential_sec")
            steals = tele.get("reexec_steal_pct") or []
            att["reexec_sequential_sec"] = med
            att["max_steal_pct"] = max(steals) if steals else None
            if med is not None and med <= BUDGET_S:
                log["met_budget"] = True
                json.dump(log, open(OUT, "w"), indent=1)
                print(f"BUDGET MET: {med} s (steal <= {att['max_steal_pct']})")
                return
        json.dump(log, open(OUT, "w"), indent=1)
        time.sleep(PROBE_EVERY)
    json.dump(log, open(OUT, "w"), indent=1)
    print("no qualifying window:", len(log["attempts"]), "probes,",
          runs, "runs")


if __name__ == "__main__":
    main()
