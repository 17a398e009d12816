"""Scaling-efficiency benchmark: same extraction workload at two
parallelism levels (local[N] vs local[4N] standing in for N- vs
4N-executor clusters, per the round driver's north rule).

Each level runs in its own subprocess (fresh JVM, no warm-cache
bleed-through). Records throughput at both levels and the scaling
efficiency into BENCH/scaling.json (BENCH/BASELINE.md is then updated
by hand from that record).

Usage: python tools/bench_scaling.py [sf_dir] [turns_per_doc] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = "/root/repo"

_WORKER = r"""
import sys, time, json
sys.path.insert(0, "/root/repo")
par = int(sys.argv[1]); sf_dir = sys.argv[2]; tpd = int(sys.argv[3])
from semargl_spark.spark_util import tuned_session
spark = tuned_session(parallelism=par, app_name=f"scale-{par}")
spark.sparkContext.setLogLevel("ERROR")
from semargl_spark.sources.transcripts import synth_transcripts
from semargl_spark.operators.extract import extract_statements, triples

# warm: JVM + parquet footer + the mapInPandas python workers (one
# small extraction so worker fork + Arrow init is out of the timing)
triples(extract_statements(synth_transcripts(spark, sf_dir, turns_per_doc=1))).count()

def read_steal():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    return sum(vals), vals[7]  # total jiffies, steal jiffies

t = synth_transcripts(spark, sf_dir, turns_per_doc=tpd)
n_turns = t.count()
# best of 5: the first trials pay python-worker pool growth and JVM
# JIT (C2 compilation of the codegen'd stages takes several runs at
# low parallelism); steady state is what a long-running cluster job
# sees. Hypervisor steal time is sampled around each run so noisy-
# neighbor contamination is visible in the record.
walls = []
steals = []
n_triples = 0
for _ in range(5):
    tot0, st0 = read_steal()
    t0 = time.perf_counter()
    n_triples = triples(extract_statements(t)).count()
    walls.append(time.perf_counter() - t0)
    tot1, st1 = read_steal()
    steals.append(round(100.0 * (st1 - st0) / max(tot1 - tot0, 1), 1))
wall = min(walls)
print(json.dumps({"parallelism": par, "turns": n_turns,
                  "triples": n_triples, "wall_sec": round(wall, 2),
                  "walls": [round(w, 2) for w in walls],
                  "steal_pct": steals,
                  "triples_per_sec": round(n_triples / wall, 1),
                  "turns_per_sec": round(n_turns / wall, 1)}))
spark.stop()
"""


def run_level(par: int, sf_dir: str, tpd: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, str(par), sf_dir, str(tpd)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from local[{par}]: {out.stderr[-2000:]}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tpd = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    low = run_level(n, sf_dir, tpd)
    print("low :", low)
    high = run_level(4 * n, sf_dir, tpd)
    print("high:", high)

    efficiency = (high["triples_per_sec"] / low["triples_per_sec"]) / 4.0
    result = {
        "sf_dir": sf_dir,
        "turns_per_doc": tpd,
        "N": n,
        "low": low,
        "high": high,
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    print(json.dumps(result))
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/scaling.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
