"""Job-level scaling evidence: the FULL spark-submit pipeline
(extract → link → canon → merge, jobs/run_pipeline.py) at two
parallelism levels — local[N] vs local[4N] standing in for N- vs
4N-executor clusters, per the north rule's "run via spark-submit
--py-files ... at two cluster sizes" wording.

Complements tools/bench_scaling.py (which isolates the throughput
metric the rule grades — triples extracted/sec — on the shuffle-free
extraction stage): this harness times the whole job INCLUDING its
shuffled stages (linking join, connected-components rounds, the
partitioned merge write), through the same spark-submit surface a
cluster would use. Shuffle-stage fixed costs (per-round job scheduling
in CC, shuffle file setup) do not shrink with parallelism at this
corpus size, so end-to-end efficiency is a LOWER bound that rises with
input volume — at 10^12 turns the fixed costs vanish into hours-long
stages. Methodology mirrors bench_scaling.py: storage-resident input
materialized once, interleaved levels (low, high, low, high),
best-of-K per level, steal sampled around every trial.

Usage: python tools/bench_job_scaling.py [sf_dir] [turns_per_doc] [N] [K]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = "/root/repo"


def _steal():
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:9]]
    return sum(vals), vals[7]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tpd = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    sys.path.insert(0, REPO)
    base = tempfile.mkdtemp(prefix="jobscale_")
    zip_path = os.path.join(base, "semargl_spark.zip")
    dic = os.path.join(base, "dict")

    from semargl_spark.spark_util import build_pyfiles_zip, tuned_session

    build_pyfiles_zip(zip_path)
    spark = tuned_session(parallelism=16, app_name="jobscale-gen")
    spark.sparkContext.setLogLevel("ERROR")
    from semargl_spark.sources.transcripts import (
        entity_dictionary, synth_transcripts,
    )

    # two input sizes per level: the y-intercept of wall(input) is the
    # job's parallelism-independent fixed cost (CC round scheduling,
    # lineage/metadata writes, driver steps) which a 10^12-turn run
    # amortizes to nothing; the SLOPE is the data-proportional cost,
    # whose N→4N ratio is the scaling a cluster actually sees
    sizes = {}
    for mult in (1, 4):
        inp = os.path.join(base, f"in_{mult}")
        t = synth_transcripts(spark, sf_dir, turns_per_doc=tpd * mult)
        sizes[mult] = {"path": inp, "turns": t.count()}
        t.repartition(8 * n).write.mode("overwrite").parquet(inp)
    entity_dictionary(spark, sf_dir).write.mode("overwrite").parquet(dic)
    spark.stop()

    def run_level(par: int, tag: str, inp: str) -> tuple[float, float]:
        out = os.path.join(base, f"out_{tag}")
        tot0, st0 = _steal()
        r = subprocess.run(
            ["spark-submit", "--master", f"local[{par}]",
             # local mode: one JVM — spark-submit's default 1g driver
             # heap OOMs on multi-million-turn persists
             "--driver-memory", "24g",
             "--conf", f"spark.sql.shuffle.partitions={4 * par}",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zip_path,
             os.path.join(REPO, "jobs", "run_pipeline.py"),
             "--input", inp, "--output", out,
             "--dictionary", dic, "--run-id", f"sc-{tag}"],
            capture_output=True, text=True, timeout=1800, cwd=base,
        )
        tot1, st1 = _steal()
        if r.returncode != 0:
            raise RuntimeError(f"job failed at local[{par}]: {r.stderr[-1500:]}")
        # in-job wall from the summary line (excludes JVM/session boot
        # — the long-running-application view; a cluster amortizes the
        # ~15 s driver boot over hours of work, so charging it against
        # a seconds-long benchmark run measures the harness, not the job)
        summary = None
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                summary = json.loads(line)
                break
        if summary is None or "wall_sec" not in summary:
            raise RuntimeError(f"no summary from local[{par}]")
        return summary["wall_sec"], round(
            100.0 * (st1 - st0) / max(tot1 - tot0, 1), 1
        )

    walls: dict[tuple[int, int], list[float]] = {}
    steals: dict[tuple[int, int], list[float]] = {}
    for rnd in range(k):  # interleaved across levels AND sizes
        for mult in (1, 4):
            for par in (n, 4 * n):
                w, st = run_level(
                    par, f"{par}x{mult}x{rnd}", sizes[mult]["path"]
                )
                walls.setdefault((par, mult), []).append(w)
                steals.setdefault((par, mult), []).append(st)

    best = {key: min(v) for key, v in walls.items()}
    d_turns = sizes[4]["turns"] - sizes[1]["turns"]
    # marginal (data-proportional) seconds per extra turn at each level
    marg = {
        par: (best[(par, 4)] - best[(par, 1)]) / d_turns
        for par in (n, 4 * n)
    }
    eff_total = round(
        (sizes[4]["turns"] / best[(4 * n, 4)])
        / (sizes[4]["turns"] / best[(n, 4)]) / 4, 3,
    )
    eff_marginal = round(marg[n] / (4 * marg[4 * n]), 3)
    result = {
        "harness": "spark-submit jobs/run_pipeline.py (full pipeline)",
        "sf_dir": sf_dir, "N": n,
        "sizes": {m: sizes[m]["turns"] for m in (1, 4)},
        "walls_best": {f"local[{par}] x{m}": round(best[(par, m)], 2)
                       for par in (n, 4 * n) for m in (1, 4)},
        "walls_all": {f"local[{par}] x{m}": [round(w, 2) for w in v]
                      for (par, m), v in walls.items()},
        "steal_pct": {f"local[{par}] x{m}": v
                      for (par, m), v in steals.items()},
        "fixed_cost_sec": {
            f"local[{par}]": round(
                best[(par, 1)] - marg[par] * sizes[1]["turns"], 2)
            for par in (n, 4 * n)
        },
        "marginal_turns_per_sec": {
            f"local[{par}]": round(1.0 / marg[par], 1) for par in (n, 4 * n)
        },
        "scaling_efficiency_total": eff_total,
        "scaling_efficiency_marginal": eff_marginal,
        "note": "total efficiency is fixed-cost-bound at benchmark size "
                "(CC round scheduling, lineage/metadata writes and "
                "driver steps cost the same seconds at any core count); "
                "the marginal efficiency differences those fixed costs "
                "out and is what a 10^12-turn run sees",
    }
    print(json.dumps(result))
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
