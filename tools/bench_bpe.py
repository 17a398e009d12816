#!/usr/bin/env python3
"""Measure the batched-BPE job-count win (VERDICT r3 item 3): the
per-round loop trainer schedules O(n_merges) Spark jobs; the batched
trainer schedules one distributed collapse regardless of budget.

Runs text.bpe_train (loop) at a moderate budget and
text.bpe_train_batched at a production-ish (>=2k) budget, counting
scheduled jobs per trainer via job groups, and writes
BENCH/bpe_batched.json.

The corpus is synthesized deterministically (md5-derived hex words,
~30k distinct, 1.6M tokens): the sf documents table's vocabulary
exhausts after ~90 merges, far short of a production merge budget —
and this bench measures SCHEDULING cost as a function of the budget,
which needs runway, not corpus realism (the correctness story is the
shared oracle gate + hypothesis differential, not this artifact).

Usage: python tools/bench_bpe.py [loop_merges] [batched_merges]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    loop_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batched_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.retainedJobs", "200000")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from semargl_spark.operators.text import bpe_train, bpe_train_batched
    from semargl_spark.spark_util import ensure_py_files

    ensure_py_files(spark)
    from pyspark.sql import functions as F

    # deterministic synthetic corpus: 200k docs x 8 hex words drawn from
    # a ~30k-word closed vocabulary of varying lengths (3-9 chars)
    docs = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.substring(
                    F.md5(F.pmod(F.col("id") * 8 + i, F.lit(30_000)).cast("string")),
                    1,
                    3 + (i * 31 + 7) % 7,
                )
                for i in range(8)
            ],
        ).alias("text"),
    ).localCheckpoint(eager=True)
    tracker = spark.sparkContext.statusTracker()

    def run(label, fn):
        spark.sparkContext.setJobGroup(label, label)
        t0 = time.monotonic()
        rows = fn().collect()
        wall = time.monotonic() - t0
        spark.sparkContext.setJobGroup(None, None)
        jobs = len(tracker.getJobIdsForGroup(label))
        return {"merges_done": len(rows), "jobs": jobs,
                "wall_sec": round(wall, 2),
                "jobs_per_merge": round(jobs / max(1, len(rows)), 3)}

    loop = run("bpe-loop",
               lambda: bpe_train(docs, n_merges=loop_merges))
    loop["n_merges_requested"] = loop_merges
    batched = run("bpe-batched",
                  lambda: bpe_train_batched(docs, n_merges=batched_merges))
    batched["n_merges_requested"] = batched_merges

    out = {
        "corpus": "synthetic md5-hex, 200k docs x 8 words, ~30k vocab",
        "loop": loop,
        "batched": batched,
        "note": (
            "loop schedules ~2 jobs per merge round (argmax + eager "
            "localCheckpoint); batched schedules one word-frequency "
            "collapse regardless of budget — at a 32k-100k production "
            "vocab the loop is O(vocab) driver-scheduled jobs, the "
            "batched path stays O(1). Merge tables are bit-identical "
            "(shared oracle gate bpe_train_batched + hypothesis "
            "differential)."
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/bpe_batched.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
