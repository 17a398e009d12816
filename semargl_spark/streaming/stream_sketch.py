"""Streaming KMV cardinality sketch (SURVEY.md §2.11 streaming surface
+ operators/sketch.py).

Maintains a bottom-k distinct-hash sketch of a value stream across
micro-batches with ``foreachBatch``: each batch contributes its own
bottom-k, and the persisted state becomes the bottom-k of the union.
Because bottom-k merging is idempotent, commutative, and associative
(bottom-k of any re-offered union is unchanged), the final sketch is
EXACTLY the batch sketch over the same rows — independent of batch
boundaries, arrival order, or at-least-once replays. That equality is
what the ``stream_cardinality`` gate checks against the DuckDB oracle.

State is ≤ k rows BY CONSTRUCTION — the merge collects at most k longs
to the driver per micro-batch (the sketch's entire point is that this
never grows), then atomically overwrites the state parquet. At 10^12
rows/day the same shape holds: per-batch work is a two-level bottom-k
(parallel per-partition unique-bottom-k, then one reduce task over
≤ P·k survivors — no shuffle of the full distinct-hash set, unlike a
naive ``distinct()``), state I/O is k rows.

Production alternative: Spark's HLL-based approx_count_distinct over
``outputMode(update)`` — mergeable too, but engine-private registers
(not externally gateable); this KMV path is the verifiable methodology.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import SPACE, _hash52


def _bottomk_local(k: int):
    """mapInArrow kernel: unique-bottom-k of the h column within one
    partition, O(k + arrow-batch) memory, ≤ k rows out per partition."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        best = None
        for batch in batches:
            h = batch.column("h").to_numpy(zero_copy_only=False)
            if h.size == 0:
                continue
            u = np.unique(h)[:k]
            best = (
                u
                if best is None
                else np.unique(np.concatenate([best, u]))[:k]
            )
        if best is not None and best.size:
            yield pa.record_batch(
                [pa.array(best, type=pa.int64())], names=["h"]
            )

    return fn


def bottomk_distinct(df, k: int):
    """Exact bottom-k DISTINCT hashes of ``df.h`` without shuffling
    the full hash set: every global bottom-k member is by definition
    among the bottom-k distinct of its own partition, so a parallel
    per-partition unique-bottom-k followed by one reduce task over the
    ≤ P·k survivors is exact. The repartition(1) moves ≤ P·k longs —
    at P = 10^5 partitions and k = 64 that is 6.4 M longs, one cheap
    task — versus a ``distinct()`` that shuffles every distinct hash."""
    local = df.select("h").mapInArrow(_bottomk_local(k), "h long")
    return local.repartition(1).mapInArrow(_bottomk_local(k), "h long")


def _read_state(state_path: str) -> list[int]:
    """Driver-side read of the ≤ k-row sketch state (see merge())."""
    import os

    import pyarrow.parquet as pq

    f = os.path.join(state_path, "state.parquet")
    if not os.path.exists(f):
        return []
    return pq.read_table(f).column("h").to_pylist()


def _write_state(state_path: str, hashes: list[int]) -> None:
    """Atomic driver-side overwrite of the sketch state: write a temp
    file, then rename — a reader never sees a partial state."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(state_path, exist_ok=True)
    tmp = os.path.join(state_path, ".state.tmp.parquet")
    pq.write_table(
        pa.table({"h": pa.array(hashes, type=pa.int64())}), tmp
    )
    os.replace(tmp, os.path.join(state_path, "state.parquet"))


def read_document_stream(spark: SparkSession, input_path: str):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(input_path)
    )


def stream_cardinality(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    checkpoint_path: str,
    k: int = 64,
):
    """documents parquet dir (streamed) → persisted bottom-k sketch of
    the distinct WORDS seen so far at ``state_path``. Returns the
    StreamingQuery (drain with ``awaitTermination`` under
    availableNow). Read the estimate off with :func:`sketch_estimate`.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    stream = read_document_stream(spark, input_path)
    words = stream.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("v")
    ).filter(F.col("v") != "")
    hashes = words.select(_hash52(F.col("v")).alias("h"))

    def merge(batch_df, _batch_id):
        batch_sk = [r["h"] for r in bottomk_distinct(batch_df, k).collect()]
        # both sides are ≤ k longs — the sorted-set union in Python is
        # the mergeable-sketch ⊕, and the state round-trips through
        # driver-side Arrow parquet with an atomic rename (the same
        # pattern as Spark's own offset/commit logs; on a cluster the
        # rename goes through the checkpoint FileSystem API instead).
        # A Spark job for k rows would cost more in scheduling than
        # the whole merge.
        merged = sorted(set(_read_state(state_path)) | set(batch_sk))[:k]
        _write_state(state_path, merged)

    return (
        hashes.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def sketch_estimate(spark: SparkSession, state_path: str, k: int = 64):
    """Persisted sketch → one row (n_hashes, kth_min, est_distinct),
    the same estimator as operators/sketch.kmv_distinct."""
    sk = spark.read.parquet(state_path)
    num = (k - 1) * SPACE
    return sk.agg(
        F.count("*").cast("int").alias("n_hashes"),
        F.max("h").alias("kth_min"),
    ).select(
        "n_hashes",
        "kth_min",
        F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("long"))
        .otherwise(
            F.expr(f"CAST({num} AS BIGINT) div greatest(kth_min, 1L)")
        )
        .alias("est_distinct"),
    )


def stream_heavy_hitters(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    checkpoint_path: str,
    d: int = 4,
    w: int = 1024,
):
    """documents parquet dir (streamed) → persisted Count-Min counter
    grids of the word stream, one grid per micro-batch under
    ``state_path`` (partition dir ``batch_id=N``). Returns the
    StreamingQuery; read estimates off with :func:`hh_estimate`.

    Exactly-once without idempotent-merge math: unlike bottom-k,
    counter ADDITION is not replay-idempotent, so each batch writes its
    OWN deterministic grid partition (overwrite) instead of read-
    modify-writing a shared total — an at-least-once replay of batch N
    rewrites ``batch_id=N`` with identical bytes. The summed state
    equals the batch grid over the same rows because addition commutes
    across batch boundaries. State is n_batches·d·w counter rows —
    compact forever at daily-batch cadence; fold old partitions into
    one by re-writing their sum under a reserved id when n_batches
    itself needs bounding.
    """
    from ..operators.sketch import cm_grid

    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1, w >= 2; got {d},{w}")
    stream = read_document_stream(spark, input_path)

    def apply_batch(batch_df, batch_id):
        vals = batch_df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("v")
        ).filter(F.col("v") != "")
        cm_grid(vals, d, w).write.mode("overwrite").parquet(
            f"{state_path}/batch_id={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def hh_counters(spark: SparkSession, state_path: str):
    """Summed CM grid across all persisted batch partitions →
    (r, bucket, cnt) — the same shape cm_probe point-queries."""
    return (
        spark.read.option("basePath", state_path)
        .parquet(f"{state_path}/batch_id=*")
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
