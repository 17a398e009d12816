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
rows/day the same shape holds: per-batch work is one distinct + one
TakeOrdered over the batch, state I/O is k rows.

Production alternative: Spark's HLL-based approx_count_distinct over
``outputMode(update)`` — mergeable too, but engine-private registers
(not externally gateable); this KMV path is the verifiable methodology.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import SPACE, _hash52


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
        batch_sk = batch_df.select("h").distinct().orderBy("h").limit(k)
        sess = batch_df.sparkSession
        try:
            old = sess.read.parquet(state_path)
        except Exception:
            old = sess.createDataFrame([], "h long")
        merged = (
            old.union(batch_sk).distinct().orderBy("h").limit(k).collect()
        )
        sess.createDataFrame(
            [(r["h"],) for r in merged], "h long"
        ).coalesce(1).write.mode("overwrite").parquet(state_path)

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
