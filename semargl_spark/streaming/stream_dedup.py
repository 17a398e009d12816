"""Streaming exact deduplication (training-data extension, SURVEY.md
§2.11 streaming surface + the dedup operator family in
operators/dedup.py).

Incremental-ingest dedup: as new document partitions land, each
micro-batch's normalized-body hashes pass through a stateful
``dropDuplicates`` on the two-hash key, so a body ever seen before —
in this batch or any earlier one — is suppressed. With
``trigger(availableNow=True)`` + checkpointing this is exactly-once:
replays re-offer the same batch and the state store suppresses
re-emission.

Determinism contract: WHICH document survives for a given body depends
on arrival order (first-wins), so the deterministic surface — what the
oracle gates — is the emitted distinct hash SET, which equals the
batch ``SELECT DISTINCT`` exactly. Batch dedup (operators/dedup.py)
remains the authority for min-id keeper selection; the streaming stage
answers "is this body new?" at ingest time.

Scale: state is two longs per distinct body, hash-partitioned across
executors by the state-store key; at 10^12-document scale bound it
with ``dropDuplicatesWithinWatermark`` over the landing timestamp
(dedup-within-horizon) or periodic state compaction against the batch
keeper table. Hashing stays in the JVM (same md5/xxhash expressions as
the batch path) — Python never touches the stream.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.dedup import _hash64, normalized_text


def read_document_stream(spark: SparkSession, input_path: str):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 4)
        .parquet(input_path)
    )


def stream_dedup(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    method: str = "xxhash64",
):
    """documents parquet dir (streamed) → distinct (h1, h2) body hashes,
    exactly-once. Returns the StreamingQuery (drain with
    ``awaitTermination`` under availableNow)."""
    stream = read_document_stream(spark, input_path)
    body = normalized_text("text")
    hashed = stream.select(
        _hash64(body, method=method).alias("h1"),
        _hash64(body, seed=0x5EED, method=method).alias("h2"),
    )
    deduped = hashed.dropDuplicates(["h1", "h2"])
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
