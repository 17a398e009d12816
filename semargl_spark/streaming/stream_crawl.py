"""Streaming crawl-frontier ingest: WET landing files → deduplicated
canonical-URL frontier, exactly-once.

The batch crawl front-end (sources/wet_records.py +
curation.url_canonicalize) is stateless per record, so it lifts
directly under Structured Streaming; the only stateful stage is the
cross-micro-batch ``dropDuplicates`` on the canonical URL — the
frontier's exactly-once guarantee: a page that arrived in an earlier
landing file never re-enters the frontier when its tracker-spelled
twin arrives later. ``trigger(availableNow=True)`` drains landings
idempotently via the checkpoint.

State discipline at horizon scale: dedup state is one row per distinct
canonical URL; bound it with ``withWatermark`` +
``dropDuplicatesWithinWatermark`` on a landing-time column when the
frontier outlives executor state (same caveat as
streaming/stream_dedup.py, documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import url_canonicalize
from ..sources.wet_records import split_wet_records


def stream_crawl_frontier(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
):
    """WET landing dir (streamed parquet of (file_id, content)) →
    frontier parquet (url_canon, host, text), exactly-once, first
    arrival per canonical URL wins. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema("file_id long, content string")
        .option("maxFilesPerTrigger", 2)
        .parquet(input_path)
    )
    recs = split_wet_records(stream).filter(
        F.col("target_uri").isNotNull()
    )
    canon = url_canonicalize(
        recs.select("file_id", F.col("target_uri").alias("url"), "text"),
        id_col="file_id",
        keep=("text",),
    ).filter(F.col("is_valid"))
    frontier = canon.select("url_canon", "host", "text").dropDuplicates(
        ["url_canon"]
    )
    return (
        frontier.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
