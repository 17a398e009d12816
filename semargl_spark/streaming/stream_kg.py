"""Streaming ingest → KG materialize (north_rule: incremental pipeline
over the landing transcript table, resumable, exactly-once).

``foreachBatch`` + an idempotent per-batch write gives exactly-once
merge semantics on a replay-prone substrate: each micro-batch's edges
land in a ``batch_id=N`` partition via dynamic partition overwrite, so
a batch replayed after a failure overwrites ITS OWN partition instead
of appending duplicates (the parquet analogue of Iceberg's
snapshot-per-commit; Structured Streaming guarantees the same batch_id
is re-offered on replay). The queryable edge set is the staging table
minus the batch column, distinct.

Per-batch lineage rows (run_id = "<run>-b<batch_id>") extend the batch
ledger (operators/materialize.write_lineage) to streaming: the same
(run_id, stage) dynamic overwrite keeps replays duplicate-free, and an
auditor can replay counts batch by batch.

Scale: each micro-batch is a narrow extract + one distinct shuffle over
just that batch's edges; the cumulative distinct is deferred to read
time (or a periodic compaction job) instead of re-shuffling the whole
graph per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_statements
from ..operators.materialize import kg_edges, lineage_rows, write_lineage
from .stream_extract import read_transcript_stream


def stream_to_kg(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_path: str,
    run_id: str = "stream",
):
    """Stream transcript files → per-batch edge merge + lineage.

    Returns the StreamingQuery (``trigger(availableNow=True)`` — drain
    with ``awaitTermination``; re-running after a drain is a no-op via
    the stream checkpoint, and a replayed batch is idempotent via the
    batch_id partition overwrite)."""
    stream = read_transcript_stream(spark, input_path)
    statements = extract_statements(stream)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        st = batch_df.filter(F.col("obj_kind") != "error")
        edges = kg_edges(st)
        (
            edges.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_dir}/edges_staging")
        )
        write_lineage(
            lineage_rows(edges, f"{run_id}-b{batch_id}", "stream_merge"),
            f"{out_dir}/lineage",
        )

    return (
        statements.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def kg_edges_view(spark: SparkSession, out_dir: str) -> DataFrame:
    """The queryable edge set: staging minus the batch column, distinct
    (an edge extracted in two different batches is one edge)."""
    return (
        spark.read.parquet(f"{out_dir}/edges_staging")
        .select("src", "pred", "dst")
        .distinct()
    )
