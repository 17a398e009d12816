"""Streaming RDF content addressing: per-micro-batch RDFC-1.0 document
hashes with exactly-once replay semantics.

As statement partitions land, each micro-batch's documents are
canonicalized (operators/c14n_ops.c14n_doc_hashes — the
isomorphism-invariant sha256 content address) and the per-doc hash rows
are written to a ``batch_id=N`` partition via dynamic partition
overwrite: a replayed batch overwrites ITS OWN partition instead of
appending duplicates (the same idempotent-merge shape as
stream_kg.stream_to_kg). First-seen/duplicate resolution is a read-time
aggregate over the staging table (:func:`c14n_first_seen`) — min-key
keeper per content address, deterministic regardless of how the stream
was batched — rather than per-batch global state: at 10^12 docs the
seen-set belongs in a compacted keeper table, not the state store.

Input contract: a document's statements must be file-colocated (the
writer repartitions by (conv_id, turn_idx) before landing) — RDFC-1.0
needs the whole document, and micro-batch boundaries follow files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.c14n_ops import c14n_doc_hashes

_STMT_DDL = (
    "conv_id string, turn_idx int, subj string, pred string, obj string,"
    " obj_kind string, lang string, dtype string, graph string"
)


def stream_c14n(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_path: str,
):
    """statements parquet dir (streamed) → per-doc canonical hashes in
    batch_id partitions, exactly-once. Drain with awaitTermination."""
    stream = (
        spark.readStream.schema(_STMT_DDL)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_path)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            c14n_doc_hashes(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def c14n_first_seen(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read-time resolution → (doc_sha256, keep_conv, n_docs): the
    minimum-numbered conversation carrying each canonical content
    address plus its carrier count (replay inflation would break the
    count — the exactly-once check). Assumes conv ids of the form
    ``c<number>`` (the corpus convention); min is over the NUMBER, not
    the string, so 'c2' beats 'c10'."""
    h = spark.read.parquet(out_dir)
    did = F.substring("conv_id", 2, 18).cast("long")
    return (
        h.filter(F.col("error").isNull())
        .select("doc_sha256", did.alias("did"))
        .groupBy("doc_sha256")
        .agg(
            F.concat(F.lit("c"), F.min("did")).alias("keep_conv"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )
