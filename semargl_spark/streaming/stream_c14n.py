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
:func:`c14n_compact` is that compaction: it folds landed batches into
one keeper row per content address under a batch_id watermark whose
append-only ledger makes the fold crash-safe AND shields reads from
stale pre-watermark batches re-landing after the fold (the
exactly-once guard across the compaction boundary —
tests/test_streaming_kg.py::test_stream_c14n_compaction_boundary_replay).

Input contract: a document's statements must be file-colocated (the
writer repartitions by (conv_id, turn_idx) before landing) — RDFC-1.0
needs the whole document, and micro-batch boundaries follow files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.c14n_ops import c14n_doc_hashes
from ..spark_util import is_missing_path

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


_LEDGER = "_compaction_ledger"  # underscore dir: hidden from the reader


def _compacted_through(spark: SparkSession, out_dir: str) -> int:
    """Highest committed compaction watermark, -1 when none. The ledger
    is APPEND-only (max wins) so a crash mid-write can never un-commit
    an earlier watermark.

    Only a missing ledger path reads as "no compaction yet": any other
    read failure propagates, because treating a transient FS error as
    -1 during c14n_compact would fold only post-watermark raw batches
    (older ones already reaped) and then commit a HIGHER watermark
    whose snapshot permanently omits the prior keeper rows."""
    try:
        row = (
            spark.read.parquet(f"{out_dir}/{_LEDGER}")
            .agg(F.max("compacted_through"))
            .collect()[0]
        )
        return -1 if row[0] is None else int(row[0])
    except Exception as exc:
        if not is_missing_path(exc):
            raise
        return -1


def _snapshot_id(watermark: int) -> int:
    """Partition id of the compacted snapshot for a watermark — negative
    and unique per watermark (-1 stays unused), so a snapshot written
    before its ledger row commits is invisible to readers."""
    return -(watermark + 2)


def c14n_active(spark: SparkSession, out_dir: str) -> DataFrame:
    """Rows visible under the compaction watermark W: the committed
    snapshot partition (batch_id = -(W+2)) plus raw batches past W.
    Replayed old batches that re-land AFTER compaction (batch_id ≤ W)
    are ignored — the batch_id watermark IS the exactly-once guard
    across the compaction boundary."""
    w = _compacted_through(spark, out_dir)
    df = spark.read.option("mergeSchema", "true").parquet(out_dir)
    if "n" not in df.columns:
        df = df.withColumn("n", F.lit(None).cast("long"))
    return df.filter(
        (F.col("batch_id") > w) | (F.col("batch_id") == _snapshot_id(w))
    )


def c14n_compact(
    spark: SparkSession, out_dir: str, through_batch_id: int | None = None
) -> dict:
    """Seen-set compaction: fold every visible row with batch_id ≤
    ``through_batch_id`` (default: all landed batches) plus the prior
    snapshot into ONE keeper row per content address — (conv_id =
    min-numbered carrier, n = carrier count); error rows are kept
    verbatim (diagnostics must survive compaction). The fold lands as
    snapshot partition -(W+2), then the ledger row commits W, then
    stale partitions are deleted — in that order, so a crash at any
    point leaves readers on a consistent snapshot (the new one only
    becomes visible with its ledger row; orphaned partitions are
    filtered out forever and reaped by the next compaction). Returns
    {"compacted_through", "rows_before", "rows_after"}."""
    w_old = _compacted_through(spark, out_dir)
    active = c14n_active(spark, out_dir).localCheckpoint(eager=True)
    raw_ids = [
        r["batch_id"]
        for r in active.select("batch_id").distinct().collect()
        if r["batch_id"] >= 0
    ]
    if through_batch_id is None:
        through_batch_id = max(raw_ids, default=w_old)
    if through_batch_id <= w_old:
        return {"compacted_through": w_old, "rows_before": 0, "rows_after": 0}
    fold_src = active.filter(F.col("batch_id") <= through_batch_id)
    rows_before = fold_src.count()
    did = F.substring("conv_id", 2, 18).cast("long")
    folded = (
        fold_src.filter(F.col("error").isNull())
        .select("doc_sha256", did.alias("did"),
                F.coalesce("n", F.lit(1)).alias("n"))
        .groupBy("doc_sha256")
        .agg(F.concat(F.lit("c"), F.min("did")).alias("conv_id"),
             F.sum("n").cast("long").alias("n"))
        .select(
            "conv_id",
            F.lit(None).cast("int").alias("turn_idx"),
            F.lit(None).cast("int").alias("n_quads"),
            "doc_sha256",
            F.lit(None).cast("string").alias("error"),
            "n",
        )
    )
    errs = fold_src.filter(F.col("error").isNotNull()).select(
        "conv_id", F.col("turn_idx").cast("int"),
        F.col("n_quads").cast("int"), "doc_sha256", "error",
        F.coalesce("n", F.lit(1)).cast("long").alias("n"),
    )
    snapshot = folded.unionByName(errs).withColumn(
        "batch_id", F.lit(_snapshot_id(through_batch_id))
    ).localCheckpoint(eager=True)
    rows_after = snapshot.count()
    (
        snapshot.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )
    # commit: the ledger row makes the new snapshot visible
    spark.createDataFrame(
        [(through_batch_id,)], "compacted_through long"
    ).write.mode("append").parquet(f"{out_dir}/{_LEDGER}")
    # reap stale partitions (safe at any point after the commit)
    from ..spark_util import delete_path

    stale = [b for b in raw_ids if b <= through_batch_id]
    if w_old >= 0:
        stale.append(_snapshot_id(w_old))
    for bid in stale:
        delete_path(spark, f"{out_dir}/batch_id={bid}")
    return {
        "compacted_through": through_batch_id,
        "rows_before": rows_before,
        "rows_after": rows_after,
    }


def c14n_first_seen(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read-time resolution → (doc_sha256, keep_conv, n_docs): the
    minimum-numbered conversation carrying each canonical content
    address plus its carrier count (replay inflation would break the
    count — the exactly-once check). Assumes conv ids of the form
    ``c<number>`` (the corpus convention); min is over the NUMBER, not
    the string, so 'c2' beats 'c10'. Reads through the compaction
    watermark (:func:`c14n_active`): compacted keeper rows carry their
    pre-fold carrier count in ``n``, so the aggregate is invariant
    under any compaction schedule."""
    h = c14n_active(spark, out_dir)
    did = F.substring("conv_id", 2, 18).cast("long")
    return (
        h.filter(F.col("error").isNull())
        .select("doc_sha256", did.alias("did"),
                F.coalesce("n", F.lit(1)).alias("n"))
        .groupBy("doc_sha256")
        .agg(
            F.concat(F.lit("c"), F.min("did")).alias("keep_conv"),
            F.sum("n").cast("long").alias("n_docs"),
        )
    )
