"""Bucketed-table layout for co-located joins (SURVEY.md §4.2
"partition pruning / predicate pushdown" and the task's bucketing
guidance; Iceberg analogue: ``bucket(N, conv_id)`` partition transform).

A 10^12-turn corpus is re-joined on ``conv_id`` constantly (statements ⋈
transcripts, links ⋈ statements, lineage audits). Persisting both sides
bucketed **and sorted** by the join key makes every such join
shuffle-free: Spark's bucketing-aware scan exposes the hash
partitioning, so SortMergeJoin needs no Exchange on either side — the
single biggest repeated-shuffle saving available to this pipeline.

Buckets must agree on (count, key) across tables; 1024 buckets at
10^12 turns keeps each bucket ~10^9 rows / executor-memory sized at
the target scale (tests use small counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str = "conv_id",
    buckets: int = 32,
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` as an external parquet
    table (the sandbox stand-in for an Iceberg bucket-partitioned
    table)."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back with bucketing metadata intact (must go through the
    catalog — a plain ``spark.read.parquet`` of the same files loses the
    bucket spec and re-shuffles)."""
    return spark.table(table)
