"""Canonical Spark schemas (FIXTURES.md §1-§2, SURVEY.md §1.5)."""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# input: Iceberg-style transcript table (BASELINE.json input_hint)
TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# extraction output: reference TripleSink/QuadSink callbacks encoded in
# obj_kind/lang/dtype (TripleSink.java:29-47, QuadSink.java:31-51); rows
# with obj_kind='error' are the processor-graph side channel
# (ProcessorGraphHandler.java:28-42).
STATEMENTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("subj", StringType(), True),
        StructField("pred", StringType(), True),
        StructField("obj", StringType(), True),
        StructField("obj_kind", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("dtype", StringType(), True),
        StructField("graph", StringType(), True),
    ]
)

# per-partition lineage/metrics side output (north_rule)
LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("input_rows", LongType(), False),
        StructField("output_rows", LongType(), False),
        StructField("error_rows", LongType(), False),
        StructField("checksum", StringType(), True),
        StructField("wall_ms", LongType(), False),
    ]
)
