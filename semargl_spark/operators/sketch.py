"""KMV (k-minimum-values) distinct-cardinality sketch.

Order-statistics estimator (Bar-Yossef et al., RANDOM'02; the
"bottom-k" form): hash every value into [0, 2^B); if the k-th smallest
distinct hash in a group is ``kth``, the group's distinct count is
estimated by ``(k-1) * 2^B / kth`` with relative error ~1/sqrt(k).
Everything here is deterministic integer arithmetic — the hash is the
oracle-replicable 52-bit md5 prefix and the estimate a single BIGINT
integer division — so the sketch is bit-identical in any engine and at
any parallelism, unlike HLL (whose register layout is engine-private:
Spark's approx_count_distinct and DuckDB's approx HLLs cannot
cross-check each other).

Scale notes (10^12 rows): the duplicate-heavy volume is absorbed by the
map-side partial of the ``distinct`` hash aggregate — only DISTINCT
(group, hash) pairs shuffle. The per-group bottom-k then runs as a
window over those distinct hashes; with a known lower bound on group
cardinality, ``prefilter_min_distinct`` cuts the window input to the
expected bottom tail first (a static hash threshold, pushed to the
scan). For a pure streaming/mergeable production path at extreme
cardinalities, Spark's built-in HLL ``approx_count_distinct`` remains
the right tool — this operator is the *verifiable* methodology
(estimator math, error bounds) with an external gate.

Reference parity: the reference is a parser framework with no
sketching; target-side profiling surface for the constructed KG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 52-bit hash space: (k-1) * 2^52 stays far inside BIGINT for any sane
# k, so the estimator division is exact integer math in every engine
B = 52
SPACE = 1 << B


def _hash52(col) -> F.Column:
    """52-bit md5-prefix hash (13 hex digits) — ANSI-SQL replicable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 13), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    prefilter_min_distinct: int | None = None,
) -> DataFrame:
    """Per-group KMV distinct-count estimate → (group...,
    n_hashes, kth_min, est_distinct).

    ``n_hashes`` is the bottom-k size actually observed; when a group
    has fewer than ``k`` distinct hashes the sketch IS the exact
    distinct set and ``est_distinct`` equals it (kth_min is reported
    as the max observed hash). Ties are impossible post-distinct, so
    the bottom-k is a deterministic set.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = _hash52(value_col)
    dh = df.select(*group_cols, h.alias("h")).distinct()
    if prefilter_min_distinct is not None:
        if prefilter_min_distinct < 1:
            raise ValueError("prefilter_min_distinct must be >= 1")
        # keep ~4k× the expected bottom-k band: P(losing a bottom-k
        # hash) is negligible while the window input shrinks by
        # distinct/4k
        thresh = SPACE // prefilter_min_distinct * (4 * k)
        dh = dh.filter(F.col("h") <= F.lit(thresh))
    w = Window.partitionBy(*group_cols).orderBy("h")
    botk = dh.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    num = (k - 1) * SPACE
    return botk.groupBy(*group_cols).agg(
        F.count("*").cast("int").alias("n_hashes"),
        F.max("h").alias("kth_min"),
    ).select(
        *group_cols,
        "n_hashes",
        "kth_min",
        F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("long"))
        .otherwise(
            F.expr(f"CAST({num} AS BIGINT) div greatest(kth_min, 1L)")
        )
        .alias("est_distinct"),
    )
