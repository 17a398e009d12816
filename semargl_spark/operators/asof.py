"""As-of (most-recent-prior) join — the temporal join Spark's DataFrame
API lacks natively, built as a single-shuffle window composition.

``asof_join(left, right)`` attaches, to every left row, the payload of
the right row with the greatest ordering key ≤ the left row's key within
the same partition-by group (backward inclusive as-of, the pandas
``merge_asof`` / DuckDB ``ASOF JOIN`` default).

Implementation — the union trick, not a range join:

* tag both inputs and union them (right rows sort BEFORE left rows on
  equal keys, so an exact-tie right row is visible to the left row);
* ONE window per group ordered by (key, tag, tiebreak) carries the
  whole right payload forward as a single struct with
  ``last(payload, ignorenulls=True)`` — a struct, not per-column
  carries, so a null field inside a right row's payload can never fall
  back to a different (older) right row's value;
* keep only left rows.

Scale shape: ONE shuffle on the group key (the window sort), linear in
|L|+|R| — versus the naive ``l JOIN r ON r.ts <= l.ts`` + argmax, which
is a range join Spark executes as a per-group cross product (O(|L|·|R|)
within each group: quadratic on hot users at 100 TB). Skew is bounded
by per-group row counts, never by a join blow-up.

Reference parity: the reference has no temporal joins (parser
framework); this is target-side surface for the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_cols: tuple[str, ...] = ("value",),
    tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join.

    Adds ``{prefix}{on}`` (the matched right ordering key) and
    ``{prefix}{c}`` for each ``c`` in ``value_cols`` to every left row
    (all null when no right row at-or-before exists). When several
    right rows share one (by, on) key, the one sorting last by
    ``tiebreak`` wins — pass the right table's unique id for
    determinism.
    """
    payload = [on] + [c for c in value_cols if c != on]
    pay_struct = F.struct(*[F.col(c).alias(c) for c in payload])

    rt = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__asof_tag"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__asof_tie"),
        pay_struct.alias("__asof_pay"),
    )
    lt = left.withColumn("__asof_tag", F.lit(1)).withColumn(
        "__asof_tie", F.lit(None).cast(rt.schema["__asof_tie"].dataType)
    ).withColumn("__asof_pay", F.lit(None).cast(rt.schema["__asof_pay"].dataType))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))

    u = lt.unionByName(rt.select(*lt.columns))
    w = (
        Window.partitionBy(by)
        .orderBy(
            F.col(on).asc_nulls_first(),
            F.col("__asof_tag").asc(),
            F.col("__asof_tie").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("__asof_hit", F.last("__asof_pay", ignorenulls=True).over(w))
    out = u.filter(F.col("__asof_tag") == 1)
    for c in payload:
        out = out.withColumn(f"{prefix}{c}", F.col("__asof_hit")[c])
    return out.drop("__asof_tag", "__asof_tie", "__asof_pay", "__asof_hit")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    by: str | None = "user_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 86400,
    max_buckets: int = 1000,
) -> DataFrame:
    """Point-in-interval join (half-open ``start ≤ ts < end``) — the
    range join Spark executes as a per-group cross product when written
    naively (``ON p.ts >= i.start AND p.ts < i.end`` is a
    BroadcastNestedLoop/cartesian per key group: quadratic on hot
    groups).

    Scale shape — the bucketed band join: intervals explode to the
    time buckets they cover (bounded: span/bucket_seconds rows each,
    guarded by ``max_buckets``), points map to exactly ONE bucket, and
    the two sides meet in a plain equi-join on (by, bucket) followed by
    the exact containment filter. Each (point, interval) pair meets in
    exactly one bucket — the point's — so no distinct pass is needed.
    Pick ``bucket_seconds`` near the typical interval span: wider
    buckets mean fewer index rows but more false candidates for the
    filter; either way the join is linear in |points| + Σ span/bucket.

    Returns every points row matched with every containing intervals
    row (inner; points in no interval drop out). Reference parity: n/a
    — target-side surface for the events table (same family as
    :func:`asof_join`).
    """
    w = F.lit(bucket_seconds).cast("long")
    p_bucket = F.floor(F.unix_timestamp(F.col(on)) / w)
    i_start = F.floor(F.unix_timestamp(F.col(start_col)) / w)
    i_end = F.floor(F.unix_timestamp(F.col(end_col)) / w)
    n_buckets = i_end - i_start + 1
    guarded = F.when(
        n_buckets <= F.lit(max_buckets), F.sequence(i_start, i_end)
    ).otherwise(
        F.raise_error(
            F.format_string(
                "interval_join: interval spans more than %s buckets of %ss — "
                "raise bucket_seconds or max_buckets",
                F.lit(str(max_buckets)),
                F.lit(str(bucket_seconds)),
            )
        )
    )
    keys = ([by] if by else []) + ["__bucket"]
    pb = points.withColumn("__bucket", p_bucket)
    ib = intervals.withColumn("__bucket", F.explode(guarded))
    out = pb.join(ib, keys).filter(
        (F.col(on) >= F.col(start_col)) & (F.col(on) < F.col(end_col))
    )
    return out.drop("__bucket")


ALLEN_RELATIONS = (
    "precedes", "meets", "overlaps", "starts", "during", "finishes",
    "equals", "finished_by", "contains", "started_by", "overlapped_by",
    "met_by", "preceded_by",
)


def allen_relations(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Allen's interval algebra census → (relation, n): every left×right
    interval pair sharing the join key, classified into the 13
    exhaustive and mutually exclusive temporal relations (Allen 1983)
    — the temporal-join companion of the as-of/point-in-interval
    operators for auditing how two interval streams (sessions vs
    campaigns, tool spans vs assistant spans) actually interact.
    Intervals are half-open-agnostic: the classification uses only
    <, =, > on the integer endpoints, so it is exactly replayable.
    Allen's 13 relations are only exhaustive/exclusive over PROPER
    intervals — any pair where an endpoint is NULL or start >= end
    (point or inverted intervals) is routed to an explicit
    ``invalid`` bucket instead of silently falling through the CASE
    chain into ``overlapped_by`` (NULL comparisons) or ``meets``
    (two equal point intervals hit le == rs before equals).

    Shape: ONE hash equi-join on the shared key + a row-local CASE +
    a 13-key groupBy with map-side partials. Pair volume is per-key
    |L_k|·|R_k| — the same hot-key discipline as the interval join
    applies (cap or split pathological keys upstream); the output is
    13 rows regardless of scale.
    """
    ls, le = F.col("_ls"), F.col("_le")
    rs, re_ = F.col("_rs"), F.col("_re")
    a = left.select(
        F.col(on).alias("_k"),
        F.col(start_col).cast("long").alias("_ls"),
        F.col(end_col).cast("long").alias("_le"),
    )
    b = right.select(
        F.col(on).alias("_k"),
        F.col(start_col).cast("long").alias("_rs"),
        F.col(end_col).cast("long").alias("_re"),
    )
    improper = (
        ls.isNull() | le.isNull() | rs.isNull() | re_.isNull()
        | (ls >= le) | (rs >= re_)
    )
    rel = (
        F.when(improper, "invalid")
        .when(le < rs, "precedes")
        .when(re_ < ls, "preceded_by")
        .when(le == rs, "meets")
        .when(re_ == ls, "met_by")
        .when((ls == rs) & (le == re_), "equals")
        .when((ls == rs) & (le < re_), "starts")
        .when((ls == rs) & (le > re_), "started_by")
        .when((le == re_) & (ls > rs), "finishes")
        .when((le == re_) & (ls < rs), "finished_by")
        .when((ls > rs) & (le < re_), "during")
        .when((ls < rs) & (le > re_), "contains")
        .when((ls < rs) & (le < re_), "overlaps")
        .otherwise("overlapped_by")
    )
    return (
        a.join(b, "_k")
        .select(rel.alias("relation"))
        .groupBy("relation")
        .agg(F.count("*").cast("long").alias("n"))
    )
