"""Watermarked event-time windowed aggregation (SURVEY.md §2.11 /
task-spec streaming: watermarks + windowed aggs for late data).

Append-mode emission: a window row is released only once the watermark
(max event time − delay) passes its end, so late events inside the
delay are still folded in and events later than the delay are dropped
deterministically. State for closed windows is evicted — the property
that makes hour-windowed aggregation over an unbounded 10^12-event
stream run in bounded memory.

Under ``trigger(availableNow=True)`` the final no-data micro-batch
(``spark.sql.streaming.noDataMicroBatches.enabled``, on by default)
advances the watermark to max(ts) − delay and flushes every window it
closes, which makes the drained result exactly SQL-expressible: all
hourly windows whose end ≤ max(ts) − delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_counts(
    events: DataFrame, delay: str = "1 hour", window_len: str = "1 hour"
) -> DataFrame:
    """Streaming events(ts, event_type, value) → per-hour per-type
    counts and sums, watermarked by ``delay``."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def session_event_counts(
    events: DataFrame, gap: str = "30 minutes", delay: str = "1 hour"
) -> DataFrame:
    """Streaming events(ts, user_id) → per-user session windows
    (``session_window``: windows merge while consecutive events are
    less than ``gap`` apart; a session ends ``gap`` after its last
    event), watermarked by ``delay``.

    Append mode emits a session only once the watermark passes its end
    — the exactly-once sessionization that replaces the batch
    lag()-window sessionizer for unbounded streams; state per user is
    one open session, evicted on close, so memory is bounded by the
    number of concurrently active users, not the stream length.
    """
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n",
        )
    )


def stream_attribution(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    delay: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with a time-range condition: every
    (view, purchase) pair by the same user where the purchase lands
    within ``horizon`` after the view → (view_id, purchase_id,
    user_id, gap_us).

    The watermark + range condition is what BOUNDS the join state:
    Spark evicts a buffered view once the purchase-side watermark
    passes view.ts + horizon, so state holds ``horizon + delay`` of
    stream per side instead of the whole history — the only shape a
    10^12-event attribution join can take. Inner-join emission does not
    wait for the watermark (matches emit as they arrive), so the
    drained availableNow result equals the plain batch join — which is
    the oracle.
    """
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    ).withWatermark("v_ts", delay)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", delay)
    joined = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {horizon}")),
    )
    return joined.select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("gap_us"),
    )
