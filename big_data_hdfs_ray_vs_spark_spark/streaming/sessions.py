"""Gap-based sessionization — batch twin (window functions) of the
streaming session-window operator.

Batch plan: lag() per user to flag gap-starts, running sum to assign
session indexes, then one grouped aggregate — two window passes and one
shuffle on user_id, no Python. At 100 TB the partitionBy(user_id)
window is the right unit: state per user fits trivially, and skewed
power-users are handled by AQE skew-join/aggregate splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import epoch_us

GAP_SECONDS = 1800


def sessionize_batch(events: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Assign session_idx per user: a new session starts when the gap
    from the previous event exceeds gap_seconds."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = epoch_us("ts") - epoch_us(F.lag("ts").over(order))
    new_session = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_idx", F.sum(new_session).over(running))


def session_window_stats_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of session_stats via the built-in session_window:
    watermark-bounded state, sessions close when no event arrives within
    `gap`. Same gap semantics as the batch lag()-based twin, so per-user
    (n_events, sum_value) multisets agree between the two paths."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_stats(events: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Per-session rollup: event count, value sum, duration seconds."""
    s = sessionize_batch(events, gap_seconds)
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(
            (epoch_us(F.max("ts")) - epoch_us(F.min("ts"))) / 1_000_000.0, 2
        ).alias("duration_sec"),
    )
