"""Stream-static enrichment join — the lookup pattern every ingest
stream needs: attach slowly-changing dimension attributes to each
event as it arrives.

Stream-static joins need no state store at all: Spark re-plans the
static side per micro-batch, so a broadcast-sized dimension costs one
broadcast per batch and the stream side never shuffles. That is the
scale contract — enrichment throughput is the scan rate of the stream,
independent of history. (A stream-STREAM join, by contrast, keeps
watermark-bounded state on both sides; use it only when both inputs
are genuinely unbounded.)

Inner and left-outer are the streaming-supported joins when the stream
is on the left; right/full would need the static side to track unseen
stream keys, which Spark (correctly) rejects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming DataFrame to a static dimension.

    ``broadcast_dim`` pins the broadcast strategy so a statistics
    misestimate can never flip the per-batch plan into shuffling the
    stream side; pass False for a dimension past broadcast size (the
    join then shuffles both sides per batch — still correct, but the
    dimension should probably be bucket-pre-partitioned instead)."""
    if how not in ("inner", "left"):
        raise ValueError(f"stream-static join supports inner/left, got {how!r}")
    right = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(right, on=on, how=how)


def user_profile_dim(events_batch: DataFrame) -> DataFrame:
    """Demo dimension derived from history: per-user lifetime stats.
    In production this is a real profile table; the shape (one narrow
    row per user, broadcastable) is what matters."""
    return events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("lifetime_events"),
        F.round(F.avg("value"), 4).alias("lifetime_avg_value"),
    )
