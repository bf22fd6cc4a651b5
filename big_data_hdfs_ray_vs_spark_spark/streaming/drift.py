"""Windowed PSI drift monitor: per event-time window, compare the
value distribution against a fixed reference histogram — the streaming
twin of operators.profile.psi_drift (q82) for live did-the-feed-shift
alerting.

Design constraint: Spark allows ONE stateful aggregation per stream,
so the per-window PSI cannot be a (window, bin) aggregate followed by
a per-window reduction. Instead the fixed bin grid becomes CONDITIONAL
COUNT COLUMNS inside a single groupBy(window) aggregate, the reference
shares travel as bounded literals (bins+2 floats — the centroid-
broadcast pattern), and the PSI folds into the projection. State per
window is one row of ~a dozen longs, bounded by the watermark horizon
regardless of input rate; the same function runs unchanged on a batch
frame (withWatermark is a no-op there), which is what the stream≡batch
test pins.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PSI_EPS = 1e-6


def _bin_id(value: str, lo: float, hi: float, bins: int):
    width = (hi - lo) / bins
    return (
        F.when(F.col(value) < lo, F.lit(-1))
        .when(F.col(value) >= hi, F.lit(bins))
        .otherwise(F.floor((F.col(value) - F.lit(lo)) / F.lit(width)).cast("int"))
    )


def reference_shares(
    df: DataFrame,
    value: str = "value",
    lo: float = 0.0,
    hi: float = 100.0,
    bins: int = 10,
) -> list[float]:
    """Batch helper: the reference distribution as bins+2 shares
    (underflow, bins..., overflow) — ONE conditional-count aggregate,
    a bounded driver collect (like a centroid table). NULL values are
    not observations."""
    base = df.select(_bin_id(value, lo, hi, bins).alias("__b")).filter(
        F.col("__b").isNotNull()
    )
    row = base.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.when(F.col("__b") == i, 1).otherwise(0)).alias(f"c{i}")
            for i in range(-1, bins + 1)
        ],
    ).first()
    n = row["__n"] or 0
    if n == 0:
        raise ValueError("reference_shares: reference slice has no observations")
    return [row[f"c{i}"] / n for i in range(-1, bins + 1)]


def windowed_psi(
    events: DataFrame,
    ref: list[float],
    value: str = "value",
    window: str = "1 hour",
    watermark: str = "10 minutes",
    lo: float = 0.0,
    hi: float = 100.0,
    bins: int = 10,
    eps: float = PSI_EPS,
) -> DataFrame:
    """Per-window PSI against ``ref`` (reference_shares output, length
    bins+2). Returns (window_start, window_end, n_events, psi 6dp) —
    append-mode emits each window once its watermark closes. PSI uses
    the q82 convention: shares floored at ``eps`` so empty bins
    contribute finitely; <0.1 stable, >0.25 action."""
    if len(ref) != bins + 2:
        raise ValueError(f"windowed_psi: ref must have bins+2={bins + 2} shares")
    tagged = events.filter(F.col(value).isNotNull()).select(
        "ts", _bin_id(value, lo, hi, bins).alias("__b")
    )
    agg = (
        tagged.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(F.when(F.col("__b") == i, 1).otherwise(0)).alias(f"c{i}")
                for i in range(-1, bins + 1)
            ],
        )
    )
    contribs = []
    for idx, i in enumerate(range(-1, bins + 1)):
        p = max(float(ref[idx]), eps)
        q = F.greatest(F.col(f"c{i}") / F.col("__n"), F.lit(eps))
        contribs.append((F.lit(p) - q) * (F.lit(math.log(p)) - F.log(q)))
    psi = contribs[0]
    for c in contribs[1:]:
        psi = psi + c
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("__n").alias("n_events"),
        F.round(psi, 6).alias("psi"),
    )
