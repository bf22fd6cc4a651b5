"""Temporal joins: as-of join and interval (point-in-range) join.

The reference has no temporal-join surface (its events are independent
rows), but every event/time-series pipeline needs these two operations,
and Spark's join operator does not provide either natively — a naive
formulation falls into BroadcastNestedLoopJoin (the O(n·m) trap). Both
are expressed as compositions of built-in DataFrame ops chosen for
their shuffle shape at 100 TB:

- ``asof_join``: the union + prefix-window formulation. ONE shuffle
  (hash-partition both sides by key, one sort per partition), state is
  a single running value per key — versus a per-row correlated lookup
  or an inequality join that degenerates to a nested loop. This is the
  plan a 100 TB event backfill wants: both inputs co-partitioned once,
  then a linear merge.
- ``range_join_bins``: an equi-join surrogate for interval × point
  joins with NO equi key. Quantize time into bins sized to the maximum
  interval length, explode each interval to the bins it covers (≤ 2
  when bin_width ≥ interval length), hash-join points on their bin,
  refine with the exact range predicate. Shuffle volume is
  O(|intervals| · bins_per_interval + |points|) — never a cross
  product. Skewed bins (a hot hour) are AQE skew-join territory, same
  as any hot key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str = "ts",
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (direction="backward"; ties included), or
    the earliest with ``right.ts >= left.ts`` (direction="forward"),
    per key.

    ``right`` must carry ONLY: the key columns, ``ts``, the optional
    ``tiebreak`` column, and the value columns to attach — value
    columns are taken under their own names, so the caller aliases them
    to output names that don't collide with ``left``'s columns.

    ``tiebreak`` (a right-side column, e.g. an event id) makes the
    pick among equal-``ts`` right rows deterministic: the one greatest
    (backward) / least (forward) under the tiebreak wins. Determinism
    under ties is what lets a SQL oracle replay the result exactly.
    """
    keys = [on] if isinstance(on, str) else list(on)
    reserved = set(keys) | {ts, tiebreak}
    value_cols = [c for c in right.columns if c not in reserved]
    if not value_cols:
        raise ValueError("right side has no value columns to attach")
    collisions = set(value_cols) & set(left.columns)
    if collisions:
        raise ValueError(f"right value columns collide with left: {sorted(collisions)}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")

    asc = direction == "backward"

    def _ord(col: str):
        c = F.col(col)
        return c.asc() if asc else c.desc()

    # Right rows sort before left rows at equal ts in frame order, so an
    # exactly-simultaneous right row is visible to the left row (the
    # <= / >= boundary semantics).
    order = [_ord(ts), F.col(_SIDE).asc()] + ([_ord(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = right.withColumn(_SIDE, F.lit(0)).unionByName(
        left.withColumn(_SIDE, F.lit(1)), allowMissingColumns=True
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c not in value_cols],
        # Left rows carry NULL in every right value column, so the
        # running last-non-null is exactly the as-of match.
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col(_SIDE) == 1).select(*left.columns, *value_cols)


def range_join_bins(
    intervals: DataFrame,
    points: DataFrame,
    start: str,
    end: str,
    point_ts: str,
    bin_width: int,
) -> DataFrame:
    """Join every point to every interval with ``start <= pt < end``
    (half-open, so adjacent intervals never double-count a boundary
    point). ``start``/``end``/``point_ts`` are integer columns in the
    same unit (e.g. epoch micros).

    ``bin_width`` should be ≥ the longest interval so each interval
    lands in at most 2 bins; shorter widths still produce correct
    results, just more exploded rows. Each (interval, point) pair can
    match in only one bin — the point's own — so no dedup pass is
    needed after the refine filter.
    """
    bin_of = lambda c: F.floor(F.col(c) / F.lit(bin_width))  # noqa: E731
    # Drop empty/inverted intervals BEFORE the explode: sequence(a, b)
    # runs DESCENDING when b < a, so one garbage row with end << start
    # would otherwise fan out into millions of spurious bins.
    iv = intervals.filter(F.col(end) > F.col(start)).withColumn(
        "__bin",
        F.explode(F.sequence(bin_of(start), F.floor((F.col(end) - 1) / F.lit(bin_width)))),
    )
    pt = points.withColumn("__bin", bin_of(point_ts))
    return (
        iv.join(pt, "__bin")
        .filter((F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end)))
        .drop("__bin")
    )
