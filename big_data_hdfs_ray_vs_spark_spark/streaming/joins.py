"""Stream-stream interval join — correlating two unbounded inputs
(e.g. attribute each purchase to the same user's clicks in the
preceding hour) with watermark-bounded state on both sides.

This is the join mode stream-static enrichment (enrich.py) explicitly
defers to: both inputs genuinely unbounded, so Spark must buffer each
side until the watermark proves no matching row can still arrive. The
state bound is the product of the watermark delay and the interval
width — the two knobs that decide memory at scale:

- the **watermark delay** bounds how out-of-order events may be and
  therefore how long a row is kept for late partners;
- the **time-range predicate** (an interval condition on both event
  times) lets Spark evict state as the watermark passes the interval's
  trailing edge — an equality-only stream-stream join without a time
  bound would keep state forever and is rejected in append mode.

The batch twin (``interval_join_batch``) runs the identical predicate
as a plain join, which is what the stream≡batch equivalence test
pins. At 100 TB/day the stream side shuffles on (key) per micro-batch
and state lives in the checkpointed store — sized by rate × delay,
not by history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _interval_cond(left_alias: str, right_alias: str, key: str, ts: str, lookback: str):
    return F.expr(
        f"{left_alias}.{key} = {right_alias}.{key} AND "
        f"{right_alias}.{ts} >= {left_alias}.{ts} - INTERVAL {lookback} AND "
        f"{right_alias}.{ts} <= {left_alias}.{ts}"
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    lookback: str = "1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each left-stream row to the right-stream rows of the same
    key whose timestamp falls in ``[left.ts - lookback, left.ts]``.

    Both sides carry the same watermark; the time-range predicate gives
    Spark the state-eviction bound. Output columns are the key, both
    timestamps and both value columns aliased ``l_``/``r_``.
    """
    l = left.withWatermark(ts, watermark).alias("l")
    r = right.withWatermark(ts, watermark).alias("r")
    joined = l.join(r, _interval_cond("l", "r", key, ts, lookback), "inner")
    return joined.select(
        F.col(f"l.{key}").alias(key),
        F.col(f"l.{ts}").alias("l_ts"),
        F.col(f"r.{ts}").alias("r_ts"),
        *[
            F.col(f"l.{c}").alias(f"l_{c}")
            for c in left.columns
            if c not in (key, ts)
        ],
        *[
            F.col(f"r.{c}").alias(f"r_{c}")
            for c in right.columns
            if c not in (key, ts)
        ],
    )


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    lookback: str = "1 HOUR",
) -> DataFrame:
    """Batch twin: the identical predicate as a plain join (Catalyst
    plans the equi-key part as a hash join with the range predicate as
    a post-filter). Same output schema as interval_join_stream."""
    l = left.alias("l")
    r = right.alias("r")
    joined = l.join(r, _interval_cond("l", "r", key, ts, lookback), "inner")
    return joined.select(
        F.col(f"l.{key}").alias(key),
        F.col(f"l.{ts}").alias("l_ts"),
        F.col(f"r.{ts}").alias("r_ts"),
        *[
            F.col(f"l.{c}").alias(f"l_{c}")
            for c in left.columns
            if c not in (key, ts)
        ],
        *[
            F.col(f"r.{c}").alias(f"r_{c}")
            for c in right.columns
            if c not in (key, ts)
        ],
    )
