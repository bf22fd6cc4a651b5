"""Temporal operators: as-of join, interval (point-in-range) join,
SCD2 history build, grid resample + forward fill, transition matrix.

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
    # Pack the right row's value columns into ONE struct before the
    # union: the as-of match must be a single right ROW, and filling
    # each column independently would stitch a composite from
    # different rows whenever a later row carries a null field. The
    # struct is non-null for every right row (even all-null fields),
    # and left rows get a NULL struct via allowMissingColumns.
    vals = "__asof_vals"
    unioned = (
        right.withColumn(_SIDE, F.lit(0))
        .withColumn(vals, F.struct(*[F.col(c) for c in value_cols]))
        .drop(*value_cols)
        .unionByName(left.withColumn(_SIDE, F.lit(1)), allowMissingColumns=True)
    )
    filled = unioned.withColumn(vals, F.last(vals, ignorenulls=True).over(w))
    return filled.filter(F.col(_SIDE) == 1).select(
        *left.columns, *[F.col(f"{vals}.{c}").alias(c) for c in value_cols]
    )


def scd2_history(
    changes: DataFrame,
    key: str | Sequence[str],
    ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    log: per key, each surviving change row becomes a version with a
    ``[valid_from, valid_to)`` interval; the open version has
    ``valid_to IS NULL`` and ``is_current = true``.

    No-op changes (value struct identical to the previous row's) are
    collapsed, so the history records *state transitions*, not raw log
    rows — the semantics a CDC compaction step needs.

    ``tiebreak`` (e.g. a change id) makes simultaneous changes
    deterministic: at equal ``ts`` the greatest tiebreak wins (the
    earlier ones collapse into zero-length versions that are dropped).

    Plan shape: ONE hash shuffle on the key feeds all three window
    passes (lag-compare, lead-interval, version row_number share the
    same partitioning + ordering, so Catalyst plans a single sort).
    At 100 TB of log this is the minimal movement: nothing else —
    no self-join on (key, version-1), which would shuffle twice.
    """
    keys = [key] if isinstance(key, str) else list(key)
    reserved = set(keys) | {ts, tiebreak}
    vals = list(value_cols) if value_cols else [c for c in changes.columns if c not in reserved]
    if not vals:
        raise ValueError("change log has no value columns")
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    state = F.struct(*[F.col(c) for c in vals])
    # Equal-ts duplicates: keep only the last change at each ts (the
    # others never had a nonzero validity interval).
    last_at_ts = (
        F.row_number().over(
            Window.partitionBy(*keys, ts).orderBy(
                *([F.col(tiebreak).desc()] if tiebreak else [F.lit(1)])
            )
        )
        if tiebreak
        else F.lit(1)
    )
    deduped = changes.withColumn("__rn", last_at_ts).filter(F.col("__rn") == 1).drop("__rn")
    marked = deduped.withColumn(
        "__changed",
        # eqNullSafe: a null-valued field must still compare (a change
        # TO null or FROM null is a real transition).
        ~F.lag(state).over(w).eqNullSafe(state),
    ).filter(F.col("__changed"))
    w2 = Window.partitionBy(*keys).orderBy(F.col(ts).asc())
    return (
        marked.select(
            *keys,
            *vals,
            F.col(ts).alias("valid_from"),
            F.lead(ts).over(w2).alias("valid_to"),
            F.row_number().over(w2).alias("version"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def resample_ffill(
    events: DataFrame,
    key: str | Sequence[str],
    ts: str,
    value: str,
    step: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Regularize an event stream onto a fixed grid with forward fill:
    per key, emit one row per grid tick ``t`` (multiples of ``step`` in
    the key's observed [min, max] span, epoch-aligned) carrying the
    latest NON-NULL-valued observation with ``obs_ts <= t`` — pandas
    ``ffill`` semantics (null observations are skipped), and ``obs_ts``
    is the timestamp of the observation that PROVIDED the value, so
    (value, obs_ts) always describe the same row.

    ``ts`` must be an integer column (e.g. epoch seconds/micros);
    ``step`` is in the same unit. Grid ticks are global-epoch-aligned
    (floor(ts/step)*step), so resampled series from different keys or
    different runs line up — the property a feature-store backfill
    needs.

    Plan shape: the grid is derived from a per-key min/max aggregate
    (shuffle 1), exploded with ``sequence`` (narrow), then unioned with
    the observations and swept by one prefix window per key (shuffle 2)
    — the same union + running-last formulation as ``asof_join``, so
    the grid join costs no per-tick lookup. Explode size is
    span/step per key: bound it with ``step`` sized to the series
    cadence, exactly like any time-bucketing choice at scale.
    """
    keys = [key] if isinstance(key, str) else list(key)
    grid_lo = F.floor(F.min(ts) / F.lit(step)) * F.lit(step)
    grid_hi = F.floor(F.max(ts) / F.lit(step)) * F.lit(step)
    grid = (
        events.groupBy(*keys)
        .agg(F.sequence(grid_lo, grid_hi, F.lit(step)).alias("__ticks"))
        .select(*keys, F.explode("__ticks").alias("grid_ts"))
    )
    # ``tiebreak`` (e.g. an event id) makes the winner among several
    # observations in the SAME ts unit deterministic: greatest wins.
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    obs = events.select(
        *keys,
        F.col(ts).alias("grid_ts"),
        F.col(ts).alias("__obs_ts"),
        tb.alias("__tb"),
        F.col(value).alias("__obs_val"),
        F.lit(0).alias("__side"),
    )
    # Observations sort before the tick at equal ts (an observation ON
    # a grid tick is visible to it).
    unioned = grid.select(
        *keys,
        "grid_ts",
        F.lit(None).cast(obs.schema["__obs_ts"].dataType).alias("__obs_ts"),
        F.lit(None).cast(obs.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(obs.schema["__obs_val"].dataType).alias("__obs_val"),
        F.lit(1).alias("__side"),
    ).unionByName(obs)
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("grid_ts").asc(),
            F.col("__side").asc(),
            F.col("__obs_ts").asc(),
            F.col("__tb").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Fill ONE struct, null unless the observation carries a value:
    # filling value and obs_ts independently would attribute a value to
    # a later null-valued observation's timestamp.
    packed = F.when(
        F.col("__obs_val").isNotNull(),
        F.struct(F.col("__obs_val").alias("v"), F.col("__obs_ts").alias("t")),
    )
    return (
        unioned.withColumn("__fill", F.last(packed, ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select(
            *keys,
            "grid_ts",
            F.col("__fill.v").alias(value),
            F.col("__fill.t").alias("obs_ts"),
        )
    )


def transition_counts(
    events: DataFrame,
    key: str | Sequence[str],
    ts: str,
    state: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix of a per-key event stream:
    count (prev_state → next_state) adjacencies in each key's
    ``ts``-ordered sequence and attach the row-conditional probability
    ``p = n / Σ_next n``.

    The user-journey / session-flow primitive: one lag window per key
    (single shuffle on the key), then a count aggregate over the tiny
    (states × states) result and a window over ``prev_state`` for the
    normalizer — both negligible after the first shuffle at any scale.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    pairs = (
        events.select(*keys, F.lag(state).over(w).alias("prev_state"), F.col(state).alias("next_state"))
        .filter(F.col("prev_state").isNotNull())
    )
    counts = pairs.groupBy("prev_state", "next_state").agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy("prev_state")
    return counts.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(total), 6)
    )


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


def event_path_trigrams(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    top_k: int = 20,
) -> DataFrame:
    """Top-k length-3 event-type paths (sequence-mining primitive):
    per user, order events by (ts, event_id) — the id tie-break makes
    simultaneous events deterministic cross-engine — take each strict
    (e1 → e2 → e3) window via two leads, count path occurrences
    corpus-wide, rank by count.

    Scale shape: ONE shuffle partitions by user (the lead windows ride
    it), the path aggregate collapses to a ≤|types|³ dictionary with
    map-side combine, and the top-k cut is orderBy().limit() —
    TakeOrderedAndProject — with the rank window over the ≤k
    survivors only (the q94 pattern; the path dictionary grows as
    event-type³, so a single-partition sort of it is not scale-safe).
    A power user is window skew — AQE territory, same as
    sessionization.

    Returns (step1, step2, step3, n_paths, rank).
    """
    o1, o2 = order_cols
    w = Window.partitionBy(user_col).orderBy(o1, o2)
    tri = (
        events.select(
            F.col(type_col).alias("step1"),
            F.lead(type_col, 1).over(w).alias("step2"),
            F.lead(type_col, 2).over(w).alias("step3"),
        )
        .filter(F.col("step2").isNotNull() & F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
    top = tri.orderBy(F.desc("n_paths"), "step1", "step2", "step3").limit(top_k)
    rk = Window.orderBy(F.desc("n_paths"), "step1", "step2", "step3")
    return top.select(
        "step1", "step2", "step3", "n_paths", F.row_number().over(rk).alias("rank")
    )


# Kaplan-Meier dials (q204), single-sourced with the oracle: a user
# whose last event is more than KM_CHURN_GAP_US before the corpus
# horizon has churned (death observed at their lifetime-duration day);
# anyone still active at the horizon is right-censored.
KM_CHURN_GAP_US = 24 * 3_600_000_000  # 24 hours


def kaplan_meier_curve(
    events: DataFrame,
    churn_gap_us: int = KM_CHURN_GAP_US,
) -> DataFrame:
    """Kaplan-Meier survival estimate of user lifetime — the standard
    retention statistic that q64's cohort grid cannot give you,
    because it handles CENSORING: a user still active at the end of
    the observation window contributes risk-time without being counted
    as churned. Lifetime = whole days between a user's first and last
    event; death = last event more than ``churn_gap_us`` before the
    corpus horizon (the global max event time); otherwise censored at
    the same duration. Output one row per distinct lifetime day d:
      at_risk   = users with lifetime >= d,
      deaths    = observed churns at exactly d,
      censored  = censored lifetimes at exactly d,
      survival  = S(d) = product over d' <= d of (1 - deaths/at_risk).

    Determinism: the KM factors are pure IEEE divisions of integer
    counts, and S(d) is a LEFT-TO-RIGHT fold over the day-ascending
    factor array — the product runs in one documented order on one
    row, so the oracle (DuckDB list_reduce over the same ordered list)
    multiplies bit-identically; no exp(sum(log)) round trip. Scale
    shape: one shuffle to per-user (first, last) aggregates, one
    day-level aggregate over a calendar-bounded dictionary (lifetime
    days, <= a few thousand rows at ANY corpus size — that bound is
    what licenses the single-row fold), one broadcast of the one-row
    horizon aggregate."""
    from ..functions import epoch_us, portable_round

    per_user = events.groupBy("user_id").agg(
        F.min(epoch_us("ts")).alias("__first"),
        F.max(epoch_us("ts")).alias("__last"),
    )
    horizon = per_user.agg(F.max("__last").alias("__horizon"))
    lifetimes = per_user.crossJoin(F.broadcast(horizon)).select(
        ((F.col("__last") - F.col("__first")) / F.lit(86_400_000_000))
        .cast("bigint")
        .alias("__dur"),
        (
            (F.col("__horizon") - F.col("__last")) > F.lit(churn_gap_us)
        ).alias("__dead"),
    )
    days = lifetimes.groupBy("__dur").agg(
        F.sum(F.col("__dead").cast("bigint")).alias("deaths"),
        F.sum((~F.col("__dead")).cast("bigint")).alias("censored"),
    )
    risk = days.withColumn(
        "at_risk",
        F.sum(F.col("deaths") + F.col("censored")).over(
            Window.orderBy("__dur").rowsBetween(
                Window.currentRow, Window.unboundedFollowing
            )
        ),
    ).withColumn(
        "__factor",
        F.lit(1.0) - F.col("deaths").cast("double") / F.col("at_risk"),
    )
    # single-row ordered fold: the day table is calendar-bounded
    folded = risk.groupBy().agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("__dur"), "deaths", "censored", "at_risk", "__factor"
                )
            )
        ).alias("__rows")
    )
    exploded = folded.select(
        F.posexplode("__rows").alias("__i", "__r"), F.col("__rows")
    ).select(
        F.col("__r.__dur").alias("day"),
        F.col("__r.at_risk").cast("bigint").alias("at_risk"),
        F.col("__r.deaths").cast("bigint").alias("deaths"),
        F.col("__r.censored").cast("bigint").alias("censored"),
        F.aggregate(
            F.slice(F.col("__rows"), 1, F.col("__i") + 1),
            F.lit(1.0),
            lambda acc, r: acc * r["__factor"],
        ).alias("__s"),
    )
    return exploded.select(
        "day",
        "at_risk",
        "deaths",
        "censored",
        portable_round(F.col("__s"), 6).alias("survival"),
    )


# Sequential-pattern dials (q212), single-sourced with the oracle.
SEQ_PATTERN_TOPK = 20


def sequential_pattern_support(
    events: DataFrame,
    top: int = SEQ_PATTERN_TOPK,
) -> DataFrame:
    """Gap-allowed sequential-pattern support (the PrefixSpan support
    notion, specialized to length-3 patterns over the event-type
    vocabulary): a user supports pattern (a, b, c) iff their event
    sequence contains a at some position, b at a LATER position, and c
    later still — unlike q74's adjacent transitions or q130's
    consecutive trigrams, arbitrary gaps are allowed. Returns the
    ``top`` patterns by user support.

    Greedy containment is exact and join-shaped: (a,b,c) is a
    subsequence iff (first a) < (first b after that a) < (some c),
    i.e. min_pos(b | pos > first_pos(a)) < last_pos(c). So three
    dictionary-bounded aggregates close the whole 125-pattern lattice:
      F(user, t) = first position of type t,
      M(user, a, b) = min position of b after F(user, a)   (one join
        of the positions table against F — |events|·|types| rows, the
        only super-linear term, linear in the stream with a 5x fan),
      L(user, t) = last position of type t,
    support(a,b,c) = |{user : M(user,a,b) < L(user,c)}| via one
    M ⋈ L join on user. Positions are (ts, event_id)-ranked per user,
    so ties are total and both engines replay them."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = events.select(
        "user_id", F.col("event_type").alias("t"), F.row_number().over(w).alias("p")
    )
    first = pos.groupBy("user_id", F.col("t").alias("a")).agg(
        F.min("p").alias("fp")
    )
    last = pos.groupBy("user_id", F.col("t").alias("c")).agg(
        F.max("p").alias("lp")
    )
    mab = (
        pos.select("user_id", F.col("t").alias("b"), "p")
        .join(first, on="user_id")
        .filter(F.col("p") > F.col("fp"))
        .groupBy("user_id", "a", "b")
        .agg(F.min("p").alias("mp"))
    )
    supp = (
        mab.join(last, on="user_id")
        .filter(F.col("mp") < F.col("lp"))
        .groupBy(
            F.col("a").alias("step1"),
            F.col("b").alias("step2"),
            F.col("c").alias("step3"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return supp.orderBy(
        F.desc("support"), "step1", "step2", "step3"
    ).limit(top)
