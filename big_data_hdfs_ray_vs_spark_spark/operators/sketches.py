"""Mergeable sketches: KMV distinct-count, histogram quantiles,
count-min frequency.

``approx_count_distinct`` (HLL++) is the built-in answer, but its
register layout is engine-private — no other system can replay the
estimate, so a cross-engine pipeline can't audit it. KMV (K Minimum
Values) gives the same one-pass, mergeable, bounded-memory contract
with a fully deterministic definition: hash every key to uniform [0,1)
(salted md5 — the same engine-portable primitive as
operators.sampling), keep the k smallest distinct hashes per group,
estimate distinct = (k-1) / kth_smallest. Standard error ≈ 1/√(k−2).

Scale notes: the distinct-hash pass is a hash aggregate with map-side
combine (shuffle carries distinct hashes only). The bottom-k selection
here uses a per-group sort window — exact and replayable, with the
caveat that it sorts each group's distinct hashes; at 100 TB you'd
fold the bottom-k into the partial aggregate itself (an Aggregator
keeping a k-bounded heap, the datasketches KMV). The ESTIMATOR —
the part the oracle checks — is identical either way; only the
selection plumbing changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_uniform


def kmv_distinct(
    df: DataFrame,
    key: str,
    group_cols: list[str],
    k: int = 64,
    salt: str = "kmv:",
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``key``.

    Returns one row per group: ``est_distinct`` (bigint). Groups with
    fewer than k distinct keys are exact by construction (the sketch
    holds every hash)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    hashes = df.select(*group_cols, hash_uniform(F.col(key), salt).alias("__u")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__u")
    bottom = hashes.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return bottom.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n_seen"),
        F.max(F.when(F.col("__rn") == k, F.col("__u"))).alias("__kth"),
    ).select(
        *group_cols,
        F.when(F.col("__n_seen") < k, F.col("__n_seen"))
        .otherwise(F.round(F.lit(k - 1) / F.col("__kth"), 0))
        .cast("long")
        .alias("est_distinct"),
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    lo: float = 0.0,
    hi: float = 500.0,
    n_bins: int = 50,
) -> DataFrame:
    """Per-group quantile estimates from a fixed-bin histogram — the
    one-pass, mergeable scale path next to the exact global-sort
    percentile (q36).

    The sketch state is (group, bin) → count: one hash aggregate with
    map-side combine; merging shards is adding counts. The estimator is
    the nearest-rank definition on bin upper edges: for quantile q with
    group size n, rank r = ceil(q·n), estimate = upper edge of the
    first bin whose cumulative count reaches r. Error is bounded by one
    bin width ((hi−lo)/n_bins); values outside [lo, hi) clamp into the
    edge bins. Every step is integer/float arithmetic any SQL engine
    reproduces exactly — no engine-private register layout."""
    width = (hi - lo) / n_bins
    bin_ = F.least(
        F.greatest(F.floor((F.col(value_col) - lo) / width), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    # Drop nulls AND NaNs BEFORE binning: greatest() skips null
    # arguments (null would clamp into bin 0 as a phantom lo-edge
    # observation), and Spark's floor(NaN) casts to 0 while other
    # engines clamp NaN high — neither is an observation.
    vc = F.col(value_col).cast("double")
    df = df.filter(vc.isNotNull() & ~F.isnan(vc))
    counts = df.select(*group_cols, bin_.alias("__bin")).groupBy(
        *group_cols, "__bin"
    ).agg(F.count(F.lit(1)).alias("__c"))
    wcum = Window.partitionBy(*group_cols).orderBy("__bin")
    wtot = Window.partitionBy(*group_cols)
    cum = counts.select(
        *group_cols,
        "__bin",
        F.sum("__c").over(wcum).alias("__cum"),
        F.sum("__c").over(wtot).alias("__n"),
    )
    edge = F.lit(lo) + (F.col("__bin") + 1) * F.lit(width)
    aggs = [
        F.min(
            F.when(F.col("__cum") >= F.ceil(F.lit(q) * F.col("__n")), edge)
        ).alias(f"p{int(round(q * 100))}")
        for q in quantiles
    ]
    return cum.groupBy(*group_cols).agg(
        F.max("__n").cast("long").alias("n"), *aggs
    )


def cms_counters(
    df: DataFrame, key: str, width: int = 1024, depth: int = 3, salt: str = "c"
) -> DataFrame:
    """Count-min sketch build: (row, pos) → count, the sparse form of a
    depth×width counter matrix. One explode(depth positions) + hash
    aggregate — map-side combined, shuffle bounded by depth·width rows.
    Sketches merge by adding counters. Hash is the engine-portable
    salted md5-prefix (same primitive as sampling.hash_uniform), so any
    SQL engine replays the exact counters."""
    from .dedup import md5_hash60

    positions = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(
                    md5_hash60(F.concat(F.lit(f"{salt}{r}:"), F.col(key).cast("string"))),
                    F.lit(width),
                ).cast("int").alias("pos"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(positions).alias("rp"))
        .select(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
        .groupBy("row", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key: str,
    width: int = 1024,
    depth: int = 3,
    salt: str = "c",
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a count-min sketch:
    est = min over the depth rows of the key's counter. Never
    underestimates the true count (every occurrence incremented every
    row); overestimate is bounded by collisions ≈ n/width per row.
    The probe joins depth rows per key against the (small) counter
    table — broadcast-sized by construction."""
    from .dedup import md5_hash60

    positions = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(
                    md5_hash60(F.concat(F.lit(f"{salt}{r}:"), F.col(key).cast("string"))),
                    F.lit(width),
                ).cast("int").alias("pos"),
            )
            for r in range(depth)
        ]
    )
    probes = keys.select(key, F.explode(positions).alias("rp")).select(
        key, F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos")
    )
    return (
        probes.join(F.broadcast(counters), on=["row", "pos"], how="left")
        .groupBy(key)
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est_count"))
    )


def moments_partials(
    df: DataFrame,
    group: list[str] | str,
    value: str,
) -> DataFrame:
    """Per-group mergeable moment state (n, mean, m2): the sufficient
    statistics for count/mean/variance, computed in one aggregate
    pass. ``m2 = Σ(x − mean)² = var_pop · n``.

    This is THE incremental-aggregation primitive: materialize partials
    at a fine grain (per day, per shard, per ingest batch) and answer
    any coarser rollup from the partials alone — no fact re-scan. The
    same shape underlies every distributed variance (Spark's own
    aggregate buffers are exactly this state)."""
    keys = [group] if isinstance(group, str) else list(group)
    return df.groupBy(*keys).agg(
        F.count(value).alias("n"),
        F.avg(value).alias("mean"),
        (F.var_pop(value) * F.count(value)).alias("m2"),
    )


def merge_moments(
    partials: DataFrame,
    group: list[str] | str,
) -> DataFrame:
    """Merge moment partials to a coarser grouping via the parallel
    (Chan et al.) combine: merged mean is the weighted mean; merged
    m2 adds each part's m2 plus its between-part shift n·(mean−M)².
    Returns (group..., n, mean, var_samp) — identical numbers to a
    direct pass over the raw rows, without touching them.

    Two tiny aggregates over the partials table (one for the merged
    means, one for the shifted m2 sum) joined back — cost scales with
    the number of PARTIALS, not the corpus."""
    keys = [group] if isinstance(group, str) else list(group)
    merged = partials.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        (F.sum(F.col("mean") * F.col("n")) / F.sum("n")).alias("mean"),
    )
    joined = partials.join(
        F.broadcast(merged.select(*keys, F.col("mean").alias("__M"))), on=keys
    )
    m2 = joined.groupBy(*keys).agg(
        F.sum(
            F.col("m2") + F.col("n") * (F.col("mean") - F.col("__M")) * (F.col("mean") - F.col("__M"))
        ).alias("m2")
    )
    return (
        merged.join(m2, on=keys)
        .select(
            *keys,
            "n",
            F.round("mean", 6).alias("mean"),
            F.round(
                F.when(F.col("n") > 1, F.col("m2") / (F.col("n") - 1)), 6
            ).alias("var_samp"),
        )
    )


# ---------------------------------------------------------------------------
# Portable-register HyperLogLog.
#
# The module docstring's caveat about approx_count_distinct — its HLL++
# registers are engine-private — is exactly what this closes: an HLL
# whose registers are DEFINED (md5-hash bucketing, integer rho), so any
# engine can rebuild, merge, or audit the same sketch bit-for-bit.
# Registers are rows (bucket, max rho): mergeable by a max-aggregate,
# which is the whole point at 100 TB — per-partition/per-day sketches
# combine with a 256-row shuffle instead of a re-scan.

HLL_P = 8  # 2^8 = 256 registers, standard error ~ 1.04/sqrt(256) = 6.5%
HLL_M = 1 << HLL_P
# alpha_m for m >= 128 (Flajolet et al. 2007), computed once and shared
# with the oracle via repr() so both engines parse the identical double.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# md5_hash60 yields 60 bits: low p pick the register, the remaining
# 52 feed rho. rho = (leading zeros of the 52-bit window) + 1; an
# all-zero window gives the max rho of 53.
HLL_W_BITS = 60 - HLL_P


def _hll_rho(w):
    """Folded integer CASE chain for rho — exact comparisons against
    powers of two, no float log2 whose boundary rounding could differ
    between engines. oracles._hll_rho_sql is generated from the same
    loop; tests pin the two on a boundary sweep."""
    chain = None
    for k in range(HLL_W_BITS - 1, -1, -1):  # highest threshold first
        cond = w >= F.lit(1 << k)
        val = F.lit(HLL_W_BITS - k)
        chain = F.when(cond, val) if chain is None else chain.when(cond, val)
    return chain.otherwise(F.lit(HLL_W_BITS + 1))


def hll_registers(
    df: DataFrame, key: str, group_cols: list[str] | None = None
) -> DataFrame:
    """One-pass HLL register table for ``key``: (group..., bucket, r)
    with r = max rho over the bucket's keys; NULL keys are not
    observations. A hash aggregate with map-side combine — the shuffle
    carries at most 256 rows per (group, upstream partition). Merge
    sketches by unioning register tables and re-aggregating max(r);
    with ``group_cols`` this is one sketch PER GROUP, the per-tenant /
    per-day cardinality-monitoring shape (each group's state is still
    bounded at 256 rows)."""
    from .dedup import md5_hash60

    groups = list(group_cols or [])
    # Keys hash via their canonical string rendering (md5 of UTF-8
    # bytes) — the only form every engine spells identically; a direct
    # binary cast of a numeric key is engine-private layout.
    h = md5_hash60(F.col(key).cast("string"))
    w = F.shiftright(h, HLL_P)
    bucket = h.bitwiseAND(F.lit(HLL_M - 1))
    return (
        df.filter(F.col(key).isNotNull())
        .select(*groups, bucket.alias("bucket"), _hll_rho(w).alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate from a register table, in EXACT integer
    space until the last division: Σ 2^(−r_j) over all m registers is
    assembled as Σ 2^(53−r_j) (a bigint ≤ 256·2^53 — order-independent,
    no float summation drift), absent registers contributing 2^53 each.
    Raw estimate α·m²·2^53 / S; the standard linear-counting correction
    applies below 2.5·m when empty registers remain (that branch is the
    only transcendental — ln — and the output is rounded to 4dp, far
    above any libm last-ulp divergence).

    Returns ONE row per group — (group..., m, used, zeros, s_int, est);
    a single global row when ``group_cols`` is empty."""
    groups = list(group_cols or [])
    sum_expr = F.sum(
        # pyspark's shiftleft only takes a Python-int bit count; the
        # SQL form accepts a column expression for it.
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W_BITS + 1} - r)")
    ).alias("s_present")
    if groups:
        agg = registers.groupBy(*groups).agg(
            F.count(F.lit(1)).alias("used"), sum_expr
        )
    else:
        agg = registers.agg(F.count(F.lit(1)).alias("used"), sum_expr)
    full_scale = 1 << (HLL_W_BITS + 1)
    s_int = (
        F.coalesce("s_present", F.lit(0))
        + (F.lit(HLL_M) - F.coalesce("used", F.lit(0))) * F.lit(full_scale)
    ).alias("s_int")
    zeros = (F.lit(HLL_M) - F.coalesce("used", F.lit(0))).alias("zeros")
    base = agg.select(
        *groups,
        F.lit(HLL_M).alias("m"),
        F.coalesce("used", F.lit(0)).alias("used"),
        zeros,
        s_int,
    )
    e_raw = (
        F.lit(HLL_ALPHA) * F.lit(float(HLL_M)) * F.lit(float(HLL_M)) * F.lit(float(full_scale))
    ) / F.col("s_int")
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (F.col("zeros") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("zeros")),
    ).otherwise(e_raw)
    # portable_round, not round(): Spark rounds the shortest decimal
    # string (HALF_UP) where DuckDB rounds the binary value — est is
    # non-negative, so the floor(x·1e4 + 0.5)/1e4 form is exact-same-FP
    # on both engines (see functions.portable_round).
    from ..functions import portable_round

    return base.select(
        *groups, "m", "used", "zeros", "s_int", portable_round(est, 4).alias("est")
    )


def kmv_set_ops(
    df: DataFrame,
    key: str,
    set_col: str,
    set_a: str,
    set_b: str,
    k: int = 64,
    salt: str = "kmv:",
) -> DataFrame:
    """KMV sketch SET ALGEBRA: distinct-count estimates for two sets,
    their union, and (by inclusion–exclusion) their intersection — the
    mergeable-sketch answer to "how many users did BOTH X and Y"
    without a corpus-scale distinct-join. The union sketch is exactly
    the KMV of the pooled hash stream (k smallest of A ∪ B), so two
    shards' sketches merge by concatenation — the property that makes
    this a one-pass answer over a 100 TB event log where the exact
    distinct-intersection is a full shuffle of the key universe.

    One row out: est_a, est_b, est_union (each the q46 estimator:
    exact below k, else (k−1)/kth-smallest-hash), est_intersection =
    max(0, est_a + est_b − est_union). Same salted 60-bit md5 as
    kmv_distinct, so the DuckDB oracle replays every hash."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if set_a == set_b:
        raise ValueError("set_a and set_b must name distinct sets")
    if "__union" in (set_a, set_b):
        raise ValueError("'__union' is a reserved sentinel set name")
    # null keys carry no identity — and NULL hash rows would sort
    # differently across engines (Spark NULLS FIRST vs DuckDB LAST)
    marked = (
        df.filter(F.col(set_col).isin(set_a, set_b) & F.col(key).isNotNull())
        .select(
            F.col(set_col).alias("__set"), hash_uniform(F.col(key), salt).alias("__u")
        )
    )
    # per-set sketches + the pooled-union sketch in ONE pass: tag each
    # distinct (set, hash) row, union a copy tagged '__both'
    per_set = marked.distinct()
    pooled = marked.select(F.lit("__union").alias("__set"), "__u").distinct()
    tagged = per_set.union(pooled)
    w = Window.partitionBy("__set").orderBy("__u")
    bottom = tagged.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    ests = (
        bottom.groupBy("__set")
        .agg(
            F.count(F.lit(1)).alias("__n_seen"),
            F.max(F.when(F.col("__rn") == k, F.col("__u"))).alias("__kth"),
        )
        .select(
            "__set",
            F.when(F.col("__n_seen") < k, F.col("__n_seen"))
            .otherwise(F.round(F.lit(k - 1) / F.col("__kth"), 0))
            .cast("long")
            .alias("__est"),
        )
    )
    one = ests.groupBy().pivot("__set", [set_a, set_b, "__union"]).sum("__est")
    return one.select(
        F.coalesce(F.col(f"`{set_a}`"), F.lit(0)).alias("est_a"),
        F.coalesce(F.col(f"`{set_b}`"), F.lit(0)).alias("est_b"),
        F.coalesce(F.col("`__union`"), F.lit(0)).alias("est_union"),
        F.greatest(
            F.lit(0),
            F.coalesce(F.col(f"`{set_a}`"), F.lit(0))
            + F.coalesce(F.col(f"`{set_b}`"), F.lit(0))
            - F.coalesce(F.col("`__union`"), F.lit(0)),
        ).alias("est_intersection"),
    )
