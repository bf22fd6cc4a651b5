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
