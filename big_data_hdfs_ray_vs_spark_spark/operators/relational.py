"""Generic relational operators from SURVEY §2.2/§2.3/§2.6.

These wrap the DataFrame API thinly — the value is pinned-down,
deterministic semantics (explicit tie-breaks on top-k, seeded samples)
and scale-aware defaults (broadcast hints for dimension joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """orderBy().limit(k) — Catalyst compiles to TakeOrderedAndProject
    (no full sort, per-partition heaps + single merge; scales to any
    input size for small k). Callers pass a total order (include a
    unique tie-break column) for deterministic results."""
    return df.orderBy(*order).limit(k)


def dedupe(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """dropDuplicates — the PageRank edge dedup (pagerank_spark.py:91)."""
    return df.dropDuplicates(cols) if cols else df.distinct()


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bag union + distinct — the node-set builder (pagerank_spark.py:94-96)."""
    return a.union(b).distinct()


def seeded_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Bernoulli sample without replacement (pagerank_spark.py:168)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Explicitly-broadcast dimension join: at 100 TB the fact side must
    never shuffle for a small-dim lookup."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def salted_collect_set(
    df: DataFrame, key: str, value: str, n_salts: int = 16, out: str = "values"
) -> DataFrame:
    """Two-phase collect_set for skewed keys (hub vertices, hot users).

    Phase 1 aggregates (key, salt) partial sets — bounding any single
    task's aggregation state to ~1/n_salts of the hottest key — then
    phase 2 merges the ≤n_salts partial arrays per key. Salt is
    hash(value) % n_salts, so equal values land in the same salt and
    partial sets are already disjoint-deduped; the merge is a cheap
    flatten over few rows. Same result as groupBy(key).collect_set.
    """
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)))
    p1 = salted.groupBy(key, "__salt").agg(F.collect_set(value).alias("__part"))
    return p1.groupBy(key).agg(
        F.flatten(F.collect_list("__part")).alias(out)
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join: salt the skewed side's key into
    n_salts sub-keys, replicate the small side once per salt, join on
    (key, salt). A hot key's rows spread over n_salts tasks instead of
    one straggler; the small side pays n_salts× replication (it must be
    modest — a dimension too big to broadcast but far smaller than the
    fact). Result is row-identical to ``skewed.join(small, on, how)``.

    AQE's skew-join split handles most cases at runtime; this is the
    explicit tool for when the skew is in the AGGREGATION downstream or
    AQE is unavailable (e.g. inside a cached subtree). Supported hows:
    inner / left (the small side must be replicated, so right/full
    would double-count its unmatched rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted.join(replicated, on=[on, "__salt"], how=how)
    return joined.drop("__salt")


def intersect_via_join(a: DataFrame, b: DataFrame, on: list[str]) -> DataFrame:
    """Set intersection as a left-semi join + distinct — the scalable
    replacement for the reference's Python set.intersection closures
    (triangles_spark.py:100)."""
    return a.join(b, on=on, how="left_semi").dropDuplicates(on)
