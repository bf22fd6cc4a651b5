"""K-means fixture (FIXTURES.md §3): 3 well-separated seeded Gaussian
blobs in the 8-feature space; recovered centroids must match blob
centers under label permutation; invalid rows must be skipped."""

import numpy as np
import pytest

from big_data_hdfs_ray_vs_spark_spark.plans.kmeans import (
    assemble_features,
    cluster_histogram,
    kmeans_fit,
)
from big_data_hdfs_ray_vs_spark_spark.schemas import KMEANS_FEATURES

CENTERS = [
    [0.05, 50, 100, 10, 5, 0.2, 0.1, 0.0],     # short posts
    [0.10, 2000, 500, 25, 12, 0.5, 0.2, 0.4],  # long posts
    [0.30, 800, 6500, 60, 30, 0.1, 0.6, -0.5], # long sentences
]
SIZES = [120, 90, 60]


def _blobs(spark, with_nulls: int = 0):
    rng = np.random.default_rng(42)
    rows = []
    for center, size in zip(CENTERS, SIZES):
        pts = rng.normal(loc=center, scale=np.abs(np.array(center)) * 0.02 + 0.01,
                         size=(size, 8))
        rows += [tuple(map(float, p)) for p in pts]
    for i in range(with_nulls):
        bad = list(rows[i])
        bad[i % 8] = None
        rows.append(tuple(bad))
    schema = ", ".join(f"{c} double" for c in KMEANS_FEATURES)
    return spark.createDataFrame(rows, schema)


def test_recovers_blob_centers(spark):
    df = _blobs(spark)
    centroids, assignments, _ = kmeans_fit(df, KMEANS_FEATURES, k=3)
    got = sorted(centroids, key=lambda c: c[1])  # order by NumWords dim
    want = sorted(CENTERS, key=lambda c: c[1])
    for g, w in zip(got, want):
        rel = np.abs(np.array(g) - np.array(w)) / (np.abs(np.array(w)) + 1.0)
        assert rel.max() < 0.05, (g, w)
    hist = {r["cluster"]: r["count"] for r in cluster_histogram(assignments).collect()}
    assert sorted(hist.values()) == sorted(SIZES)


def test_invalid_rows_skipped(spark):
    df = _blobs(spark, with_nulls=5)
    assembled = assemble_features(df, KMEANS_FEATURES)
    # handleInvalid="skip" (kmeans_spark.py:104-110) drops the 5 rows.
    assert assembled.count() == sum(SIZES)


def test_deterministic_with_seed(spark):
    df = _blobs(spark)
    c1, _, _ = kmeans_fit(df, KMEANS_FEATURES, k=3, seed=42)
    c2, _, _ = kmeans_fit(df, KMEANS_FEATURES, k=3, seed=42)
    assert np.allclose(np.array(sorted(c1)), np.array(sorted(c2)))


def test_lloyd_degrades_k_on_tiny_input_and_rejects_empty(spark):
    from big_data_hdfs_ray_vs_spark_spark.plans.kmeans import lloyd_kmeans

    two = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 10.0])], "vec_id long, embedding array<double>"
    )
    cens, assigned = lloyd_kmeans(two, k=3, iters=2)
    # k degrades to the row count instead of indexing past the init list
    assert len(cens) == 2
    assert {r["cluster"] for r in assigned.collect()} == {0, 1}
    assigned.unpersist()

    empty = two.filter("vec_id < 0")
    with pytest.raises(ValueError, match="no rows"):
        lloyd_kmeans(empty, k=3, iters=1)


def test_sample_lloyd_matches_distributed_on_full_sample(spark):
    """When sample_n covers every row, lloyd_kmeans_sample must
    reproduce the distributed lloyd_kmeans recurrence exactly (same
    init, argmin ties, means, empty-cluster rule) — this equivalence
    is what lets the q30 oracle replay the sample-trained quantizer."""
    from big_data_hdfs_ray_vs_spark_spark.plans.kmeans import (
        lloyd_kmeans,
        lloyd_kmeans_sample,
    )

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    dist_c, assigned = lloyd_kmeans(df, k=4, iters=3)
    assigned.unpersist()
    samp_c = lloyd_kmeans_sample(df, k=4, iters=3, sample_n=4096)
    assert np.allclose(np.array(dist_c), np.array(samp_c), atol=1e-9)


def test_sample_lloyd_bounded_sample_and_assign(spark):
    """sample_n < n trains on the smallest-id prefix only; assignment
    via assign_clusters still covers every row, map-only."""
    from big_data_hdfs_ray_vs_spark_spark.plans.kmeans import (
        assign_clusters,
        lloyd_kmeans_sample,
    )

    rows = [(i, [float(i), 0.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cens = lloyd_kmeans_sample(df, k=2, iters=2, sample_n=10)
    # trained on ids 0..9 only: centroids live inside [0, 9]
    assert all(0.0 <= c[0] <= 9.0 for c in cens)
    out = assign_clusters(df, cens, "embedding").collect()
    assert len(out) == 20
    assert {r["cluster"] for r in out} == {0, 1}
    # nearest-centroid invariant, ties to the lowest index
    for r in out:
        d = [(r["embedding"][0] - c[0]) ** 2 + (r["embedding"][1] - c[1]) ** 2
             for c in cens]
        assert r["cluster"] == d.index(min(d))


def test_sample_lloyd_rejects_empty(spark):
    from big_data_hdfs_ray_vs_spark_spark.plans.kmeans import lloyd_kmeans_sample

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no rows"):
        lloyd_kmeans_sample(empty, k=3, iters=1)
