"""KMV distinct-count sketch: exactness below k, estimator accuracy
above k, layout independence, and the k>=2 guard."""

import pytest
from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import sketches


@pytest.fixture(scope="module")
def keyed(spark):
    # group 'small' has 10 distinct keys (< k), 'big' has 2000 (> k).
    rows = [("small", i % 10) for i in range(100)] + [("big", i) for i in range(2000)]
    return spark.createDataFrame(rows, "grp string, key long")


def test_exact_below_k(keyed):
    out = {
        r["grp"]: r["est_distinct"]
        for r in sketches.kmv_distinct(keyed, "key", ["grp"], k=64).collect()
    }
    assert out["small"] == 10  # sketch holds every hash -> exact


def test_estimate_within_error_bound(keyed):
    out = {
        r["grp"]: r["est_distinct"]
        for r in sketches.kmv_distinct(keyed, "key", ["grp"], k=64).collect()
    }
    # standard error ~ 1/sqrt(k-2) = 12.7%; allow 4 sigma.
    assert abs(out["big"] - 2000) / 2000 < 0.5


def test_layout_independent(keyed):
    a = sketches.kmv_distinct(keyed, "key", ["grp"], k=32).collect()
    b = sketches.kmv_distinct(keyed.repartition(13, "key"), "key", ["grp"], k=32).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_duplicates_do_not_inflate(spark):
    # 50 distinct keys, each repeated 40x: distinct-hash pass must
    # collapse repeats before the bottom-k.
    df = spark.createDataFrame([("g", i % 50) for i in range(2000)], "grp string, key long")
    [r] = sketches.kmv_distinct(df, "key", ["grp"], k=64).collect()
    assert r["est_distinct"] == 50


def test_k_guard(keyed):
    with pytest.raises(ValueError):
        sketches.kmv_distinct(keyed, "key", ["grp"], k=1)


def test_builtin_approx_variants_within_bounds(spark):
    """The 100 TB hot-path variants the exact queries document
    (q36/q46): approx_count_distinct (HLL++) and approx_percentile
    (t-digest) — not oracle-comparable across engines, but their error
    bounds against the exact answers are pinned here."""
    df = spark.range(20_000).select(
        (F.col("id") % 5000).alias("key"), (F.col("id") % 997).cast("double").alias("v")
    )
    row = df.agg(
        F.approx_count_distinct("key", rsd=0.02).alias("approx_d"),
        F.count_distinct("key").alias("exact_d"),
        F.percentile_approx("v", 0.95, 10_000).alias("approx_p95"),
        F.percentile("v", F.lit(0.95)).alias("exact_p95"),
    ).first()
    assert abs(row["approx_d"] - row["exact_d"]) / row["exact_d"] < 0.06  # 3x rsd
    assert abs(row["approx_p95"] - row["exact_p95"]) <= 1.0  # adjacent value at worst
