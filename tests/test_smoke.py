from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.sources import load_table
from big_data_hdfs_ray_vs_spark_spark.sources.reddit import (
    reddit_edges,
    synthetic_reddit_posts,
)

SF_SMOKE = "/root/testdata/sf0.001"


def test_load_tables(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    assert li.count() == 6000
    assert "l_quantity" in li.columns


def test_synthetic_reddit_deterministic(spark):
    a = synthetic_reddit_posts(spark, 500, partitions=2)
    b = synthetic_reddit_posts(spark, 500, partitions=7)
    assert len(a.columns) == 26
    ha = a.agg(F.sum(F.pmod(F.xxhash64(*a.columns), F.lit(10**9)))).first()[0]
    hb = b.agg(F.sum(F.pmod(F.xxhash64(*b.columns), F.lit(10**9)))).first()[0]
    assert ha == hb  # partitioning-independent determinism


def test_reddit_edges(spark):
    posts = synthetic_reddit_posts(spark, 500)
    edges = reddit_edges(posts)
    assert edges.columns == ["src", "dst"]
    assert edges.count() == 500
