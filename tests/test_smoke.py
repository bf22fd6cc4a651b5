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


def test_driver_window_composition():
    """The driver's correctness gate checks the FIRST 50 registry
    entries; the rotation comment in all_queries() documents which
    block that is. Pin the composition so a reorder that silently
    drops a never-checked query out of the window fails here first."""
    from big_data_hdfs_ray_vs_spark_spark.queries import all_queries

    names = list(all_queries())
    assert len(names) == len(set(names)) == 213
    front = names[:50]
    # r9: the two new curation ops (q191 quality classifier, q192
    # URL/host dedup) lead, then the r5-stale block the r8 verdict
    # ordered rotated forward (q25-q62 + q133-q138 — last
    # driver-checked in round 5, the oldest evidence in the registry),
    # then four of the r9-new entries (q201/q204/q205/q208, incl. the
    # session-window streaming gate) fill the window exactly
    import re

    nums = [int(re.match(r"q(\d+)_", n).group(1)) for n in front]
    assert nums[:2] == [191, 192]
    assert nums[2:40] == [*range(25, 63)]
    assert nums[40:46] == [*range(133, 139)]
    assert front[46:] == [
        "q201_knn_label_metrics",
        "q204_survival_retention",
        "q205_stream_sessions",
        "q208_skyline",
    ]
