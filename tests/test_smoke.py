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
    assert len(names) == len(set(names)) == 145
    front = names[:50]
    # r6: the seven brand-new queries lead, then q63-q100 (stale since
    # r3), then q101-q105 fillers
    assert front[:7] == [
        "q139_exact_substring_dedup",
        "q140_bpe_encode",
        "q141_pq_search",
        "q142_pq_recall",
        "q143_matryoshka_recall",
        "q144_source_kl",
        "q145_distribution_match",
    ]
    import re

    tail_nums = [int(re.match(r"q(\d+)_", n).group(1)) for n in front[7:]]
    assert tail_nums == [*range(63, 101), *range(101, 106)]
