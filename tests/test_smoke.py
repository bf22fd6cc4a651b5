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
    assert len(names) == len(set(names)) == 190
    front = names[:50]
    # r8: the 25 zero-history entries added this session
    # (q166-q190) lead, then the streaming-gate entry + band-OR kNN
    # (also new this round), then the five result-changing auto-dial
    # queries, then the r4-stale block the r7 verdict ordered promoted
    # (q11-q19 + q106-q109 incl. the flagship graph/ML workloads),
    # then the r5-green q20+ fill the window exactly
    import re

    nums = [int(re.match(r"q(\d+)_", n).group(1)) for n in front]
    assert nums[:25] == [*range(166, 191)]
    assert front[25:31] == [
        "q164_stream_rollup",
        "q165_banded_mutual_knn",
        "q161_mutual_knn",
        "q103_batch_ann",
        "q112_hybrid_rrf",
        "q118_mmr_rerank",
    ]
    assert front[31] == "q132_cross_rerank"
    assert nums[32:] == [*range(11, 20), 106, 107, 108, 109, *range(20, 25)]
