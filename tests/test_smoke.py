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
    assert len(names) == len(set(names)) == 163
    front = names[:50]
    # r7 final: the EIGHTEEN zero-driver-history queries lead
    # (q152-q163 then q146-q151), then q110-q131 + q01-q10 (last
    # driver-checked r4 — the stalest block) fill the window exactly;
    # q11-q19 + q106-q109 rotate just past the boundary (promote first
    # in r8)
    assert front[:18] == [
        "q152_winnow_overlap",
        "q153_cluster_safe_split",
        "q154_soft_dedup_weights",
        "q155_standardization_audit",
        "q156_hard_negatives",
        "q157_adaptive_quality_cutoff",
        "q158_chunk_documents",
        "q159_nation_trade_volume",
        "q160_order_priority_check",
        "q161_mutual_knn",
        "q162_exact_group_sample",
        "q163_minhash_calibration",
        "q146_audio_features",
        "q147_ivf_pq_search",
        "q148_ivf_pq_recall",
        "q149_charset_audit",
        "q150_embedding_dim_profile",
        "q151_anisotropy",
    ]
    import re

    tail_nums = [int(re.match(r"q(\d+)_", n).group(1)) for n in front[18:]]
    assert tail_nums == [*range(110, 132), *range(1, 11)]
