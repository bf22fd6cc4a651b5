"""Property tests for q122 (co-purchase pairs) and q123 (bootstrap CI)."""

from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.queries import (
    q122_copurchase_pairs,
    q123_bootstrap_ci,
)

SF = "/root/testdata/sf0.001"


def test_copurchase_pairs_ordered_and_ranked(spark):
    rows = q122_copurchase_pairs(spark, SF).collect()
    assert 0 < len(rows) <= 20
    assert all(r.part_a < r.part_b for r in rows)
    supports = [r.support for r in rows]
    assert supports == sorted(supports, reverse=True)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    out1 = {r.event_type: r for r in q123_bootstrap_ci(spark, SF).collect()}
    assert out1
    for r in out1.values():
        assert r.ci_lo <= r.boot_mean <= r.ci_hi
        assert 0 < r.n_reps <= 64
    # Layout-independence: the hash membership must not depend on
    # partitioning, so a second run returns identical rows.
    out2 = {r.event_type: r for r in q123_bootstrap_ci(spark, SF).collect()}
    assert {k: (v.boot_mean, v.ci_lo, v.ci_hi) for k, v in out1.items()} == {
        k: (v.boot_mean, v.ci_lo, v.ci_hi) for k, v in out2.items()
    }
