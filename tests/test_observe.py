"""Observation-API metrics (operators/observe.py): values arrive with
the caller's own action, no extra job."""

from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators.observe import (
    observed,
    row_quality_metrics,
)


def test_observed_metrics_ride_the_action(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id long, v string"
    )
    obs_df, obs = observed(df, row_quality_metrics(["v"]))
    # the caller's OWN action (a write-shaped full consumption)
    assert obs_df.count() == 4
    got = obs.get
    assert got["n_rows"] == 4
    assert got["null_v"] == 2


def test_observed_composes_with_downstream_transforms(spark):
    """Metrics observe the point-in-plan where they are attached, even
    when the action runs on a derived frame."""
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    obs_df, obs = observed(df, {"n_in": F.count(F.lit(1))})
    filtered = obs_df.filter(F.col("x") >= 10)
    assert filtered.count() == 5   # downstream sees filtered rows
    assert obs.get["n_in"] == 10   # observation saw the pre-filter flow
