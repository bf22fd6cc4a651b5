"""cap_per_group determinism/monotonicity and snapshot_diff statuses."""

from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import relational, sampling


def _docs(spark, n=200, sources=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % sources).cast("string")).alias("source"),
    )


def test_cap_per_group_respects_cap_and_is_layout_independent(spark):
    docs = _docs(spark)
    capped = sampling.cap_per_group(docs, "source", cap=10)
    per = {r["source"]: r["n"] for r in
           capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v == 10 for v in per.values())
    # same rows under a different physical layout
    reshuffled = sampling.cap_per_group(docs.repartition(7, "doc_id"), "source", cap=10)
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in reshuffled.collect()
    )


def test_cap_per_group_is_monotone_in_cap(spark):
    docs = _docs(spark)
    small = {r["doc_id"] for r in sampling.cap_per_group(docs, "source", cap=5).collect()}
    big = {r["doc_id"] for r in sampling.cap_per_group(docs, "source", cap=15).collect()}
    assert small <= big  # raising the cap only adds rows


def test_cap_per_group_small_groups_survive_whole(spark):
    docs = _docs(spark, n=8, sources=4)  # 2 docs per source < cap
    assert sampling.cap_per_group(docs, "source", cap=10).count() == 8


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["status"] for r in relational.snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_vs_empty_string_differ(spark):
    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([(1, "")], "k long, s string")
    [r] = relational.snapshot_diff(old, new, ["k"]).collect()
    assert r["status"] == "changed"


def test_snapshot_diff_explicit_compare_cols_ignore_others(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double")
    new = spark.createDataFrame([(1, "a", 999.0)], "k long, s string, v double")
    [r] = relational.snapshot_diff(old, new, ["k"], compare_cols=["s"]).collect()
    assert r["status"] == "unchanged"
