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


def test_snapshot_diff_boundary_shift_and_null_sentinel_are_unambiguous(spark):
    # Values containing a would-be separator must not shift column
    # boundaries, and NULL must differ from ANY literal string.
    old = spark.createDataFrame([(1, "a|#|b", "c"), (2, None, "z")], "k long, x string, y string")
    new = spark.createDataFrame([(1, "a", "b|#|c"), (2, "<null>", "z")], "k long, x string, y string")
    got = {r["k"]: r["status"] for r in relational.snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_snapshot_diff_explicit_compare_cols_ignore_others(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double")
    new = spark.createDataFrame([(1, "a", 999.0)], "k long, s string, v double")
    [r] = relational.snapshot_diff(old, new, ["k"], compare_cols=["s"]).collect()
    assert r["status"] == "unchanged"


# --- property tests --------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(
    old_keys=st.sets(st.integers(min_value=0, max_value=50), max_size=20),
    new_keys=st.sets(st.integers(min_value=0, max_value=50), max_size=20),
    changed=st.sets(st.integers(min_value=0, max_value=50), max_size=10),
)
def test_snapshot_diff_partitions_key_universe(spark, old_keys, new_keys, changed):
    """added/removed/changed/unchanged exactly partition old ∪ new, and
    counts match the set algebra."""
    old = spark.createDataFrame([(k, "v") for k in old_keys] or [(None, None)],
                                "k long, s string").filter(F.col("k").isNotNull())
    new = spark.createDataFrame(
        [(k, "w" if k in changed else "v") for k in new_keys] or [(None, None)],
        "k long, s string").filter(F.col("k").isNotNull())
    got = {r["k"]: r["status"] for r in relational.snapshot_diff(old, new, ["k"]).collect()}
    assert set(got) == old_keys | new_keys
    assert {k for k, s in got.items() if s == "added"} == new_keys - old_keys
    assert {k for k, s in got.items() if s == "removed"} == old_keys - new_keys
    assert {k for k, s in got.items() if s == "changed"} == (old_keys & new_keys & changed)


def test_snapshot_diff_self_is_all_unchanged(spark):
    df = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    statuses = {r["status"] for r in relational.snapshot_diff(df, df, ["k"]).collect()}
    assert statuses == {"unchanged"}


def test_apply_changes_merge_semantics(spark):
    """MERGE: 'U' updates matched rows, unmatched 'U' inserts (base-only
    columns null), 'D' deletes, untouched rows pass through, and a null
    change value coalesces back to the base value."""
    from pyspark.sql import functions as F

    from big_data_hdfs_ray_vs_spark_spark.operators.relational import apply_changes

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    changes = spark.createDataFrame(
        [(2, "U", 99.0), (3, "D", None), (4, "U", 40.0), (1, "U", None)],
        "k long, op string, bal double",
    )
    got = {r["k"]: r for r in apply_changes(base, changes, key="k").collect()}
    assert set(got) == {1, 2, 4}          # 3 deleted, 4 inserted
    assert got[2]["bal"] == 99.0          # updated
    assert got[1]["bal"] == 10.0          # null change coalesces to base
    assert got[4]["name"] is None and got[4]["bal"] == 40.0  # insert
    assert got[2]["name"] == "b"          # base-only column preserved


def test_apply_changes_rejects_unknown_columns(spark):
    import pytest

    from big_data_hdfs_ray_vs_spark_spark.operators.relational import apply_changes

    base = spark.createDataFrame([(1, 1.0)], "k long, bal double")
    changes = spark.createDataFrame([(1, "U", 5)], "k long, op string, nope int")
    with pytest.raises(ValueError, match="nope"):
        apply_changes(base, changes, key="k")
