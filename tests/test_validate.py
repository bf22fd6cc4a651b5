"""Declarative data-quality validation: rule compilation, violation
counts, and the one-aggregate-pass plan shape."""

from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import validate as V


def _df(spark):
    rows = [
        (1, 1, 10.0, "A", "x@y.com"),
        (2, 1, 200.0, "B", "bad"),      # out of range, bad flag, bad email
        (2, 1, 30.0, "N", "a@b.org"),   # duplicate (2,1) key
        (3, None, 40.0, "R", None),     # null qty (null doesn't violate range)
    ]
    return spark.createDataFrame(rows, "k long, sub long, price double, flag string, email string")


def test_rules_count_violations(spark):
    out = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in V.validate(
            _df(spark),
            [
                V.not_null("sub"),
                V.in_range("price", 0, 100),
                V.accepted_values("flag", ["A", "N", "R"]),
                V.matches_regex("email", r"^[^@]+@[^@]+\.[^@]+$"),
                V.unique(["k", "sub"]),
            ],
        ).collect()
    }
    assert out["not_null:sub"] == (1, False)
    assert out["in_range:price"] == (1, False)          # nulls don't violate range
    assert out["accepted_values:flag"] == (1, False)
    assert out["matches_regex:email"] == (1, False)     # null email doesn't violate
    assert out["unique:k,sub"][0] == 1                  # one duplicate beyond first


def test_all_green_on_clean_data(spark):
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") % 10).alias("v"))
    out = V.validate(df, [V.not_null("k"), V.in_range("v", 0, 9), V.unique(["k"])])
    assert all(r["passed"] for r in out.collect())


def test_predicate_rules_share_one_aggregate(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    plan = V.validate(
        df, [V.not_null("k"), V.in_range("k", 0, 100)]
    )._jdf.queryExecution().optimizedPlan().toString()
    # both rules compile into a single Aggregate over a single scan
    assert plan.count("Aggregate") == 1


# ------------------------------------------------------ fk_audit (q137)
def test_fk_audit_hand_fixture(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.validate import fk_audit

    child = spark.createDataFrame(
        [(1,), (2,), (3,), (None,)], "k bigint"
    )
    parent = spark.createDataFrame([(1,), (1,), (2,)], "p bigint")
    rows = fk_audit([("c_to_p", child, "k", parent, "p")]).collect()
    assert len(rows) == 1
    r = rows[0]
    # null child key is not a reference; key 3 is the only orphan
    assert (r.relationship, r.n_child, r.n_orphans) == ("c_to_p", 3, 1)
    assert r.orphan_rate == round(1 / 3, 6)


def test_fk_audit_multiple_relationships_and_empty_child(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.validate import fk_audit

    child = spark.createDataFrame([(1,)], "k bigint")
    empty = child.filter("k < 0")
    parent = spark.createDataFrame([(9,)], "p bigint")
    rows = fk_audit(
        [("all_orphans", child, "k", parent, "p"), ("empty", empty, "k", parent, "p")]
    ).collect()
    got = {r.relationship: (r.n_child, r.n_orphans, r.orphan_rate) for r in rows}
    assert got["all_orphans"] == (1, 1, 1.0)
    assert got["empty"] == (0, 0, 0.0)  # 0/0 reads 0.0, never NULL/NaN


# -------------------------------------------------- join_advisor (q138)
def test_join_advisor_strategies(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.relational import join_advisor

    big_uniform = spark.createDataFrame(
        [((i % 50),) for i in range(200)], "k bigint"
    )
    big_skewed = spark.createDataFrame(
        [(0,)] * 150 + [(i,) for i in range(1, 51)], "k bigint"
    )
    small = spark.createDataFrame([(i,) for i in range(5)], "k bigint")
    rows = join_advisor(
        [
            ("dim_right", big_uniform, "k", small, "k"),
            ("dim_left", small, "k", big_uniform, "k"),
            ("skewed", big_skewed, "k", big_uniform, "k"),
            ("spread", big_uniform, "k", big_uniform, "k"),
        ],
        broadcast_rows=10,
        skew_share=0.2,
    ).collect()
    got = {r.join_name: r.strategy for r in rows}
    assert got == {
        "dim_right": "broadcast_right",
        "dim_left": "broadcast_left",
        "skewed": "salted_shuffle",
        "spread": "shuffle_hash",
    }
    # both sides fit the budget → broadcast the SMALLER one (tie → right)
    tiny = spark.createDataFrame([(1,)], "k bigint")
    both = join_advisor(
        [("small_big", tiny, "k", small, "k"), ("big_small", small, "k", tiny, "k"),
         ("tie", tiny, "k", tiny, "k")],
        broadcast_rows=10,
    ).collect()
    got2 = {r.join_name: r.strategy for r in both}
    assert got2 == {
        "small_big": "broadcast_left",
        "big_small": "broadcast_right",
        "tie": "broadcast_right",
    }
    shares = {r.join_name: (r.left_max_share, r.right_max_share) for r in rows}
    assert shares["skewed"][0] == 0.75  # 150/200
    assert shares["spread"] == (round(4 / 200, 6), round(4 / 200, 6))


def test_join_advisor_null_keys_excluded_and_empty_side(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.relational import join_advisor

    left = spark.createDataFrame([(1,), (None,), (2,)], "k bigint")
    empty = left.filter("k < 0")
    r = join_advisor([("rel", left, "k", empty, "k")], broadcast_rows=10).first()
    # empty right side: 0 rows, share 0.0, still broadcastable
    assert (r.left_rows, r.right_rows) == (2, 0)
    assert (r.left_max_share, r.right_max_share) == (0.5, 0.0)
    assert r.strategy == "broadcast_right"


def test_join_advisor_batched_one_scan_per_table(spark):
    # r5-verdict ask: N relationships over the same tables must not
    # rescan them N times. The batched stats pass reads each DISTINCT
    # table exactly once (one scan node per table in its plan even
    # though tables repeat across relationships/keys); the advisor
    # output itself is literal rows — zero scans, zero cached tables
    # left behind (the r6-advisor persist-leak note).
    import re

    from big_data_hdfs_ray_vs_spark_spark.operators.relational import (
        _advisor_stats,
        join_advisor,
    )
    from big_data_hdfs_ray_vs_spark_spark.sources import load_table
    from big_data_hdfs_ray_vs_spark_spark.sources.layout import physical_plan

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    rels = [
        ("a", li, "l_orderkey", orders, "o_orderkey"),
        ("b", li, "l_partkey", orders, "o_custkey"),
        ("c", orders, "o_custkey", cust, "c_custkey"),
    ]
    tables = {}
    for _n, left, lk, right, rk in rels:
        for df, key in ((left, lk), (right, rk)):
            tables.setdefault(id(df), (df, set()))[1].add(key)
    tags = {tid: f"t{i}" for i, tid in enumerate(tables)}
    stats_plan = physical_plan(_advisor_stats(tables, tags))
    scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", stats_plan))
    assert len(scan_ids) == 3  # one per distinct table, not per use
    n_cached_before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    out = join_advisor(rels)
    assert "Scan parquet" not in physical_plan(out)  # literal rows only
    assert out.count() == 3
    # no persisted frames accumulate across advisor calls
    join_advisor(rels).count()
    assert (
        len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) == n_cached_before
    )
