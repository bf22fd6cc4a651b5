"""Column profiler and robust (median/MAD) outlier stats: closed-form
fixtures where every statistic is hand-computable."""

from big_data_hdfs_ray_vs_spark_spark.operators import profile


def test_profile_columns_one_pass(spark):
    rows = [
        (1, "aa", 10.0),
        (2, "bbbb", None),
        (3, None, 30.0),
        (3, "aa", 40.0),
    ]
    df = spark.createDataFrame(rows, "id long, s string, x double")
    out = {r["column"]: r for r in profile.profile_columns(df).collect()}
    assert set(out) == {"id", "s", "x"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert (out["id"]["n_null"], out["id"]["n_distinct"]) == (0, 3)
    assert (out["id"]["min_value"], out["id"]["max_value"]) == ("1", "3")
    assert out["id"]["avg_len"] is None
    assert (out["s"]["n_null"], out["s"]["n_distinct"]) == (1, 2)
    assert out["s"]["avg_len"] == round((2 + 4 + 2) / 3, 6)
    assert (out["x"]["n_null"], out["x"]["min_value"]) == (1, "10.0")


def test_robust_outlier_stats_flags_far_point(spark):
    # Group g: values 1..5 plus a 1000.0 outlier. median=3.5, residuals
    # {2.5,1.5,0.5,0.5,1.5,996.5} → MAD=1.5; only 1000 crosses z=3.5.
    rows = [("g", float(v)) for v in (1, 2, 3, 4, 5)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = profile.robust_outlier_stats(df, group="k", value="v", z=3.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["median_value"], r["mad"], r["n_outliers"]) == (6, 3.5, 1.5, 1)


def test_robust_outlier_constant_group_no_div_by_zero(spark):
    df = spark.createDataFrame([("g", 7.0)] * 4, "k string, v double")
    r = profile.robust_outlier_stats(df, group="k", value="v").collect()[0]
    assert (r["mad"], r["n_outliers"]) == (0.0, 0)


def test_equidepth_bins_exact_quartiles(spark):
    rows = [("g", float(v), v) for v in range(1, 9)]  # 1..8 → 4 bins of 2
    df = spark.createDataFrame(rows, "k string, v double, tb long")
    out = {r["bin"]: (r["n"], r["lo"], r["hi"])
           for r in profile.equidepth_bins(df, "v", k=4, group="k", tiebreak="tb").collect()}
    assert out == {1: (2, 1.0, 2.0), 2: (2, 3.0, 4.0), 3: (2, 5.0, 6.0), 4: (2, 7.0, 8.0)}


def test_grouped_trend_exact_line(spark):
    # y = 2x + 1 exactly → slope 2, intercept 1, r2 = 1.
    rows = [("g", float(x), 2.0 * x + 1.0) for x in range(10)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = profile.grouped_trend(df, group="k", x="x", y="y").collect()[0]
    assert (r["n"], r["slope"], r["intercept"], r["r2"]) == (10, 2.0, 1.0, 1.0)


def test_psi_drift_zero_for_identical_and_positive_for_shifted(spark):
    from pyspark.sql import functions as F

    same = [("g", float(v % 10) * 10, s) for v in range(100) for s in (0, 1)]
    df = spark.createDataFrame(same, "k string, v double, s int")
    r = profile.psi_drift(
        df, value="v", split=F.col("s") == 1, lo=0.0, hi=100.0, bins=10, group="k"
    ).collect()[0]
    assert r["psi"] == 0.0
    # Shift the current side entirely into the top half.
    shifted = [("g", 10.0, 1)] * 50 + [("g", 90.0, 0)] * 50
    df2 = spark.createDataFrame(shifted, "k string, v double, s int")
    r2 = profile.psi_drift(
        df2, value="v", split=F.col("s") == 1, lo=0.0, hi=100.0, bins=10, group="k"
    ).collect()[0]
    assert r2["psi"] > 1.0


def test_ab_test_welch_closed_form(spark):
    from pyspark.sql import functions as F

    rows = [("g", 1.0, 0), ("g", 2.0, 0), ("g", 3.0, 0), ("g", 4.0, 1), ("g", 6.0, 1)]
    df = spark.createDataFrame(rows, "k string, v double, arm int")
    r = profile.ab_test_welch(df, group="k", value="v", split=F.col("arm") == 0).collect()[0]
    # A=[1,2,3]: n=3, mean=2, var=1; B=[4,6]: n=2, mean=5, var=2.
    # se2=4/3 → t=-3/sqrt(4/3)=-2.5981; dof=(4/3)^2/((1/9)/2+4/1)... see op
    assert (r["n_a"], r["n_b"], r["mean_a"], r["mean_b"]) == (3, 2, 2.0, 5.0)
    assert r["t_stat"] == -2.5981
    import math
    se2 = 1 / 3 + 2 / 2
    dof = se2**2 / ((1 / 3) ** 2 / 2 + (2 / 2) ** 2 / 1)
    assert r["dof"] == round(dof, 4)


def test_ecdf_transform_hand_computed(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.profile import ecdf_transform

    rows = [
        (1, "a", 1.0),
        (2, "a", 2.0),
        (3, "b", 2.0),
        (4, "b", 4.0),
        (5, "b", None),  # excluded
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r.id: r for r in ecdf_transform(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    # global over 4 obs: 1.0→.25, 2.0→.75 (tie mass), 4.0→1.0
    assert out[1].ecdf_global == 0.25
    assert out[2].ecdf_global == 0.75 and out[3].ecdf_global == 0.75
    assert out[4].ecdf_global == 1.0
    # within groups: a={1,2} → .5, 1.0 ; b={2,4} → .5, 1.0
    assert out[1].ecdf_group == 0.5 and out[2].ecdf_group == 1.0
    assert out[3].ecdf_group == 0.5 and out[4].ecdf_group == 1.0


def test_embedding_dim_profile_hand_fixture(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.profile import (
        embedding_dim_profile,
    )

    # dim1: [1,3] -> mean 2, var_pop 1, std 1; dim2: [0,0] all zero
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [3.0, 0.0]), (3, None)],
        "vec_id long, embedding array<float>",
    )
    got = {r.dim: r for r in embedding_dim_profile(df).collect()}
    assert set(got) == {1, 2}
    assert (got[1].n, got[1].mean, got[1].std) == (2, 2.0, 1.0)
    assert (got[1].min_x, got[1].max_x, got[1].zero_frac) == (1.0, 3.0, 0.0)
    assert (got[2].mean, got[2].std, got[2].zero_frac) == (0.0, 0.0, 1.0)


def test_embedding_dim_profile_ragged_dims(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.profile import (
        embedding_dim_profile,
    )

    df = spark.createDataFrame(
        [(1, [2.0]), (2, [4.0, 6.0])], "vec_id long, embedding array<float>"
    )
    got = {r.dim: (r.n, r.mean) for r in embedding_dim_profile(df).collect()}
    assert got == {1: (2, 3.0), 2: (1, 6.0)}
