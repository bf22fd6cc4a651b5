"""KMV distinct-count sketch: exactness below k, estimator accuracy
above k, layout independence, and the k>=2 guard."""

import pytest
from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import sketches


@pytest.fixture(scope="module")
def keyed(spark):
    # group 'small' has 10 distinct keys (< k), 'big' has 2000 (> k).
    rows = [("small", i % 10) for i in range(100)] + [("big", i) for i in range(2000)]
    return spark.createDataFrame(rows, "grp string, key long")


def test_exact_below_k(keyed):
    out = {
        r["grp"]: r["est_distinct"]
        for r in sketches.kmv_distinct(keyed, "key", ["grp"], k=64).collect()
    }
    assert out["small"] == 10  # sketch holds every hash -> exact


def test_estimate_within_error_bound(keyed):
    out = {
        r["grp"]: r["est_distinct"]
        for r in sketches.kmv_distinct(keyed, "key", ["grp"], k=64).collect()
    }
    # standard error ~ 1/sqrt(k-2) = 12.7%; allow 4 sigma.
    assert abs(out["big"] - 2000) / 2000 < 0.5


def test_layout_independent(keyed):
    a = sketches.kmv_distinct(keyed, "key", ["grp"], k=32).collect()
    b = sketches.kmv_distinct(keyed.repartition(13, "key"), "key", ["grp"], k=32).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_duplicates_do_not_inflate(spark):
    # 50 distinct keys, each repeated 40x: distinct-hash pass must
    # collapse repeats before the bottom-k.
    df = spark.createDataFrame([("g", i % 50) for i in range(2000)], "grp string, key long")
    [r] = sketches.kmv_distinct(df, "key", ["grp"], k=64).collect()
    assert r["est_distinct"] == 50


def test_k_guard(keyed):
    with pytest.raises(ValueError):
        sketches.kmv_distinct(keyed, "key", ["grp"], k=1)


def test_builtin_approx_variants_within_bounds(spark):
    """The 100 TB hot-path variants the exact queries document
    (q36/q46): approx_count_distinct (HLL++) and approx_percentile
    (t-digest) — not oracle-comparable across engines, but their error
    bounds against the exact answers are pinned here."""
    df = spark.range(20_000).select(
        (F.col("id") % 5000).alias("key"), (F.col("id") % 997).cast("double").alias("v")
    )
    row = df.agg(
        F.approx_count_distinct("key", rsd=0.02).alias("approx_d"),
        F.count_distinct("key").alias("exact_d"),
        F.percentile_approx("v", 0.95, 10_000).alias("approx_p95"),
        F.percentile("v", F.lit(0.95)).alias("exact_p95"),
    ).first()
    assert abs(row["approx_d"] - row["exact_d"]) / row["exact_d"] < 0.06  # 3x rsd
    assert abs(row["approx_p95"] - row["exact_p95"]) <= 1.0  # adjacent value at worst


# --- histogram quantiles ---------------------------------------------------


def test_histogram_quantiles_vs_exact_within_bin_width(spark):
    """Estimates land within one bin width of the exact nearest-rank
    percentile, and are exact for values aligned to bin edges."""
    df = spark.range(1000).select(
        F.lit("g").alias("grp"), (F.col("id") % 100).cast("double").alias("v")
    )
    [r] = sketches.histogram_quantiles(
        df, "v", ["grp"], quantiles=(0.5, 0.9), lo=0.0, hi=100.0, n_bins=100
    ).collect()
    assert r["n"] == 1000
    # v uniform over 0..99, width 1: p50 bin holds value 49 -> edge 50
    assert r["p50"] == 50.0
    assert r["p90"] == 90.0


def test_histogram_quantiles_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [("g", -5.0), ("g", 1e9), ("g", 3.0)], "grp string, v double"
    )
    [r] = sketches.histogram_quantiles(
        df, "v", ["grp"], quantiles=(0.5,), lo=0.0, hi=10.0, n_bins=10
    ).collect()
    # -5 clamps into bin 0, 1e9 into bin 9; median value 3 -> bin 3 edge
    assert r["n"] == 3 and r["p50"] == 4.0


def test_histogram_quantiles_mergeable(spark):
    """Sketching two shards and summing counts equals sketching the
    union — counts are the state, so this reduces to the same frame."""
    a = spark.range(500).select(F.lit("g").alias("grp"), (F.col("id") % 50).cast("double").alias("v"))
    b = spark.range(500).select(F.lit("g").alias("grp"), ((F.col("id") % 50) + 25).cast("double").alias("v"))
    merged = sketches.histogram_quantiles(a.union(b), "v", ["grp"], (0.5,), 0.0, 100.0, 100)
    assert merged.first()["n"] == 1000


# --- count-min sketch ------------------------------------------------------


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    df = spark.createDataFrame(
        [(k,) for k in [1] * 50 + [2] * 30 + [3] * 20 + list(range(100, 120))],
        "key long",
    )
    counters = sketches.cms_counters(df, "key", width=4096, depth=3)
    keys = df.select("key").distinct()
    true = {r["key"]: r["c"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("c")).collect()}
    est = {r["key"]: r["est_count"] for r in
           sketches.cms_estimate(counters, keys, "key", width=4096, depth=3).collect()}
    for k, t in true.items():
        assert est[k] >= t  # overestimate invariant
    # 23 distinct keys in 4096 buckets: collisions ~0, estimates exact
    assert est == true


def test_cms_overestimates_under_collisions(spark):
    df = spark.range(2000).select((F.col("id") % 500).alias("key"))  # 500 keys, 4 each
    counters = sketches.cms_counters(df, "key", width=64, depth=2)
    est = sketches.cms_estimate(
        counters, df.select("key").distinct(), "key", width=64, depth=2
    )
    rows = est.collect()
    assert all(r["est_count"] >= 4 for r in rows)          # never under
    assert any(r["est_count"] > 4 for r in rows)           # 500 keys / 64 buckets must collide


def test_merge_moments_equals_direct_pass(spark):
    from pyspark.sql import functions as F

    from big_data_hdfs_ray_vs_spark_spark.operators.sketches import (
        merge_moments,
        moments_partials,
    )

    rows = [("a", d, float(v)) for d in range(5) for v in range(d, d + 7)] + [
        ("b", 0, 3.0),
        ("b", 1, 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, day int, v double")
    merged = {
        r["k"]: (r["n"], r["mean"], r["var_samp"])
        for r in merge_moments(moments_partials(df, ["k", "day"], "v"), "k").collect()
    }
    direct = {
        r["k"]: (r["n"], r["mean"], r["var_samp"])
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.var_samp("v"), 6).alias("var_samp"),
        )
        .collect()
    }
    assert merged == direct


def test_hll_estimate_within_error_bound(spark):
    """256 registers -> standard error 6.5%; allow 3 sigma."""
    df = spark.range(0, 20000).select(F.col("id").alias("k"))
    est = sketches.hll_estimate(sketches.hll_registers(df, "k")).first()["est"]
    assert abs(est - 20000) / 20000 < 3 * 1.04 / (sketches.HLL_M**0.5)


def test_hll_registers_merge_equals_whole(spark):
    """The point of defined registers: per-slice sketches max-merge to
    the whole-corpus sketch exactly."""
    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    whole = sketches.hll_registers(df, "k")
    parts = [
        sketches.hll_registers(df.filter(f"k % 3 = {i}"), "k") for i in range(3)
    ]
    merged = (
        parts[0].union(parts[1]).union(parts[2])
        .groupBy("bucket").agg(F.max("r").alias("r"))
    )
    assert sorted(merged.collect()) == sorted(whole.collect())
    # and the estimate is therefore identical too
    a = sketches.hll_estimate(merged).first()
    b = sketches.hll_estimate(whole).first()
    assert a == b


def test_hll_duplicates_and_nulls_do_not_count(spark):
    base = spark.range(0, 1000).select(F.col("id").alias("k"))
    dup = base.union(base).union(spark.sql("SELECT CAST(NULL AS LONG) AS k"))
    r1 = sketches.hll_estimate(sketches.hll_registers(base, "k")).first()
    r2 = sketches.hll_estimate(sketches.hll_registers(dup, "k")).first()
    assert r1 == r2


def test_hll_rho_matches_oracle_sql_on_boundaries(spark):
    """The Spark when-chain and the oracle CASE chain agree at every
    power-of-two boundary (the only places an off-by-one could hide)."""
    import duckdb

    from big_data_hdfs_ray_vs_spark_spark.oracles import _hll_sql

    w_bits = sketches.HLL_W_BITS
    ws = [0, 1] + [v for k in range(1, w_bits) for v in ((1 << k) - 1, 1 << k)]
    sdf = spark.createDataFrame([(w,) for w in ws], "w long")
    got = {
        r["w"]: r["rho"]
        for r in sdf.select("w", sketches._hll_rho(F.col("w")).alias("rho")).collect()
    }
    # reference: rho = (w_bits - bit_length(w)) + 1, w=0 -> w_bits+1
    want = {w: (w_bits - w.bit_length() + 1) for w in ws}
    assert got == want
    cases_sql = _hll_sql("o_custkey", "orders")
    case = cases_sql[cases_sql.index("CASE") : cases_sql.index("END") + 3]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(w,) for w in ws])
    duck = dict(con.execute(f"SELECT w, {case} FROM t").fetchall())
    assert duck == want


def test_hll_grouped_matches_independent_sketches(spark):
    """Grouped registers/estimate == running the global sketch on each
    group's slice independently."""
    df = spark.range(0, 3000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("k")
    )
    grouped = {
        r["g"]: (r["used"], r["s_int"], r["est"])
        for r in sketches.hll_estimate(
            sketches.hll_registers(df, "k", group_cols=["g"]), group_cols=["g"]
        ).collect()
    }
    for g in ("0", "1", "2"):
        solo = sketches.hll_estimate(
            sketches.hll_registers(df.filter(F.col("g") == g), "k")
        ).first()
        assert grouped[g] == (solo["used"], solo["s_int"], solo["est"]), g
