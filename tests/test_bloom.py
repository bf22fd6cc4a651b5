"""Bloom-filter join pruning: no-false-negative invariant (exhaustive
and property-based), FP rate sanity at textbook sizing, plan shape
(the probe must be a shuffle-free codegen filter)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import relational as R


def _keys_df(spark, keys, col="k"):
    return spark.createDataFrame([(int(x),) for x in keys], f"{col} long")


def test_no_false_negatives_exhaustive(spark):
    dim = list(range(0, 200, 3))
    words = R.bloom_build(_keys_df(spark, dim), "k", num_bits=1024, num_hashes=4)
    fact = _keys_df(spark, range(200))
    passed = {
        r["k"] for r in R.bloom_prune(fact, "k", words, num_hashes=4).collect()
    }
    assert set(dim) <= passed  # every true key admitted
    assert passed <= set(range(200))


def test_portable_and_native_agree_on_membership_guarantee(spark):
    dim = [5, 17, 99, 12345, 7_000_000_000]
    fact = _keys_df(spark, dim + [2, 4, 6, 1000])
    for portable in (False, True):
        words = R.bloom_build(
            _keys_df(spark, dim), "k", num_bits=512, num_hashes=3, portable=portable
        )
        passed = {
            r["k"]
            for r in R.bloom_prune(fact, "k", words, num_hashes=3, portable=portable).collect()
        }
        assert set(dim) <= passed


def test_fp_rate_near_textbook(spark):
    n = 500
    num_bits, num_hashes = R.bloom_parameters(n, fpp=0.01)
    dim = list(range(n))
    words = R.bloom_build(_keys_df(spark, dim), "k", num_bits, num_hashes)
    probe_keys = list(range(10_000, 15_000))  # disjoint from dim
    fact = _keys_df(spark, probe_keys)
    fp = R.bloom_prune(fact, "k", words, num_hashes).count()
    assert fp / len(probe_keys) < 0.05  # 5x headroom over the 1% target


def test_parameters_monotone():
    m1, _ = R.bloom_parameters(1_000, 0.01)
    m2, _ = R.bloom_parameters(10_000, 0.01)
    m3, _ = R.bloom_parameters(10_000, 0.001)
    assert m1 < m2 < m3
    assert m1 % 64 == m2 % 64 == m3 % 64 == 0


def test_probe_plan_is_shuffle_free(spark):
    dim = list(range(50))
    words = R.bloom_build(_keys_df(spark, dim), "k", num_bits=512, num_hashes=4)
    plan = R.bloom_prune(
        _keys_df(spark, range(100)), "k", words, num_hashes=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


@settings(max_examples=15, deadline=None)
@given(
    dim=st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40),
    extra=st.sets(st.integers(min_value=0, max_value=10**12), max_size=40),
)
def test_membership_property(spark, dim, extra):
    words = R.bloom_build(_keys_df(spark, dim), "k", num_bits=256, num_hashes=2)
    fact = _keys_df(spark, sorted(dim | extra))
    passed = {r["k"] for r in R.bloom_prune(fact, "k", words, num_hashes=2).collect()}
    assert dim <= passed
