"""SCD2 history build, grid resample + forward fill, and transition
matrix: closed-form fixtures covering collapse, interval chaining,
equal-ts ties, epoch-aligned grids and probability normalization."""

from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import temporal


def test_scd2_collapses_noop_changes_and_chains_intervals(spark):
    rows = [
        # user 1: a → a (no-op) → b → b (no-op) → a
        (1, 10, 100, "a"),
        (1, 20, 101, "a"),
        (1, 30, 102, "b"),
        (1, 40, 103, "b"),
        (1, 50, 104, "a"),
        # user 2: single state
        (2, 5, 200, "x"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, cid long, s string")
    out = temporal.scd2_history(df, key="user_id", ts="ts", value_cols=["s"], tiebreak="cid")
    got = {
        (r["user_id"], r["version"]): (r["s"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }
    assert got == {
        (1, 1): ("a", 10, 30, False),
        (1, 2): ("b", 30, 50, False),
        (1, 3): ("a", 50, None, True),
        (2, 1): ("x", 5, None, True),
    }


def test_scd2_equal_ts_last_tiebreak_wins(spark):
    rows = [(1, 10, 1, "a"), (1, 10, 2, "b"), (1, 20, 3, "c")]
    df = spark.createDataFrame(rows, "user_id long, ts long, cid long, s string")
    out = temporal.scd2_history(df, key="user_id", ts="ts", value_cols=["s"], tiebreak="cid")
    got = sorted((r["version"], r["s"]) for r in out.collect())
    # At ts=10 only cid=2 ("b") survives; "a" never had an interval.
    assert got == [(1, "b"), (2, "c")]


def test_scd2_null_values_are_transitions(spark):
    rows = [(1, 10, 1, "a"), (1, 20, 2, None), (1, 30, 3, None), (1, 40, 4, "a")]
    df = spark.createDataFrame(rows, "user_id long, ts long, cid long, s string")
    out = temporal.scd2_history(df, key="user_id", ts="ts", value_cols=["s"], tiebreak="cid")
    got = sorted((r["version"], r["s"]) for r in out.collect())
    # null is a real state: a → null (consecutive nulls collapse) → a.
    assert got == [(1, "a"), (2, None), (3, "a")]


def test_resample_ffill_grid_and_carry(spark):
    rows = [
        # key a: obs at 12 and 25 → grid ticks 10, 20 (step 10)
        ("a", 12, 1, 1.5),
        ("a", 25, 2, 2.5),
        # key b: single obs ON a tick
        ("b", 30, 3, 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, t long, eid long, v double")
    out = temporal.resample_ffill(df, key="k", ts="t", value="v", step=10, tiebreak="eid")
    got = {(r["k"], r["grid_ts"]): (r["v"], r["obs_ts"]) for r in out.collect()}
    assert got == {
        ("a", 10): (None, None),  # tick before the first obs: nothing to carry
        ("a", 20): (1.5, 12),
        ("b", 30): (9.0, 30),  # obs on the tick is visible to it
    }


def test_resample_ffill_equal_ts_tiebreak(spark):
    rows = [("a", 10, 1, 1.0), ("a", 10, 2, 2.0)]
    df = spark.createDataFrame(rows, "k string, t long, eid long, v double")
    out = temporal.resample_ffill(df, key="k", ts="t", value="v", step=10, tiebreak="eid")
    got = {r["grid_ts"]: r["v"] for r in out.collect()}
    assert got == {10: 2.0}  # greatest tiebreak wins


def test_transition_counts_probabilities(spark):
    rows = [
        (1, 10, 1, "a"),
        (1, 20, 2, "b"),
        (1, 30, 3, "a"),
        (1, 40, 4, "b"),
        (2, 10, 5, "a"),
        (2, 20, 6, "a"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, eid long, s string")
    out = temporal.transition_counts(df, key="user_id", ts="ts", state="s", tiebreak="eid")
    got = {(r["prev_state"], r["next_state"]): (r["n"], r["p"]) for r in out.collect()}
    # From 'a': a→b twice (user 1), a→a once (user 2) → p = 2/3, 1/3.
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "a"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_gaps_islands_runs(spark):
    from big_data_hdfs_ray_vs_spark_spark.queries import q90_gaps_islands  # noqa: F401
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # Inline the island logic on a fixture: days {1,2,3, 7, 9,10}.
    df = spark.createDataFrame(
        [(1, d) for d in (1, 2, 3, 7, 9, 10)], "user_id long, day long"
    )
    w = Window.partitionBy("user_id").orderBy("day")
    runs = (
        df.withColumn("grp", F.col("day") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    got = sorted(r["run_len"] for r in runs.collect())
    assert got == [1, 2, 3]
