"""Temporal joins: as-of semantics (boundaries, ties, directions) and
binned range-join equivalence with a brute-force inequality join."""

import pytest
from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import temporal


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, quote_id, px) — the classic trades/quotes shape.
    rows = [
        ("a", 10, 1, 1.0),
        ("a", 20, 2, 2.0),
        ("a", 20, 3, 3.0),  # tie at ts=20 with quote_id 2
        ("a", 40, 4, 4.0),
        ("b", 15, 5, 5.0),
    ]
    return spark.createDataFrame(rows, "k string, ts long, quote_id long, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("a", 5, 100),  # before any quote
        ("a", 20, 101),  # exactly at the tied quotes
        ("a", 25, 102),
        ("b", 99, 103),
        ("c", 50, 104),  # key with no quotes at all
    ]
    return spark.createDataFrame(rows, "k string, ts long, trade_id long")


def _asof(trades, quotes, direction):
    out = temporal.asof_join(
        trades,
        quotes.select("k", "ts", "quote_id", F.col("px").alias("last_px")),
        on="k",
        ts="ts",
        tiebreak="quote_id",
        direction=direction,
    )
    return {r["trade_id"]: r["last_px"] for r in out.collect()}


def test_asof_backward(trades, quotes):
    got = _asof(trades, quotes, "backward")
    # t=5: no quote at-or-before -> NULL; t=20: tie broken by max
    # quote_id (3); t=25: latest is the tie pair, again id 3.
    assert got == {100: None, 101: 3.0, 102: 3.0, 103: 5.0, 104: None}


def test_asof_forward(trades, quotes):
    got = _asof(trades, quotes, "forward")
    # Forward: earliest quote at-or-after; tie broken by MIN quote_id.
    assert got == {100: 1.0, 101: 2.0, 102: 4.0, 103: None, 104: None}


def test_asof_preserves_left_rowcount(trades, quotes):
    out = temporal.asof_join(
        trades,
        quotes.select("k", "ts", "quote_id", F.col("px").alias("last_px")),
        on="k",
        tiebreak="quote_id",
    )
    assert out.count() == trades.count()
    assert out.columns == ["k", "ts", "trade_id", "last_px"]


def test_asof_attaches_one_row_not_a_column_stitch(spark):
    # The latest right row carries a NULL field; the match must be THAT
    # row (px=None, qty=7), never a composite of the latest non-null
    # value per column (px=10.0 from the older row would be a row that
    # never existed).
    right = spark.createDataFrame(
        [("a", 1, 10.0, 5), ("a", 2, None, 7)],
        "k string, ts long, px double, qty long",
    )
    left = spark.createDataFrame([("a", 3, 100)], "k string, ts long, lid long")
    out = temporal.asof_join(left, right, on="k").collect()
    assert [(r["px"], r["qty"]) for r in out] == [(None, 7)]


def test_resample_ffill_skips_null_observations_with_provenance(spark):
    # Null-valued observation at t=25: the tick at 30 must carry the
    # older value AND that value's own timestamp (pandas-ffill
    # semantics), not the null row's timestamp.
    rows = [("a", 12, 1, 1.5), ("a", 25, 2, None), ("a", 31, 3, 3.5)]
    df = spark.createDataFrame(rows, "k string, t long, eid long, v double")
    out = temporal.resample_ffill(df, key="k", ts="t", value="v", step=10, tiebreak="eid")
    got = {r["grid_ts"]: (r["v"], r["obs_ts"]) for r in out.collect()}
    assert got == {10: (None, None), 20: (1.5, 12), 30: (1.5, 12)}


def test_asof_rejects_collisions_and_bad_direction(trades, quotes):
    with pytest.raises(ValueError, match="collide"):
        # right value column named like a left column
        temporal.asof_join(trades, quotes.select("k", "ts", F.col("px").alias("trade_id")), on="k")
    with pytest.raises(ValueError, match="direction"):
        temporal.asof_join(
            trades,
            quotes.select("k", "ts", F.col("px").alias("last_px")),
            on="k",
            direction="sideways",
        )


@pytest.fixture(scope="module")
def intervals(spark):
    # Half-open [start, end); id 3 is longer than one bin.
    rows = [(1, 100, 200), (2, 150, 250), (3, 0, 1000), (4, 900, 950)]
    return spark.createDataFrame(rows, "iv_id long, start long, end long")


@pytest.fixture(scope="module")
def points(spark):
    rows = [(i, i * 37 % 1100) for i in range(60)]
    return spark.createDataFrame(rows, "pt_id long, ts long")


def brute_force(intervals, points):
    j = intervals.crossJoin(points).filter(
        (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end"))
    )
    return {(r["iv_id"], r["pt_id"]) for r in j.collect()}


@pytest.mark.parametrize("bin_width", [1000, 100, 64])
def test_range_join_matches_brute_force(intervals, points, bin_width):
    # Correct at ANY bin width, including widths smaller than the
    # longest interval (more exploded bins, same matches, no dupes).
    got = temporal.range_join_bins(
        intervals, points, start="start", end="end", point_ts="ts", bin_width=bin_width
    )
    pairs = [(r["iv_id"], r["pt_id"]) for r in got.collect()]
    assert len(pairs) == len(set(pairs))  # each pair matched in exactly one bin
    assert set(pairs) == brute_force(intervals, points)


def test_range_join_half_open_boundaries(spark):
    iv = spark.createDataFrame([(1, 10, 20)], "iv_id long, start long, end long")
    pts = spark.createDataFrame([(1, 9), (2, 10), (3, 19), (4, 20)], "pt_id long, ts long")
    got = temporal.range_join_bins(iv, pts, start="start", end="end", point_ts="ts", bin_width=10)
    assert {r["pt_id"] for r in got.collect()} == {2, 3}  # start inclusive, end exclusive


def test_range_join_drops_inverted_intervals(spark):
    # end <= start must yield nothing — and must not explode a
    # descending bin sequence on the way (the silent scale hazard).
    iv = spark.createDataFrame(
        [(1, 20, 10), (2, 5, 5), (3, 0, 100)], "iv_id long, start long, end long"
    )
    pts = spark.createDataFrame([(1, 15), (2, 50)], "pt_id long, ts long")
    got = temporal.range_join_bins(iv, pts, start="start", end="end", point_ts="ts", bin_width=10)
    assert {(r["iv_id"], r["pt_id"]) for r in got.collect()} == {(3, 1), (3, 2)}
