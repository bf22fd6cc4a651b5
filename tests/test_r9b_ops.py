"""Round-9 batch-3 operator fixtures: kNN label metrics (q201),
Adamic-Adar link prediction (q202), stupid-backoff LM (q203),
Kaplan-Meier survival (q204).

Each fixture pins hand-computable toy results — the metrics are
closed-form on tiny inputs, so a numeric change is an algorithm
change, not noise.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators.ml import stupid_backoff_scores
from big_data_hdfs_ray_vs_spark_spark.operators.similarity import knn_label_metrics
from big_data_hdfs_ray_vs_spark_spark.operators.temporal import kaplan_meier_curve
from big_data_hdfs_ray_vs_spark_spark.plans.graph import link_prediction_scores


# ------------------------------------------------------ q201 kNN metrics
def test_knn_label_metrics_separable_clusters(spark):
    # two orthogonal label clusters: every query's top neighbors are
    # its own label ⇒ perfect nDCG / MRR / precision-as-possible
    rows = []
    for i in range(8):
        # label 0 near e1, label 1 near e2; tiny id-dependent jitter
        # keeps the cosine ranking total
        if i % 2 == 0:
            rows.append((i, [1.0, 0.001 * i, 0.0], 0))
        else:
            rows.append((i, [0.0, 0.001 * i, 1.0], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r["label"]: r
        for r in knn_label_metrics(emb, k=3, every=2).collect()
    }
    # queries = even ids = the four label-0 vectors
    assert set(out) == {0}
    r = out[0]
    assert r["n_queries"] == 4
    # 3 same-label neighbors exist (4 per label minus self), all rank
    # above the orthogonal cluster ⇒ ndcg=1, mrr=1, p@3=1, recall=3/3
    assert r["mean_ndcg"] == 1.0
    assert r["mean_mrr"] == 1.0
    assert r["mean_precision"] == 1.0
    assert r["mean_recall"] == 1.0


def test_knn_label_metrics_zero_vector_query_excluded(spark):
    rows = [
        (0, [0.0, 0.0], 0),  # zero-magnitude query: excluded
        (2, [1.0, 0.0], 0),
        (1, [1.0, 0.1], 0),
        (3, [0.9, 0.1], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = knn_label_metrics(emb, k=2, every=2).collect()
    # only vec 2 survives as a query (vec 0 has no defined cosine)
    assert sum(r["n_queries"] for r in out) == 1


# ------------------------------------------------------ q202 link prediction
def test_link_prediction_wedge_scores(spark):
    import math

    # path graph 1-2-3: candidate (1,3) through pivot 2 (deg 2);
    # AA = 1/ln(2), jaccard = 1/(1+1... deg1=1, deg3=1, common=1 ->
    # 1/(1+1-1)=1.0
    edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    out = link_prediction_scores(edges).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["node_a"], r["node_b"], r["n_common"]) == (1, 3, 1)
    assert abs(r["adamic_adar"] - 1.0 / math.log(2)) < 1e-6
    assert r["jaccard"] == 1.0


def test_link_prediction_existing_edges_excluded(spark):
    # triangle: every wedge closes an existing edge -> no candidates
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "u long, v long"
    )
    assert link_prediction_scores(edges).count() == 0


def test_link_prediction_hub_cap_drops_pivot(spark):
    # star center 0 with 4 leaves; hub_cap=3 excludes the center as a
    # pivot -> no predictions at all
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "u long, v long"
    )
    assert link_prediction_scores(edges, hub_cap=3).count() == 0
    assert link_prediction_scores(edges, hub_cap=4).count() == 6


# ------------------------------------------------------ q203 stupid backoff
def test_stupid_backoff_seen_and_backoff_paths(spark):
    # train doc (id 0): "a b a b" -> bigrams ab:2? no: pairs = (a,b),
    # (b,a),(a,b) -> c(a,b)=2, c(b,a)=1; ctx(a)=2, ctx(b)=1;
    # unigrams: a:2 b:2, T=4
    # test doc (id 1): "a b c" -> (a,b): seen 2/2=1.0;
    # (b,c): unseen -> 0.4 * c(c)/T = 0.4*0 = 0
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in stupid_backoff_scores(docs).collect()}
    assert set(out) == {1}
    r = out[1]
    assert r["n_bigrams"] == 2 and r["n_backoff"] == 1
    assert r["sb_score"] == pytest.approx((1.0 + 0.0) / 2, abs=1e-9)


def test_stupid_backoff_unigram_backoff_value(spark):
    # test bigram (b, a): unseen pair, a IS in train unigrams
    # -> 0.4 * c(a)/T = 0.4 * 2/4 = 0.2; mean over 1 bigram = 0.2
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "b a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in stupid_backoff_scores(docs).collect()}
    r = out[1]
    assert r["n_bigrams"] == 1 and r["n_backoff"] == 0
    # (b,a) IS seen in train (c=1, ctx(b)=1) -> 1.0
    assert r["sb_score"] == 1.0


def test_stupid_backoff_short_doc_zero(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "solo")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in stupid_backoff_scores(docs).collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["sb_score"] == 0.0


# ------------------------------------------------------ q204 Kaplan-Meier
def _ev(uid, day_offsets):
    base = datetime.datetime(2024, 1, 1)
    return [
        (uid * 100 + i, base + datetime.timedelta(days=d), uid, "view", 1.0, None)
        for i, d in enumerate(day_offsets)
    ]


def test_kaplan_meier_hand_computed(spark):
    # horizon = day 10 (user 3's last event).
    # user 1: days 0..2  -> dur 2, last day 2, gap 8d > 1d  -> death at 2
    # user 2: days 0..5  -> dur 5, gap 5d -> death at 5
    # user 3: days 0..10 -> dur 10, gap 0 -> censored at 10
    rows = _ev(1, [0, 1, 2]) + _ev(2, [0, 3, 5]) + _ev(3, [0, 10])
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["day"]: r for r in kaplan_meier_curve(ev).collect()}
    assert set(out) == {2, 5, 10}
    assert (out[2]["at_risk"], out[2]["deaths"], out[2]["censored"]) == (3, 1, 0)
    assert out[2]["survival"] == pytest.approx(2 / 3, abs=1e-6)
    assert (out[5]["at_risk"], out[5]["deaths"]) == (2, 1)
    assert out[5]["survival"] == pytest.approx((2 / 3) * (1 / 2), abs=1e-6)
    assert (out[10]["at_risk"], out[10]["deaths"], out[10]["censored"]) == (1, 0, 1)
    # censoring never moves the curve
    assert out[10]["survival"] == out[5]["survival"]


def test_kaplan_meier_all_censored_flat(spark):
    # everyone active at the horizon -> survival identically 1.0
    rows = _ev(1, [0, 5]) + _ev(2, [0, 5])
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = kaplan_meier_curve(ev).collect()
    assert all(r["survival"] == 1.0 for r in out)
    assert all(r["deaths"] == 0 for r in out)


# ------------------------------------------------------ q208 skyline
def test_skyline_dominance_toy(spark):
    from big_data_hdfs_ray_vs_spark_spark.queries import q208_skyline  # noqa: F401
    # direct formulation check via a tiny orders-shaped frame
    import datetime as dt
    from pyspark.sql import Window
    from big_data_hdfs_ray_vs_spark_spark import functions as fx

    rows = [
        (1, dt.datetime(2024, 1, 1), 100.0),   # frontier (earliest)
        (2, dt.datetime(2024, 1, 2), 90.0),    # dominated by 1
        (3, dt.datetime(2024, 1, 3), 150.0),   # frontier
        (4, dt.datetime(2024, 1, 3), 150.0),   # tie with 3: kept
        (5, dt.datetime(2024, 1, 3), 120.0),   # dominated by 3 (same day)
        (6, dt.datetime(2024, 1, 4), 150.0),   # dominated by 3 (earlier, ==)
        (7, dt.datetime(2024, 1, 5), 200.0),   # frontier
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    daily = orders.groupBy("o_orderdate").agg(F.max("o_totalprice").alias("d"))
    run = daily.withColumn(
        "p",
        F.max("d").over(
            Window.orderBy("o_orderdate").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ),
    ).filter(F.col("p").isNull() | (F.col("d") > F.col("p")))
    sky = orders.join(run, on="o_orderdate").filter(
        F.col("o_totalprice") == F.col("d")
    )
    keys = sorted(r["o_orderkey"] for r in sky.collect())
    assert keys == [1, 3, 4, 7]


# ------------------------------------------------------ q206 PIT enrichment
def test_pit_enrichment_asof_matches_interval_join(spark):
    # as-of against a change log == interval join against the SCD2
    # history built from the same log (the q206 claim)
    import datetime as dt

    from big_data_hdfs_ray_vs_spark_spark.operators.temporal import (
        asof_join,
        scd2_history,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    changes = spark.createDataFrame(
        [(1, ts(1), 10, "bronze"), (1, ts(5), 11, "silver"),
         (1, ts(9), 12, "gold"), (2, ts(2), 13, "bronze")],
        "user_id long, ts timestamp, event_id long, tier string",
    )
    clicks = spark.createDataFrame(
        [(100, 1, ts(0)), (101, 1, ts(1)), (102, 1, ts(6)),
         (103, 1, ts(12)), (104, 2, ts(3))],
        "event_id long, user_id long, ts timestamp",
    )
    hist = scd2_history(
        changes, key="user_id", ts="ts", value_cols=["tier"],
        tiebreak="event_id",
    )
    via_asof = asof_join(
        clicks,
        changes.withColumnRenamed("event_id", "__cid"),
        on="user_id", ts="ts", tiebreak="__cid",
    ).select("event_id", "tier")
    via_interval = (
        clicks.alias("c")
        .join(
            hist.alias("h"),
            (F.col("c.user_id") == F.col("h.user_id"))
            & (F.col("c.ts") >= F.col("h.valid_from"))
            & (F.col("h.valid_to").isNull() | (F.col("c.ts") < F.col("h.valid_to"))),
            "left",
        )
        .select("c.event_id", "h.tier")
    )
    assert sorted(map(tuple, via_asof.collect())) == sorted(
        map(tuple, via_interval.collect())
    )


# ------------------------------------------------------ q209 preference pairs
def test_preference_pairs_rank_matching(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.curation import (
        preference_pairs,
    )

    # one stratum (same source, all short); quality rises with filler
    # count (length component) — 4 docs => 2 pairs: best-vs-worst and
    # 2nd-best-vs-2nd-worst
    docs = spark.createDataFrame(
        [
            (1, "the " * 30),   # high: 30 toks, all stopwords
            (2, "the " * 20),
            (3, "zz " * 6),
            (4, "zz " * 4),
        ],
        "doc_id long, text string",
    ).withColumn("source", F.lit("web")).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    )
    out = {
        (r["chosen_id"], r["rejected_id"]): r["margin"]
        for r in preference_pairs(docs).collect()
    }
    assert set(out) == {(1, 4), (2, 3)}
    assert all(m > 0 for m in out.values())


def test_preference_pairs_margin_floor(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.curation import (
        preference_pairs,
    )

    # identical docs: zero margin everywhere -> no pairs survive
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(6)], "doc_id long, text string"
    ).withColumn("source", F.lit("web")).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    )
    assert preference_pairs(docs).count() == 0


# ------------------------------------------------------ q210 walk pairs
def test_walk_pairs_deterministic_and_window2(spark):
    from big_data_hdfs_ray_vs_spark_spark.plans.graph import (
        deterministic_walk_pairs,
    )

    # path graph 1-2-3: from any node the hop choice is forced on
    # degree-1 nodes and hash-determined on node 2
    edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    out1 = sorted(map(tuple, deterministic_walk_pairs(edges).collect()))
    out2 = sorted(map(tuple, deterministic_walk_pairs(edges).collect()))
    assert out1 == out2  # fully deterministic, no RNG state
    # every pair is from the 3-node universe and counted > 0
    assert all(a < b and n > 0 for a, b, n in out1)
    nodes = {x for a, b, _ in out1 for x in (a, b)}
    assert nodes <= {1, 2, 3}


def test_walk_pairs_isolated_graph_empty(spark):
    from big_data_hdfs_ray_vs_spark_spark.plans.graph import (
        deterministic_walk_pairs,
    )

    edges = spark.createDataFrame([], "u long, v long")
    assert deterministic_walk_pairs(edges).count() == 0


# ------------------------------------------------------ q211 LSH tuning
def test_lsh_tuning_curve_extremes(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.dedup import (
        lsh_tuning_curve,
    )

    # identical docs (s=1) and disjoint docs (s=0): P(1)=1, P(0)=0 for
    # every (b, r) config
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),   # s(1,2)=1
            (3, "zeta eta theta iota"),      # s(2,3)=0
            (4, "zeta eta theta iota"),      # s(3,4)=1
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    out = lsh_tuning_curve(docs, pairs).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_pairs"] == 3
        # two perfect pairs, one disjoint -> caught exactly 2.0
        assert r["expected_caught"] == pytest.approx(2.0, abs=1e-9)
        assert r["n_likely"] == 2


def test_lsh_tuning_more_rows_stricter(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.dedup import (
        lsh_tuning_curve,
    )

    # a mid-similarity pair: configs with more rows per band (higher r)
    # must catch it with LOWER probability (the S-curve steepens)
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f x y"),  # partial overlap
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = {
        (r["bands"], r["rows_per_band"]): r["expected_caught"]
        for r in lsh_tuning_curve(docs, pairs).collect()
    }
    assert out[(16, 1)] > out[(4, 4)] > out[(1, 16)]


# ------------------------------------------------------ q212 seq patterns
def test_seq_pattern_support_gap_allowed(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.temporal import (
        sequential_pattern_support,
    )

    # user 1: view, click, purchase (in order, with a gap event between)
    # user 2: purchase, click, view (reversed -> supports no v<c<p)
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0), 1, "view", 1.0, None),
        (2, datetime.datetime(2024, 1, 1, 1), 1, "error", 1.0, None),
        (3, datetime.datetime(2024, 1, 1, 2), 1, "click", 1.0, None),
        (4, datetime.datetime(2024, 1, 1, 3), 1, "purchase", 1.0, None),
        (5, datetime.datetime(2024, 1, 1, 0), 2, "purchase", 1.0, None),
        (6, datetime.datetime(2024, 1, 1, 1), 2, "click", 1.0, None),
        (7, datetime.datetime(2024, 1, 1, 2), 2, "view", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        (r["step1"], r["step2"], r["step3"]): r["support"]
        for r in sequential_pattern_support(ev, top=200).collect()
    }
    # gap-allowed: view..click..purchase supported by user 1 only
    assert out[("view", "click", "purchase")] == 1
    # reversed order: purchase..click..view supported by user 2 only
    assert out[("purchase", "click", "view")] == 1
    # no user has three views
    assert ("view", "view", "view") not in out


def test_seq_pattern_repeated_type_needs_three(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.temporal import (
        sequential_pattern_support,
    )

    rows = [
        (i, datetime.datetime(2024, 1, 1, i), 1, "view", 1.0, None)
        for i in range(3)
    ] + [
        (10 + i, datetime.datetime(2024, 1, 1, i), 2, "view", 1.0, None)
        for i in range(2)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        (r["step1"], r["step2"], r["step3"]): r["support"]
        for r in sequential_pattern_support(ev, top=200).collect()
    }
    # (view,view,view) needs three occurrences: user 1 only
    assert out[("view", "view", "view")] == 1
