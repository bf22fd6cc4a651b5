"""Deterministic sampling & curation: layout-independence (the property
sampleBy lacks), rate accuracy, split exhaustiveness, budget invariants."""

import pytest
from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"tok{j}" for j in range(5 + i % 40)), ["en", "de", "zh"][i % 3], f"src{i % 4}")
        for i in range(600)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_stratified_sample_layout_independent(docs):
    frac = {"en": 0.5, "de": 0.2}
    a = {r["doc_id"] for r in sampling.stratified_sample(docs, "lang", frac).collect()}
    b = {
        r["doc_id"]
        for r in sampling.stratified_sample(docs.repartition(7, "source"), "lang", frac).collect()
    }
    assert a == b  # membership is a pure function of the data, not the layout


def test_stratified_sample_rates_and_missing_strata(docs):
    frac = {"en": 0.5, "de": 0.2}  # zh absent -> dropped entirely
    got = sampling.stratified_sample(docs, "lang", frac).groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert "zh" not in by_lang
    assert 60 <= by_lang["en"] <= 140  # 200 en docs at 0.5 (hash-exact, not binomial-noisy)
    assert 10 <= by_lang["de"] <= 70  # 200 de docs at 0.2


def test_train_val_test_split_exhaustive_and_stable(docs):
    out = sampling.train_val_test_split(docs).collect()
    assert len(out) == 600
    splits = {r["doc_id"]: r["split"] for r in out}
    assert set(splits.values()) == {"train", "val", "test"}
    again = {r["doc_id"]: r["split"] for r in sampling.train_val_test_split(docs).collect()}
    assert splits == again
    n_train = sum(1 for s in splits.values() if s == "train")
    assert 420 <= n_train <= 540  # ~80%


def test_token_budget_respects_quota_and_rank(docs):
    out = sampling.token_budget_curation(docs, group_col="source", budget_tokens=120).collect()
    assert out, "budget should admit at least one doc per source"
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        assert max(r["cum_tokens"] for r in rows) <= 120
        assert sum(r["n_tokens"] for r in rows) == max(r["cum_tokens"] for r in rows)


def test_token_budget_prefers_higher_quality(spark):
    # Two docs in one group where only one fits: the higher-quality
    # (longer, up to the 100-token length-score cap) doc must win.
    rows = [
        (0, " ".join(["the quick fox"] * 20), "en", "s"),  # 60 tokens, higher length score
        (1, "short text here now", "en", "s"),  # 4 tokens, low quality
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = sampling.token_budget_curation(docs, group_col="source", budget_tokens=62).collect()
    assert [r["doc_id"] for r in out] == [0]


def test_deterministic_shuffle_is_a_permutation(docs):
    out = sampling.deterministic_shuffle(docs, n_shards=8).collect()
    assert len(out) == 600
    assert len({r["doc_id"] for r in out}) == 600
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # contiguous ranks


def test_deterministic_shuffle_layout_independent(docs):
    a = {(r["doc_id"], r["shard"], r["pos"])
         for r in sampling.deterministic_shuffle(docs, n_shards=8).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"])
         for r in sampling.deterministic_shuffle(docs.repartition(5, "lang"), n_shards=8).collect()}
    assert a == b


def test_mixture_weights_repeat_counts(docs):
    out = sampling.mixture_weights(docs, {"en": 2.3, "de": 1.0}, group_col="lang").collect()
    copies = {}
    for r in out:
        copies.setdefault((r["doc_id"], r["lang"]), []).append(r["copy"])
    langs = {lang for (_d, lang) in copies}
    assert langs == {"en", "de"}  # zh unweighted -> dropped
    for (_d, lang), cs in copies.items():
        assert sorted(cs) == list(range(1, len(cs) + 1))
        if lang == "de":
            assert len(cs) == 1  # integer weight: exactly one copy
        else:
            assert len(cs) in (2, 3)  # 2.3 -> 2 or 3 copies
    n_en_docs = sum(1 for (_d, lang) in copies if lang == "en")
    n_en_rows = sum(len(cs) for (_d, lang), cs in copies.items() if lang == "en")
    assert 2.0 < n_en_rows / n_en_docs < 2.6  # ~2.3 in expectation


# --- weighted sampling (A-ES) ----------------------------------------------


def test_weighted_sample_deterministic_and_capped(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        (F.col("id") % 7 + 1).cast("double").alias("w"),
    )
    a = sampling.weighted_sample_per_group(df, "source", "w", n=10)
    b = sampling.weighted_sample_per_group(df.repartition(13), "source", "w", n=10)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    assert ids_a == sorted(r["doc_id"] for r in b.collect())  # layout-independent
    per = {r["source"]: r["n"] for r in
           a.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v == 10 for v in per.values())


def test_weighted_sample_prefers_heavy_rows(spark):
    # two weight classes 100:1 — the heavy class should dominate the sample
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.lit("g").alias("source"),
        F.when(F.col("id") < 40, 100.0).otherwise(1.0).alias("w"),
    )
    got = [r["doc_id"] for r in
           sampling.weighted_sample_per_group(df, "source", "w", n=40).collect()]
    heavy = sum(1 for i in got if i < 40)
    assert heavy >= 30  # 40 heavy rows at 100x weight vs 360 light


def test_weighted_sample_drops_nonpositive_weights(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit("g").alias("source"),
        F.when(F.col("id") < 5, -1.0).otherwise(2.0).alias("w"),
    )
    got = {r["doc_id"] for r in
           sampling.weighted_sample_per_group(df, "source", "w", n=10).collect()}
    assert got == set(range(5, 10))


# ---------------------------------------------------------- DSIR (q133)
def test_dsir_hand_fixture(spark):
    import math

    from pyspark.sql import functions as F

    from big_data_hdfs_ray_vs_spark_spark.operators.sampling import dsir_importance

    # target: doc 0 "aa bb"; raw: doc 1 "aa aa", doc 2 "cc cc", doc 3 ""
    # ct_T: aa 1, bb 1; ct_R: aa 2, cc 2; V=3, N_T=2, N_R=4, add-1:
    #   lr(aa) = ln(2/5) − ln(3/7);  lr(cc) = ln(1/5) − ln(3/7)
    docs = spark.createDataFrame(
        [(0, "aa bb"), (1, "aa aa"), (2, "cc cc"), (3, "")],
        "doc_id long, text string",
    )
    rows = dsir_importance(docs, F.col("doc_id") == 0).collect()
    got = {r.doc_id: (r.n_tokens, r.logw, r.avg_logw, r.rank) for r in rows}
    lr_aa = math.log(2 / 5) - math.log(3 / 7)
    lr_cc = math.log(1 / 5) - math.log(3 / 7)
    assert set(got) == {1, 2, 3}  # raw docs only — the target never scores
    assert got[1][0] == 2 and got[1][1] == pytest.approx(2 * lr_aa, abs=2e-6)
    assert got[2][0] == 2 and got[2][2] == pytest.approx(lr_cc, abs=2e-6)
    assert got[3] == (0, 0.0, 0.0, 1)  # zero-token raw doc: 0.0, never NULL
    # avg order: doc3 (0.0) > doc1 (−0.069) > doc2 (−0.762)
    assert [got[d][3] for d in (3, 1, 2)] == [1, 2, 3]


def test_dsir_topk_cut_is_take_ordered(spark):
    from pyspark.sql import functions as F

    from big_data_hdfs_ray_vs_spark_spark.operators.sampling import dsir_importance
    from big_data_hdfs_ray_vs_spark_spark.sources.layout import physical_plan
    from tools.plan_audit import global_window_violations

    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} common") for i in range(30)], "doc_id long, text string"
    )
    df = dsir_importance(docs, F.col("doc_id") % 5 == 0, top_k=4)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert global_window_violations(plan) == []
    assert df.count() == 4


# --------------------------------------------- temperature mixture (q134)
def test_temperature_mixture_hand_fixture(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.sampling import (
        temperature_mixture,
    )

    # A: 9 tokens, B: 4 tokens; T=2 → w = 3, 2; p = 0.6, 0.4
    # budget 10 → epochs A = 0.6·10/9, B = 0.4·10/4 = 1.0
    docs = spark.createDataFrame(
        [("A", "x y z")] * 3 + [("B", "x y")] * 2 + [(None, "zz")],
        "source string, text string",
    )
    rows = temperature_mixture(docs, budget_tokens=10).collect()
    got = {r.source: (r.n_tokens, r.weight, r.p, r.epochs) for r in rows}
    assert set(got) == {"A", "B"}  # null source excluded
    assert got["A"] == (9, 3.0, 0.6, round(0.6 * 10 / 9, 6))
    assert got["B"] == (4, 2.0, 0.4, 1.0)


def test_temperature_mixture_keeps_zero_token_sources(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.sampling import (
        temperature_mixture,
    )

    # an all-empty source must stay VISIBLE (0 tokens, 0.0 weights) —
    # silently dropping it would hide the slice from the mix audit
    docs = spark.createDataFrame(
        [("A", "x y"), ("B", ""), ("B", "   ")], "source string, text string"
    )
    rows = temperature_mixture(docs, budget_tokens=10).collect()
    got = {r.source: (r.n_tokens, r.weight, r.p, r.epochs) for r in rows}
    assert got["B"] == (0, 0.0, 0.0, 0.0)
    assert got["A"][2] == 1.0  # A owns the whole mix


def test_temperature_mixture_t1_is_proportional(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = spark.createDataFrame(
        [("A", "x y z")] * 3 + [("B", "x")], "source string, text string"
    )
    rows = temperature_mixture(docs, temperature=1.0, budget_tokens=100).collect()
    got = {r.source: r.p for r in rows}
    assert got["A"] == 0.9 and got["B"] == 0.1
    # T=1: every source's effective epochs are equal (pure proportional)
    eps = {r.source: r.epochs for r in rows}
    assert eps["A"] == eps["B"] == 10.0


def test_source_kl_matches_direct_full_vocab_sum(spark):
    # validate the closed-form absent-term block against the naive
    # full-vocabulary double sum, computed in Python
    import math

    corpus = [
        (1, "s1", "a a b c"),
        (2, "s1", "a b"),
        (3, "s2", "c c c d"),
        (4, "s3", ""),          # zero-token source -> (0, 0, 0.0)
        (5, None, "a d d"),     # NULL source groups as ''
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, source string, text string")
    got = {
        r.source: (r.n_tokens, r.n_terms, r.kl)
        for r in sampling.source_kl_divergence(docs).collect()
    }
    toks = {}
    for _i, s, t in corpus:
        toks.setdefault(s or "", []).extend((t or "").lower().split())
    vocab = sorted({w for ws in toks.values() for w in ws})
    V = len(vocab)
    allc = {w: sum(ws.count(w) for ws in toks.values()) for w in vocab}
    N = sum(allc.values())
    for s, ws in toks.items():
        ns = len(ws)
        if ns == 0:
            assert got[s] == (0, 0, 0.0), s
            continue
        kl = 0.0
        for w in vocab:
            p = (ws.count(w) + 1) / (ns + V)
            q = (allc[w] + 1) / (N + V)
            kl += p * math.log(p / q)
        assert got[s][0] == ns and got[s][1] == len(set(ws))
        assert abs(got[s][2] - kl) < 1e-5, (s, got[s][2], kl)


def test_distribution_match_feasibility_and_counts(spark):
    from pyspark.sql import functions as F

    # 40 a-rows, 10 b-rows; target 50/50 -> K = min(40/.5, 10/.5) = 20,
    # accept: a 0.25, b 1.0 (the binding bucket keeps everything)
    rows = [(i, "a" if i < 40 else "b") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    out = {
        r.bucket: r
        for r in sampling.distribution_match_sample(
            df, F.col("g"), {"a": 0.5, "b": 0.5}
        ).collect()
    }
    assert out["a"].n_rows == 40 and out["a"].accept_rate == 0.25
    assert out["b"].n_rows == 10 and out["b"].accept_rate == 1.0
    assert out["b"].n_kept == 10  # rate 1.0 keeps every row
    # realized counts must be exactly the documented md5 rule's selection
    import hashlib

    def u(i):
        return int(hashlib.md5(f"dmatch:{i}".encode()).hexdigest()[:15], 16) / float(
            1 << 60
        )

    expect_a = sum(1 for i in range(40) if u(i) < 0.25)
    assert out["a"].n_kept == expect_a
    # kept_share sums to 1 over kept rows
    tot = sum(r.n_kept for r in out.values())
    assert abs(sum(r.kept_share for r in out.values()) - 1.0) < 1e-5
    assert tot == expect_a + 10


def test_distribution_match_infeasible_target_is_loud(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, g string")
    out = sampling.distribution_match_sample(
        df, F.col("g"), {"a": 0.5, "missing": 0.5}
    ).collect()
    # target bucket absent from the corpus -> K = 0 -> zero kept rows
    assert all(r.n_kept == 0 and r.accept_rate == 0.0 for r in out)


def test_distribution_match_untargeted_bucket_dropped(spark):
    from pyspark.sql import functions as F

    rows = [(i, ["a", "b", "junk"][i % 3]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    out = {r.bucket: r for r in sampling.distribution_match_sample(
        df, F.col("g"), {"a": 0.5, "b": 0.5}).collect()}
    assert out["junk"].accept_rate == 0.0 and out["junk"].n_kept == 0


def test_distribution_match_malformed_target_raises(spark):
    # the r6-advisor note: shares must be positive and sum to ~1 —
    # a relative-shares dict would silently skew target_share
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, b string")
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="sum to"):
        sampling.distribution_match_sample(df, F.col("b"), {"a": 0.3, "b": 0.3})
    with pytest.raises(ValueError, match="positive"):
        sampling.distribution_match_sample(df, F.col("b"), {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="empty target"):
        sampling.distribution_match_sample(df, F.col("b"), {})
