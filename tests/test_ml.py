"""Unit tests for operators/ml.py — hand-computed micro-fixtures for
each of the model-quality analytics operators (q113–q116)."""

import math

import pytest
from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import ml


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------- NB


def test_nb_recovers_separable_classes(spark):
    # Vocabularies are disjoint → eval docs must classify perfectly.
    # doc_id 0 and 97 are the eval split (% 97 == 0).
    rows = [
        (0, "aa bb aa", "en"),
        (97, "xx yy xx", "de"),
        (1, "aa bb", "en"),
        (2, "aa aa bb", "en"),
        (3, "xx yy", "de"),
        (4, "yy xx xx", "de"),
    ]
    out = ml.naive_bayes_confusion(_docs(spark, rows)).collect()
    got = {(r.true_label, r.pred_label): r.n_docs for r in out}
    assert got == {("en", "en"): 1, ("de", "de"): 1}


def test_nb_prior_only_doc_gets_majority_class(spark):
    # Eval doc has only OOV tokens → scored by prior alone → the
    # majority train class wins.
    rows = [
        (0, "zz qq", "en"),  # eval; zz/qq not in train vocab
        (1, "aa", "en"),
        (2, "aa", "en"),
        (3, "bb", "de"),
    ]
    out = ml.naive_bayes_confusion(_docs(spark, rows)).collect()
    assert {(r.true_label, r.pred_label): r.n_docs for r in out} == {("en", "en"): 1}


def test_nb_zero_token_class_still_modeled(spark):
    # A class whose train docs are all empty must NOT win by default:
    # its per-token likelihood is the uniform 1/V floor, strictly
    # worse than the observed class's smoothed estimate for that
    # class's dominant token (0.6 vs 0.5 here, equal priors).
    rows = [
        (0, "aa aa aa", "en"),  # eval
        (1, "aa aa bb", "en"),
        (2, "", "de"),
    ]
    out = ml.naive_bayes_confusion(_docs(spark, rows)).collect()
    assert {(r.true_label, r.pred_label): r.n_docs for r in out} == {("en", "en"): 1}


def test_nb_all_null_labels_returns_empty(spark):
    rows = [(0, "aa", None), (1, "bb", None)]
    out = ml.naive_bayes_confusion(_docs(spark, rows))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "true_label",
        "pred_label",
        "n_docs",
    ]


# ------------------------------------------------------------- AUC


def _auc(spark, pairs):
    # double scores require the quantization guard; 6dp is exact for
    # these 1dp fixtures, so the AUC values are unchanged
    df = spark.createDataFrame(pairs, "score double, y boolean")
    return ml.roc_auc(df, "score", "y", score_round=6).first()


def test_auc_perfect_and_reverse(spark):
    r = _auc(spark, [(1.0, False), (2.0, False), (3.0, True), (4.0, True)])
    assert (r.auc, r.n_pos, r.n_neg) == (1.0, 2, 2)
    r = _auc(spark, [(4.0, False), (3.0, False), (1.0, True), (2.0, True)])
    assert r.auc == 0.0


def test_auc_ties_count_half(spark):
    # One tied pair of (pos, neg) at score 2: AUC = (1 + 0.5·1 + 0)/ (2·2)?
    # pos scores {2, 3}, neg {1, 2}: pairs pos>neg: (2>1)=1, (2,2)=½,
    # (3>1)=1, (3>2)=1 → 3.5/4 = 0.875.
    r = _auc(
        spark, [(1.0, False), (2.0, False), (2.0, True), (3.0, True)]
    )
    assert r.auc == pytest.approx(0.875)


def test_auc_degenerate_single_class_is_zero(spark):
    r = _auc(spark, [(1.0, True), (2.0, True)])
    assert (r.auc, r.n_pos, r.n_neg) == (0.0, 2, 0)


def test_auc_null_score_excluded_null_label_negative(spark):
    r = _auc(spark, [(None, True), (1.0, None), (2.0, True)])
    assert (r.n_pos, r.n_neg) == (1, 1)
    assert r.auc == 1.0


# ------------------------------------------------------------ chi2


def test_chi2_discriminative_term_tops_and_uniform_term_zero(spark):
    rows = [
        (1, "aa cc", "en"),
        (2, "aa cc", "en"),
        (3, "bb cc", "de"),
        (4, "bb cc", "de"),
    ]
    out = ml.chi2_terms(_docs(spark, rows), top_k=3).collect()
    by_class = {}
    for r in out:
        by_class.setdefault(r.label, []).append((r.rank, r.term, r.chi2))
    # 'cc' appears in every doc → denominator guard → chi2 0, ranked last.
    for label, terms in by_class.items():
        terms.sort()
        assert terms[0][1] in ("aa", "bb")
        assert terms[0][2] == pytest.approx(4.0)  # N·(AD-BC)²/… = 4 here
        # only observed (term, class) pairs score: 2 terms per class
        assert terms[-1] == (2, "cc", 0.0)


def test_chi2_excludes_unlabeled_docs(spark):
    rows = [(1, "aa", "en"), (2, "bb", None)]
    out = ml.chi2_terms(_docs(spark, rows)).collect()
    assert {r.term for r in out} == {"aa"}


# ---------------------------------------------------------- bigram


def test_bigram_nll_hand_value(spark):
    # Corpus: "a b a b" ×1. Pairs: (a,b)×2, (b,a)×1. V=2, k=1.
    # P(b|a) = (2+1)/(2+2) = 0.75 ; P(a|b) = (1+1)/(1+2) = 2/3.
    # doc NLL = -(2·ln .75 + 1·ln(2/3)) / 3
    rows = [(1, "a b a b", "en")]
    r = ml.bigram_nll(_docs(spark, rows)).first()
    want = -(2 * math.log(0.75) + math.log(2 / 3)) / 3
    assert r.n_bigrams == 3
    assert r.nll == pytest.approx(round(want, 6))


def test_bigram_short_and_empty_docs_zero(spark):
    rows = [(1, "solo", "en"), (2, "", "en"), (3, None, "en"), (4, "x y", "en")]
    out = {r.doc_id: (r.n_bigrams, r.nll) for r in ml.bigram_nll(_docs(spark, rows)).collect()}
    assert out[1] == (0, 0.0)
    assert out[2] == (0, 0.0)
    assert out[3] == (0, 0.0)
    assert out[4][0] == 1


# ------------------------------------------------------------- PCA


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_pca_recovers_dominant_axis(spark):
    # Cloud stretched along axis 0 (values ±4), tiny spread on axis 1:
    # the top component is e0 (sign-fixed positive), so per-label
    # projection variance ≈ the axis-0 variance.
    rows = [
        (1, [4.0, 0.1], 0),
        (2, [-4.0, -0.1], 0),
        (3, [4.0, -0.1], 1),
        (4, [-4.0, 0.1], 1),
    ]
    out = {r.label: r for r in ml.pca_label_projection(_emb(spark, rows)).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r.n_vecs == 2
        assert abs(r.mean_proj) < 0.2
        assert r.var_proj == pytest.approx(16.0, rel=0.05)


def test_pca_identical_vectors_zero_variance(spark):
    rows = [(i, [1.0, 2.0, 3.0], 7) for i in range(5)]
    r = ml.pca_label_projection(_emb(spark, rows)).first()
    assert (r.label, r.n_vecs, r.mean_proj, r.var_proj) == (7, 5, 0.0, 0.0)


def test_pca_excludes_truncated_vectors_and_null_label(spark):
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [-1.0, 0.0], None),
        (3, [9.0], 0),  # truncated: not a point in the 2-d space
    ]
    out = {r.label: r for r in ml.pca_label_projection(_emb(spark, rows)).collect()}
    assert set(out) == {0, -1}
    assert out[0].n_vecs == 1 and out[-1].n_vecs == 1


def test_pca_empty_input(spark):
    out = ml.pca_label_projection(_emb(spark, []))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "label",
        "n_vecs",
        "mean_proj",
        "var_proj",
    ]


# ---------------------------------------------------------- bigram continued


def test_bigram_flags_shuffled_text_higher(spark):
    # Repeated fluent pattern vs a doc of the same unigrams shuffled:
    # the shuffled doc must score strictly higher NLL.
    fluent = "the cat sat on the mat"
    rows = [(i, fluent, "en") for i in range(1, 9)] + [
        (9, "mat the on sat cat the", "en")
    ]
    out = {r.doc_id: r.nll for r in ml.bigram_nll(_docs(spark, rows)).collect()}
    assert out[9] > out[1]


# ------------------------------------------------------- calibration


def test_calibration_bins_hand_computed(spark):
    rows = [
        (0.05, True),   # bin 0: mean .05, frac_pos 1
        (0.55, False),  # bin 5
        (0.58, True),   # bin 5: mean .565, frac_pos .5
        (1.0, True),    # clamps into bin 9
        (None, True),   # excluded
    ]
    df = spark.createDataFrame(rows, "s double, y boolean")
    out = {r.bin: r for r in ml.calibration_bins(df, "s", "y").collect()}
    assert set(out) == {0, 5, 9}
    assert out[0].n == 1 and out[0].frac_pos == 1.0
    assert out[5].n == 2
    assert out[5].mean_score == 0.565
    assert out[5].frac_pos == 0.5
    assert out[5].gap == 0.065
    assert out[9].n == 1


def test_pca_modal_dim_excludes_oversized_outlier(spark):
    # docstring rule, implemented since r5: the MODAL dim defines the
    # space; a single oversized vector is excluded, not dim-defining
    df = spark.createDataFrame(
        [
            (0, 0, [1.0, 0.0]),
            (1, 0, [2.0, 0.0]),
            (2, 1, [3.0, 0.0]),
            (3, 1, [9.0, 9.0, 9.0]),  # corrupt outlier
        ],
        "vec_id long, label int, embedding array<double>",
    )
    rows = ml.pca_label_projection(df).collect()
    assert sum(r.n_vecs for r in rows) == 3
