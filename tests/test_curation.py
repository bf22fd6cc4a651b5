"""Unit oracles for the curation operators (decontamination, Gopher
rules, repetition, PII) on hand-computable fixtures, plus plan-shape
guards for the zero-shuffle claims."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import curation
from big_data_hdfs_ray_vs_spark_spark.sources.layout import physical_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_exact_ngram_overlap(spark):
    eval_docs = _docs(spark, [(100, "the quick brown fox jumps")])
    train = _docs(
        spark,
        [
            # shares the 3-gram "the quick brown" and "quick brown fox"
            (1, "we saw the quick brown fox today"),
            # same words, different order: no shared 3-gram
            (2, "brown the fox quick jumps"),
            # unrelated
            (3, "completely different words here"),
        ],
    )
    out = {r.doc_id: r.n_eval_hits for r in curation.decontaminate(train, eval_docs).collect()}
    assert set(out) == {1}
    # doc 1 shares "the quick brown" and "quick brown fox" with the eval set
    assert out[1] == 2


def test_decontaminate_hit_count_exact(spark):
    eval_docs = _docs(spark, [(100, "a b c d")])  # 3-grams: "a b c", "b c d"
    train = _docs(spark, [(1, "x a b c d y"), (2, "a b x c d")])
    out = {r.doc_id: r.n_eval_hits for r in curation.decontaminate(train, eval_docs).collect()}
    # doc 1 3-grams: "x a b","a b c","b c d","c d y" → hits {a b c, b c d} = 2
    assert out == {1: 2}


def test_decontaminate_case_insensitive(spark):
    eval_docs = _docs(spark, [(9, "Alpha Beta Gamma")])
    train = _docs(spark, [(1, "alpha beta gamma delta")])
    assert curation.decontaminate(train, eval_docs).count() == 1


def test_gopher_rules_boundaries(spark):
    # 50 words, mwl exactly 3.0 (lower boundary, inclusive), two
    # distinct stopwords ("the", "and")
    ok_text = " ".join(["the", "cat", "sat", "and", "mat"] * 10)
    short = "too short"
    symbolic = " ".join(["123"] * 60) + " the a"  # alpha ratio ~2/62 < 0.8
    df = _docs(spark, [(1, ok_text), (2, short), (3, symbolic)])
    out = {r.doc_id: r for r in curation.gopher_quality_flags(df).collect()}
    assert out[1].keep and out[1].n_words == 50
    assert not out[2].keep and not out[2].ok_word_count
    assert not out[3].keep and not out[3].ok_alpha_ratio
    # rule features are measured, not just flagged
    assert abs(out[1].mean_word_len - 3.0) < 1e-9
    assert out[1].n_distinct_stopwords == 2
    assert out[1].ok_stopwords
    # one distinct stopword is below the >=2 bound
    one_stop = _docs(spark, [(7, " ".join(["the", "cat", "sat", "onn", "mat"] * 10))])
    row7 = curation.gopher_quality_flags(one_stop).collect()[0]
    assert row7.n_distinct_stopwords == 1 and not row7.ok_stopwords and not row7.keep


def test_gopher_zero_shuffle_plan(spark):
    df = _docs(spark, [(1, "a b c")])
    plan = physical_plan(curation.gopher_quality_flags(df))
    assert "Exchange" not in plan


def test_repetition_stats_exact(spark):
    df = _docs(
        spark,
        [
            (1, "a b a b a b"),  # bigrams: ab,ba,ab,ba,ab → top 3/5
            (2, "u v w x y"),  # all distinct bigrams → top 1/4
            (3, "solo"),  # fallback single gram
        ],
    )
    out = {r.doc_id: r for r in curation.repetition_stats(df).collect()}
    assert abs(out[1].top_bigram_ratio - 3 / 5) < 1e-9
    assert abs(out[1].distinct_token_ratio - 2 / 6) < 1e-6
    assert abs(out[2].top_bigram_ratio - 1 / 4) < 1e-9
    assert out[3].top_bigram_ratio == 1.0


def test_pii_scan_and_redaction(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jane.doe+x@example.org or admin@test.co"),
            (2, "server at 192.168.0.1 port 8080"),
            (3, "call +1 555 0100 9999 now"),
            (4, "nothing sensitive here"),
        ],
    )
    out = {r.doc_id: r for r in curation.pii_scan(df).collect()}
    assert out[1].n_emails == 2 and "[EMAIL]" in out[1].redacted_text
    assert "jane.doe" not in out[1].redacted_text
    assert out[2].n_ipv4 == 1 and "[IP]" in out[2].redacted_text
    assert out[3].n_phones == 1 and "[PHONE]" in out[3].redacted_text
    assert out[4].n_emails == out[4].n_ipv4 == out[4].n_phones == 0
    assert out[4].redacted_text == "nothing sensitive here"

    summary = curation.pii_summary(df).collect()[0]
    assert summary.n_docs == 4
    assert summary.total_emails == 2
    assert summary.total_ipv4 == 1
    assert summary.total_phones == 1
    assert summary.docs_with_pii == 3


def test_pii_zero_shuffle_scan(spark):
    df = _docs(spark, [(1, "a@b.cc")])
    plan = physical_plan(curation.pii_scan(df))
    assert "Exchange" not in plan


def test_decontaminate_broadcasts_eval_side(spark):
    eval_docs = _docs(spark, [(9, "a b c")])
    train = _docs(spark, [(1, "a b c d")])
    plan = physical_plan(curation.decontaminate(train, eval_docs))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
