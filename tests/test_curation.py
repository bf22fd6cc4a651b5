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


def test_chunk_documents_exact(spark):
    # 5 tokens, chunk 3 / stride 2 → chunks [0:3],[2:5] (starts 0,2)
    df = _docs(spark, [(1, "a b c d e"), (2, "x y")])
    out = {(r.doc_id, r.chunk_id): r for r in curation.chunk_documents(
        df, chunk_size=3, stride=2).collect()}
    assert out[(1, 0)].chunk_text == "a b c"
    assert out[(1, 1)].chunk_text == "c d e"
    assert out[(1, 1)].n_chunk_tokens == 3
    # short doc: exactly one (short) chunk
    assert out[(2, 0)].chunk_text == "x y"
    assert len([k for k in out if k[0] == 2]) == 1


def test_chunk_documents_tail_chunk(spark):
    # 6 tokens, chunk 4 / stride 3 → starts 0,3; second chunk is short
    df = _docs(spark, [(1, "a b c d e f")])
    rows = sorted(curation.chunk_documents(df, chunk_size=4, stride=3).collect(),
                  key=lambda r: r.chunk_id)
    assert [r.chunk_text for r in rows] == ["a b c d", "d e f"]


def test_chunk_zero_shuffle_plan(spark):
    df = _docs(spark, [(1, "a b c")])
    plan = physical_plan(curation.chunk_documents(df))
    assert "Exchange" not in plan


def test_boilerplate_stats_exact(spark):
    # "a b c" appears in 3 docs (boiler at min_df=3); docs 1-3 also have
    # one unique gram each; doc 4 shares nothing
    df = _docs(
        spark,
        [
            (1, "a b c p q"),
            (2, "a b c r s"),
            (3, "a b c t u"),
            (4, "z z z z"),
        ],
    )
    out = {r.doc_id: r for r in curation.boilerplate_stats(df, n=3, min_df=3).collect()}
    # doc 1 grams: "a b c","b c p","c p q" → 1 boiler of 3
    assert out[1].n_grams == 3 and out[1].n_boiler == 1
    # boiler_ratio is rounded to 6 decimals by the operator
    assert abs(out[1].boiler_ratio - 1 / 3) < 1e-5
    # doc 4 grams: "z z z" (distinct) ×1... appears once in 1 doc → 0 boiler
    assert out[4].n_boiler == 0


def test_boilerplate_stats_precomputed_grams(spark):
    # The grams= path (shared tokenize pass) must agree with the
    # default path, and neither may leave a cache entry behind.
    spark.catalog.clearCache()
    df = _docs(spark, [(1, "a b c p q"), (2, "a b c r s"), (3, "a b c t u")])
    default = sorted(map(tuple, curation.boilerplate_stats(df, n=3, min_df=3).collect()))
    pre = curation._distinct_grams(df, "doc_id", "text", 3)
    shared = sorted(
        map(tuple, curation.boilerplate_stats(df, n=3, min_df=3, grams=pre).collect())
    )
    assert default == shared
    # Leak regression guard: neither path may leave a cache entry.
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_k_anonymity_audit(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.curation import k_anonymity_audit

    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)] * 1
    df = spark.createDataFrame(rows, "qt string, day int")
    [r] = k_anonymity_audit(df, ["qt", "day"], k=5).collect()
    assert (r["n_groups"], r["n_rows"]) == (3, 8)
    assert (r["rows_below_k"], r["groups_below_k"]) == (3, 2)
    assert r["min_group_size"] == 1


def test_curation_pipeline_funnel(spark):
    """Hand-checkable 4-doc funnel: quality drops the short doc, exact
    dedup drops the duplicate, decontamination drops the doc sharing a
    3-gram with the eval corpus, the cap is a no-op at cap=2."""
    spark.catalog.clearCache()  # earlier tests may leave persisted frames
    base = "the quick brown fox jumps over a lazy dog near the riverbank " * 5
    train = _docs(
        spark,
        [
            (1, base + "alpha"),
            (2, base + "alpha"),          # exact duplicate of 1
            (3, base + "beta gamma delta"),  # contaminated (eval 3-gram)
            (4, "x y"),                   # fails gopher quality
        ],
    ).withColumn("source", F.lit("s"))
    eval_docs = _docs(spark, [(99, "beta gamma delta")]).withColumn(
        "source", F.lit("s")
    )
    out = {
        r["stage"]: r
        for r in curation.curation_pipeline(train, eval_docs, cap=2).collect()
    }
    assert [out[s]["stage_idx"] for s in
            ("input", "quality", "exact_dedup", "decontaminated", "domain_cap")] == [0, 1, 2, 3, 4]
    # base has 60 words; docs 1/2 add 1, doc 3 adds 3, doc 4 has 2
    assert (out["input"]["rows_out"], out["input"]["tokens_out"]) == (4, 187)
    assert (out["quality"]["rows_out"], out["quality"]["tokens_out"]) == (3, 185)
    assert (out["exact_dedup"]["rows_out"], out["exact_dedup"]["tokens_out"]) == (2, 124)
    assert (out["decontaminated"]["rows_out"], out["decontaminated"]["tokens_out"]) == (1, 61)
    assert (out["domain_cap"]["rows_out"], out["domain_cap"]["tokens_out"]) == (1, 61)
    # zero-cache contract: the staged-flag plan persists nothing
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_curation_pipeline_cap_binds(spark):
    """With cap=1 and two clean surviving docs of one source, the
    domain-cap stage keeps exactly one."""
    base = "the quick brown fox jumps over a lazy dog near the riverbank " * 5
    train = _docs(spark, [(1, base + "alpha"), (2, base + "beta")]).withColumn(
        "source", F.lit("s")
    )
    eval_docs = _docs(spark, [(99, "zeta eta theta")]).withColumn(
        "source", F.lit("s")
    )
    out = {
        r["stage"]: r["rows_out"]
        for r in curation.curation_pipeline(train, eval_docs, cap=1).collect()
    }
    assert out["decontaminated"] == 2 and out["domain_cap"] == 1
