"""Text-analysis operators vs hand-computed values."""

import re

from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import text

DOCS = [
    (0, "The quick brown fox, and a lazy dog!"),
    (1, "word " * 10),
    (2, ""),
    (3, "numbers 123 and symbols #!"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_counts(spark):
    got = {r["doc_id"]: (r["n_tokens"], r["n_pieces"])
           for r in text.token_counts(_docs(spark)).collect()}
    assert got[0][0] == 8
    assert got[1][0] == 10
    assert got[2][0] == 0
    # BPE-ish pieces oracle via the same regex in python
    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    for i, s in DOCS:
        assert got[i][1] == len(pat.findall(s)), (i, s)


def test_quality_features_formulas(spark):
    r = {x["doc_id"]: x for x in text.quality_features(_docs(spark)).collect()}
    d0 = r[0]
    # 8 tokens, 2 stopwords ('and', 'a'; 'The' lowercased counts too -> 3)
    assert d0["n_tokens"] == 8
    assert abs(d0["stopword_ratio"] - 3 / 8) < 1e-6
    text0 = DOCS[0][1]
    punct = sum(1 for c in text0 if not (c.isalnum() or c == "_" or c.isspace()))
    assert abs(d0["punct_ratio"] - punct / len(text0)) < 1e-6
    # empty doc: all ratios zero, no division errors
    assert r[2]["n_tokens"] == 0 and r[2]["quality_score"] is not None


def test_lang_id_heuristic(spark):
    r = {x["doc_id"]: x["pred_lang"]
         for x in text.lang_id_heuristic(_docs(spark)).collect()}
    assert r[0] == "en_like"   # has 'the', 'and', 'a'
    assert r[1] == "other"     # no stopwords


def test_fingerprint_prefix_stability(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, "alpha beta gamma delta epsilon zeta eta theta DIFFERENT TAIL"),
            (2, "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x["fingerprint"] for x in text.fingerprint(docs).collect()}
    assert r[0] == r[1]  # first 8 tokens identical -> same fingerprint
    assert r[0] == r[2]  # case-normalized


def test_tfidf_top_terms(spark):
    import math

    docs = spark.createDataFrame(
        [
            (0, "apple apple banana shared"),
            (1, "banana cherry shared shared"),
            (2, "cherry cherry cherry shared"),
        ],
        "doc_id long, text string",
    )
    out = text.tfidf_top_terms(docs, top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tfidf"]))
    # 'shared' appears in all 3 docs -> idf ln(3/3)=0, never ranks first.
    assert by_doc[0][0][1] == "apple"
    assert by_doc[0][0][2] == round(2 * math.log(3 / 1), 6)
    # doc 2: cherry tf=3, idf ln(3/2)
    assert by_doc[2][0][1] == "cherry"
    assert by_doc[2][0][2] == round(3 * math.log(3 / 2), 6)
    # every doc yields exactly top_n rows, ranks 1..2
    assert all(sorted(r[0] for r in v) == [1, 2] for v in by_doc.values())


def test_char_bigram_entropy_closed_form(spark):
    import math

    from big_data_hdfs_ray_vs_spark_spark.operators.text import char_bigram_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "x"), (4, "abcd")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["entropy"])
           for r in char_bigram_entropy(docs).collect()}
    assert got[1] == (3, 0.0)                      # aa,aa,aa -> zero entropy
    h2 = math.log(3) - (2 * math.log(2)) / 3       # ab,ba,ab
    assert abs(got[2][1] - round(h2, 6)) < 1e-9 and got[2][0] == 3
    assert 3 not in got                            # <2 chars: no row
    assert got[4] == (3, round(math.log(3), 6))    # all distinct -> ln(n)


def test_sparse_cosine_pairs_closed_form(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.text import sparse_cosine_pairs
    import math

    # 4 docs; "common" appears in all 4 → pruned at max_df_ratio=0.5.
    # "rare" appears in docs 1 and 2 only; "solo" only in doc 3.
    rows = [
        (1, "common rare"),
        (2, "common rare"),
        (3, "common solo"),
        (4, "common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r["cos_sim"]
           for r in sparse_cosine_pairs(df, min_sim=0.0, max_df_ratio=0.5).collect()}
    # After pruning, docs 1 and 2 are the unit vector on "rare" → cos 1;
    # doc 3's only kept term is "solo", shared with nobody; doc 4 has no
    # kept terms at all.
    assert out == {(1, 2): 1.0}


def test_null_and_empty_body_token_invariant(spark):
    """The engine-wide invariant (mirrored by the oracle _TOKS/_SHINGLES
    macros): a null/empty/whitespace-only body has ZERO tokens and ZERO
    shingles — never a null feature row or a phantom '' shingle."""
    from big_data_hdfs_ray_vs_spark_spark.functions import (
        whitespace_tokens,
        word_shingles,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one"), (5, "a b c d")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            whitespace_tokens(F.col("text")).alias("toks"),
            word_shingles(whitespace_tokens(F.col("text")), 3).alias("sh"),
        ).collect()
    }
    for d in (1, 2, 3):
        assert out[d]["toks"] == [] and out[d]["sh"] == []
    assert out[4]["sh"] == ["one"]  # short-doc fallback intact
    assert out[5]["sh"] == ["a b c", "b c d"]


def test_jaccard_of_empty_shingle_sets_is_zero(spark):
    """Two empty-body docs paired for verification: jaccard/containment
    are 0.0 (no shingle evidence), not an ANSI divide-by-zero abort."""
    from big_data_hdfs_ray_vs_spark_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x y z")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    jac = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(docs, pairs).collect()}
    assert jac[(1, 2)] == 0.0 and jac[(2, 3)] == 0.0
    cont = dedup.ngram_containment_pairs(docs, pairs).collect()
    for r in cont:
        assert r["containment_a"] == 0.0 and r["containment_b"] == 0.0
