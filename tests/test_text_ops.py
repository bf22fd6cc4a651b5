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


def test_unigram_nll_hand_computed(spark):
    """3-doc corpus with hand-computable unigram probabilities; an
    empty/null doc scores (0, 0.0, false) per the no-tokens invariant."""
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, None), (4, "  ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.unigram_nll(docs).collect()}
    # counts: a=2, b=2, c=1, total=5
    p = {"a": 2 / 5, "b": 2 / 5, "c": 1 / 5}
    want1 = -(2 * math.log(p["a"]) + math.log(p["b"])) / 3
    want2 = -(math.log(p["b"]) + math.log(p["c"])) / 2
    assert abs(out[1]["nll"] - want1) < 1e-6
    assert abs(out[2]["nll"] - want2) < 1e-6
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2
    for d in (3, 4):
        assert out[d]["n_tokens"] == 0
        assert out[d]["nll"] == 0.0
        assert out[d]["is_outlier"] is False
    # a doc of corpus-unique tokens scores the highest nll
    docs2 = spark.createDataFrame(
        [(1, "the the the the"), (2, "the zq1 zq2 zq3")],
        "doc_id long, text string",
    )
    out2 = {r["doc_id"]: r["nll"] for r in text.unigram_nll(docs2).collect()}
    assert out2[2] > out2[1]


def test_bpe_merge_candidates_hand_computed(spark):
    """'abab' contributes ab,ba,ab; 'ab' contributes ab; single letters
    and non-alpha are excluded from pair expansion."""
    docs = spark.createDataFrame(
        [(1, "abab ab X 42"), (2, "b-a"), (3, None)], "doc_id long, text string"
    )
    got = {(r["pair"]): (r["n"], r["rank"])
           for r in text.bpe_merge_candidates(docs, top_n=10).collect()}
    # lowercased alpha words: abab, ab, x(len1 skipped), b(len1), a(len1)
    assert got == {"ab": (3, 1), "ba": (1, 2)}


def test_bpe_merge_candidates_tie_break_and_cut(spark):
    docs = spark.createDataFrame([(1, "cd cd ab ab ef")], "doc_id long, text string")
    got = text.bpe_merge_candidates(docs, top_n=2).collect()
    # ab and cd tie at 2 -> alphabetical; ef (1) falls outside top_n
    assert [(r["pair"], r["n"], r["rank"]) for r in got] == [
        ("ab", 2, 1),
        ("cd", 2, 2),
    ]


def test_charset_audit_hand_fixture(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.text import charset_audit

    docs = spark.createDataFrame(
        [
            # src a: 2 docs, 6 tokens, 1 ALL-CAPS (>=2 chars; 'A' alone
            # is not), 2 digit tokens; one mojibake doc (â€™)
            (1, "NASA sent 12 probes", "a"),
            (2, "itâ€™s A 7", "a"),
            # src b: control char doc + U+FFFD doc + non-ascii doc
            (3, "bad\x07beep", "b"),
            (4, "lost � here", "b"),
            (5, "café", "b"),
            (6, None, "b"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in charset_audit(docs).collect()}
    a, b = got["a"], got["b"]
    assert (a.n_docs, a.n_mojibake_docs, a.n_ctrl_docs, a.n_replacement_docs) == (2, 1, 0, 0)
    # 'â€™' bytes are non-ascii too
    assert a.n_non_ascii_docs == 1
    assert a.upper_token_frac == round(1 / 7, 6)  # NASA of 7 tokens
    assert a.digit_token_frac == round(2 / 7, 6)  # 12, 7
    assert (b.n_docs, b.n_mojibake_docs, b.n_ctrl_docs, b.n_replacement_docs) == (4, 0, 1, 1)
    assert b.n_non_ascii_docs == 2  # U+FFFD doc + café
    assert b.upper_token_frac == 0.0 and b.digit_token_frac == 0.0


def test_charset_audit_zero_token_source(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.text import charset_audit

    docs = spark.createDataFrame(
        [(1, "", "empty"), (2, None, "empty")], "doc_id long, text string, source string"
    )
    r = charset_audit(docs).first()
    assert (r.upper_token_frac, r.digit_token_frac) == (0.0, 0.0)
