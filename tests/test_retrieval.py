"""BM25 retrieval: hand-computed scores, df cutoff, zero-token docs."""

import math

from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import retrieval

CORPUS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "cherry cherry cherry date"),
]


def _bm25(tf, df_t, dl, n, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(100, "apple cherry")], "query_id long, text string"
    )
    got = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in retrieval.bm25_more_like_this(
            corpus, queries, k=5, max_df_ratio=1.0
        ).collect()
    }
    n, avgdl = 3, 3.0
    want = {
        1: _bm25(2, 1, 3, n, avgdl),          # apple in d1
        2: _bm25(1, 2, 2, n, avgdl),          # cherry in d2
        3: _bm25(3, 2, 4, n, avgdl),          # cherry in d3
    }
    assert set(got) == set(want)
    for d, (score, _) in got.items():
        assert abs(score - want[d]) < 1e-6, (d, score, want[d])
    # rank ordering follows the rounded scores desc
    ordered = sorted(want, key=lambda d: (-round(want[d], 6), d))
    assert [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][1])] == ordered


def test_bm25_df_cutoff_drops_common_terms(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    queries = spark.createDataFrame([(100, "cherry")], "query_id long, text string")
    # cherry df=2/3 > 0.5: dropped -> no candidates at the default cutoff
    got = retrieval.bm25_more_like_this(corpus, queries, k=5, max_df_ratio=0.5)
    assert got.count() == 0
    # date df=1/3 <= 0.5: kept
    q2 = spark.createDataFrame([(100, "date")], "query_id long, text string")
    got2 = retrieval.bm25_more_like_this(corpus, q2, k=5, max_df_ratio=0.5).collect()
    assert [r["doc_id"] for r in got2] == [3]


def test_bm25_null_and_empty_docs(spark):
    corpus = spark.createDataFrame(
        CORPUS + [(4, None), (5, "   ")], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(100, "apple"), (101, None)], "query_id long, text string"
    )
    got = retrieval.bm25_more_like_this(
        corpus, queries, k=5, max_df_ratio=1.0
    ).collect()
    # zero-token corpus docs can never match; zero-token queries match nothing
    assert {r["query_id"] for r in got} == {100}
    assert {r["doc_id"] for r in got} == {1}
    # but they ARE index members: avgdl divides by all 5 docs
    tf, dl, n_docs, avgdl = retrieval.bm25_index(corpus)
    assert n_docs == 5 and abs(avgdl - 9 / 5) < 1e-12


def test_rrf_fuse_hand_computed(spark):
    """Doc 1 ranks 1 lexical + 2 dense; doc 2 only lexical rank 2;
    doc 3 only dense rank 1. RRF k=60:
      d1 = 1/61 + 1/62, d3 = 1/61, d2 = 1/62 -> order 1, 3, 2."""
    lex = spark.createDataFrame(
        [(100, 1, 1), (100, 2, 2)], "query_id long, doc_id long, rank int"
    )
    den = spark.createDataFrame(
        [(100, 3, 1), (100, 1, 2)], "query_id long, doc_id long, rank int"
    )
    got = sorted(
        retrieval.rrf_fuse(lex, den, k=5).collect(), key=lambda r: r["rank"]
    )
    assert [(r["doc_id"], r["rank"]) for r in got] == [(1, 1), (3, 2), (2, 3)]
    assert abs(got[0]["rrf_score"] - round(1 / 61 + 1 / 62, 6)) < 1e-9
    assert abs(got[1]["rrf_score"] - round(1 / 61, 6)) < 1e-9


def test_rrf_fuse_tie_breaks_by_id(spark):
    lex = spark.createDataFrame(
        [(100, 9, 1), (100, 4, 2)], "query_id long, doc_id long, rank int"
    )
    den = spark.createDataFrame(
        [(100, 4, 1), (100, 9, 2)], "query_id long, doc_id long, rank int"
    )
    got = sorted(
        retrieval.rrf_fuse(lex, den, k=5).collect(), key=lambda r: r["rank"]
    )
    # both docs score 1/61 + 1/62: tie -> lower id first
    assert [r["doc_id"] for r in got] == [4, 9]


def _mmr(spark, cands, vecs, k=3):
    from big_data_hdfs_ray_vs_spark_spark.operators.retrieval import mmr_diversify

    c = spark.createDataFrame(cands, "query_id long, doc_id long, rel double")
    v = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    return {
        (r.query_id, r.step): (r.doc_id, r.mmr_score)
        for r in mmr_diversify(c, v, k=k).collect()
    }


def test_mmr_picks_diverse_over_redundant(spark):
    # docs 1,2 identical vectors (sim 1.0) with top rel; doc 3
    # orthogonal with lower rel. Step 1 → doc 1 (best rel); step 2
    # must skip the duplicate (0.7*0.9 - 0.3*1.0 = 0.33) and take the
    # diverse doc 3 (0.7*0.5 - 0.3*0 = 0.35).
    cands = [(7, 1, 0.95), (7, 2, 0.9), (7, 3, 0.5)]
    vecs = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    out = _mmr(spark, cands, vecs, k=2)
    assert out[(7, 1)][0] == 1
    assert out[(7, 2)][0] == 3
    assert out[(7, 2)][1] == 0.35


def test_mmr_tie_breaks_by_lowest_doc_id(spark):
    cands = [(1, 20, 0.8), (1, 10, 0.8)]
    vecs = [(10, [1.0, 0.0]), (20, [0.0, 1.0])]
    out = _mmr(spark, cands, vecs, k=1)
    assert out[(1, 1)][0] == 10


def test_mmr_fewer_candidates_than_k(spark):
    cands = [(1, 5, 0.4)]
    vecs = [(5, [1.0])]
    out = _mmr(spark, cands, vecs, k=5)
    assert list(out) == [(1, 1)]
    assert out[(1, 1)] == (5, round(0.7 * 0.4, 6))


def test_mmr_candidate_without_vector_is_novel(spark):
    # doc 9 has no vector row: no pair sims, so its redundancy term
    # is always 0 — selectable purely on relevance.
    cands = [(1, 8, 0.9), (1, 9, 0.85)]
    vecs = [(8, [1.0, 0.0])]
    out = _mmr(spark, cands, vecs, k=2)
    assert out[(1, 1)][0] == 8
    assert out[(1, 2)][0] == 9


# ------------------------------------------------------ cross_rerank
def _texts(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_rerank_hand_fixture(spark):
    # q1 = "apple banana cherry":
    #   doc 10 identical          → jaccard 1.0
    #   doc 11 inter 2 / union 5  → 0.4
    #   doc 12 disjoint           → 0.0
    # duplicate candidate (1,10) must dedup, k=2 cuts doc 12
    cand = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 11), (1, 12)], "query_id long, doc_id long"
    )
    docs = _texts(
        spark,
        [(10, "apple banana cherry"), (11, "apple banana xyz q"), (12, "zzz")],
    )
    queries = _texts(spark, [(1, "apple banana cherry")]).withColumnRenamed(
        "doc_id", "query_id"
    )
    rows = retrieval.cross_rerank(cand, docs, queries, k=2).collect()
    got = [(r.query_id, r.doc_id, r.cross_score, r.rank) for r in rows]
    assert got == [(1, 10, 1.0, 1), (1, 11, 0.4, 2)]


def test_cross_rerank_empty_texts_score_zero_not_nan(spark):
    cand = spark.createDataFrame([(1, 10)], "query_id long, doc_id long")
    docs = _texts(spark, [(10, "   ")])
    queries = _texts(spark, [(1, "")]).withColumnRenamed("doc_id", "query_id")
    r = retrieval.cross_rerank(cand, docs, queries, k=1).first()
    assert r.cross_score == 0.0


def test_cross_rerank_scorer_is_pluggable(spark):
    # the contract: any (q_text, d_text) -> double Column — here a
    # trivial length scorer flips the default ordering
    cand = spark.createDataFrame([(1, 10), (1, 11)], "query_id long, doc_id long")
    docs = _texts(spark, [(10, "apple"), (11, "a much longer unrelated text")])
    queries = _texts(spark, [(1, "apple")]).withColumnRenamed("doc_id", "query_id")
    rows = retrieval.cross_rerank(
        cand, docs, queries, scorer=lambda q, d: F.length(d).cast("double"), k=1
    ).collect()
    assert [(r.doc_id, r.rank) for r in rows] == [(11, 1)]


def test_cross_rerank_plan_broadcasts_candidates(spark):
    from big_data_hdfs_ray_vs_spark_spark.sources.layout import physical_plan

    cand = spark.createDataFrame([(1, 10)], "query_id long, doc_id long")
    docs = _texts(spark, [(10, "x")])
    queries = _texts(spark, [(1, "x")]).withColumnRenamed("doc_id", "query_id")
    plan = physical_plan(retrieval.cross_rerank(cand, docs, queries, k=1))
    # the corpus side must stream through a broadcast hash join —
    # never a shuffle of the big table, never a cartesian
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan
