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
