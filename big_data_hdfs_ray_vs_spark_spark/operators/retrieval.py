"""Sparse text retrieval: BM25 inverted-index scoring.

The complement of the dense-embedding ANN family (operators.similarity)
— this is how retrieval runs when the signal is lexical: an inverted
index keyed by term, query terms joined against postings, candidates
bounded by document frequency. All expressions are JVM builtins; the
only driver-side values are two bounded scalars (corpus size, average
document length), same discipline as tfidf_top_terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import spread_small_input, whitespace_tokens

# BM25 constants shared with the DuckDB oracle (oracles._bm25_sql
# imports them — single-sourced so the gate can't rot; the classic
# Robertson/Lucene defaults).
BM25_K1 = 1.2
BM25_B = 0.75
# Query terms present in more than this fraction of the corpus are
# dropped BEFORE the postings join — the scale dial: per-term join
# cost is |postings_t| · |queries using t|, and the hottest terms are
# exactly the ones BM25's idf would downweight toward zero anyway.
BM25_MAX_DF_RATIO = 0.5
# The registry/oracle pair (q106) overrides the cutoff to 0.9: the
# synthetic documents table draws from a ~31-term vocabulary whose
# document frequencies cluster at 75-81% of the corpus, so the
# production default above would empty every query's term set. Real
# zipfian corpora keep 0.5. Single-sourced so queries.py and
# oracles._bm25_sql cannot disagree.
BM25_Q106_DF_RATIO = 0.9


def bm25_index(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int, float]:
    """Build the BM25 index: (postings, doc_lengths, n_docs, avgdl).

    postings = (id, term, tf) from lowercased whitespace tokens;
    doc_lengths = (id, dl) derived FROM the postings aggregate (reused
    exchange — the corpus is tokenized once); n_docs counts every
    corpus row (zero-token docs are index members with dl 0, they just
    can't match); avgdl = total tokens / n_docs. The two scalars come
    from ONE column-pruned scan (count + sum-of-token-counts — no
    explode, no shuffle), so the scalar job never duplicates the
    postings pipeline; sum(size(tokens)) ≡ sum over dl by
    construction."""
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    terms = spread_small_input(corpus).select(
        F.col(id_col), F.explode(toks).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = corpus.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size(toks)).alias("tot")
    ).first()
    n_docs = stats["n"]
    total_tokens = stats["tot"] or 0
    avgdl = float(total_tokens) / n_docs if n_docs else 0.0
    return tf, dl, n_docs, avgdl


def bm25_more_like_this(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_df_ratio: float = BM25_MAX_DF_RATIO,
) -> DataFrame:
    """Top-``k`` BM25-scored corpus documents per query document
    ("more like this": each query's DISTINCT token set is the query).

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))   [Lucene form,
                  always positive]
    score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) /
                  (tf + k1·(1 - b + b·dl/avgdl))

    Scale shape: ONE term-keyed join of query terms against corpus
    postings — candidate volume is Σ_t df_t over kept query terms,
    bounded by the ``max_df_ratio`` cutoff, never corpus × queries.
    Then a (query, doc) hash aggregate (map-side combined) and one
    per-query window for the top-k cut. Scores are rounded to 6dp
    BEFORE ranking so the cut is taken on a value both engines agree
    on; ties break by doc id (deterministic).

    Returns (query_id, doc_id-named id_col, score, rank), rank 1..k.
    """
    tf, dl, n_docs, avgdl = bm25_index(corpus, id_col, text_col)
    q_terms = (
        spread_small_input(queries)
        .select(
            F.col(query_id_col),
            F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .distinct()
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    kept = dft.filter(F.col("df_t") <= F.lit(max_df_ratio * n_docs))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    )
    per_term = (
        q_terms.join(kept, "term")
        .join(tf, "term")
        .join(dl, id_col)
        .select(
            query_id_col,
            id_col,
            (
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
                )
            ).alias("__s"),
        )
    )
    scored = per_term.groupBy(query_id_col, id_col).agg(
        F.round(F.sum("__s"), 6).alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


# Reciprocal-rank-fusion constant (Cormack et al.'s standard 60) —
# shared with the q112 oracle.
RRF_K = 60


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 5,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Hybrid-retrieval fusion: combine two ranked candidate lists per
    query by reciprocal rank — score(d) = Σ_lists 1/(rrf_k + rank_d) —
    the standard way lexical (BM25) and dense (ANN) retrieval compose
    without score calibration (ranks are comparable; raw scores are
    not).

    Scale shape: ONE full-outer join keyed (query, id) between two
    already-top-k-bounded tables (each ≤ k rows per query), then a
    per-query window for the fused top-``k`` cut. Work is bounded by
    the candidate lists, never the corpus. The fused score is rounded
    to 6dp BEFORE ranking; ties break by id — both engines cut the
    same set.

    Returns (query_id, id, rrf_score, rank), rank 1..k per query.
    """
    keys = [query_id_col, id_col]
    contrib = lambda side: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(rrf_k) + F.col(f"__r_{side}")), F.lit(0.0)
    )
    a = ranked_a.select(*keys, F.col(rank_col).alias("__r_a"))
    b = ranked_b.select(*keys, F.col(rank_col).alias("__r_b"))
    fused = (
        a.join(b, on=keys, how="full_outer")
        .select(
            *keys,
            F.round(contrib("a") + contrib("b"), 6).alias("rrf_score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("rrf_score"), F.col(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*keys, "rrf_score", "rank")
    )
