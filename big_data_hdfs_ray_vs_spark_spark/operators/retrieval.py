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
    tf, dl = _bm25_postings(corpus, id_col, text_col)
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    stats = corpus.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size(toks)).alias("tot")
    ).first()
    n_docs = stats["n"]
    total_tokens = stats["tot"] or 0
    avgdl = float(total_tokens) / n_docs if n_docs else 0.0
    return tf, dl, n_docs, avgdl


def _bm25_postings(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    terms = spread_small_input(corpus).select(
        F.col(id_col), F.explode(toks).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    return tf, dl


def bm25_stats(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """The two BM25 corpus scalars — n_docs and avgdl — as a ONE-ROW
    DataFrame instead of a driver-side ``.first()``: consumers
    crossJoin(broadcast(...)) it (the keyless-agg BNLJ pattern the
    plan lint allowlists as bounded), so building a BM25 plan
    launches no job and the corpus is never scanned eagerly at
    plan-construction time (r7-verdict item 7's job-free-construction
    bar). Values are bit-identical to the eager path: IEEE double
    count/sum/divide either way."""
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    n = F.count(F.lit(1))
    return corpus.agg(
        n.cast("double").alias("__n_docs"),
        (
            F.coalesce(F.sum(F.size(toks)), F.lit(0)).cast("double")
            / F.greatest(n, F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )


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
    # postings + the two corpus scalars, all lazily: the scalars ride
    # as a broadcast one-row aggregate instead of an eager .first()
    # (which cost a full corpus tokenize at plan-construction time).
    # The tf postings feed THREE consumers (the df_t aggregate, the
    # per-term scoring join, and the doc-length aggregate) and Spark
    # re-executes unpersisted subtrees per reference — the captured
    # before-plan (plans/r10/q106_bm25_search_before.txt) shows the
    # tokenize→explode→tf pipeline THREE separate times over three
    # full corpus scans. Persist it once (MEMORY_AND_DISK, the
    # ngram_jaccard_pairs discipline). SIDE EFFECT: the postings stay
    # cached after return (the result consumes them lazily); bench/
    # gate harnesses clear between queries, library callers own
    # cleanup (spark.catalog.clearCache()).
    from pyspark import StorageLevel

    tf, dl = _bm25_postings(corpus, id_col, text_col)
    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = bm25_stats(corpus, text_col)
    q_terms = (
        spread_small_input(queries)
        .select(
            F.col(query_id_col),
            F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .distinct()
    )
    dft = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .crossJoin(F.broadcast(stats))
    )
    kept = dft.filter(F.col("df_t") <= F.lit(max_df_ratio) * F.col("__n_docs"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
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
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))
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


# MMR trade-off: λ weighs relevance, μ = 1-λ weighs redundancy.
# Single-sourced with the oracle (oracles._mmr_sql imports both).
MMR_LAMBDA = 0.7
MMR_MU = 1.0 - MMR_LAMBDA


def mmr_diversify(
    candidates: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "rel",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance re-rank of per-query candidate
    lists: greedily pick argmax_d λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s)
    until ``k`` are chosen — the standard de-redundancy step between
    ANN retrieval and a context window (near-identical top hits waste
    the prompt budget RRF fusion alone cannot fix).

    Scale shape: every stage is CANDIDATE-bounded, never
    corpus-bounded. Pairwise cosines are computed per query over the
    ≤C-row candidate list (C² pairs via two candidate⋈vectors joins +
    one per-query self-join); the greedy itself is inherently
    sequential-per-query, so it runs as a cogrouped Arrow-batched
    applyInPandas over (candidates, pair-sims) — parallelism = #
    queries, work per group ≤ C·k dictionary lookups. This is one of
    the engine's documented Python stages (SCALING.md): a 5-step
    unrolled join-chain could stay JVM-side, but its plan is 5 windows
    + 5 joins deep for a per-group workload of ~50 float compares.

    Determinism contract (the oracle unrolls the same greedy as CTE
    steps): rel and pairwise sims round to 6dp BEFORE the greedy, so
    both engines compare identical doubles; max-sim over the selected
    set uses only sims PRESENT in the pair table (absent pairs — a
    zero-magnitude candidate vector — contribute 0.0 only when NO
    pair exists, exactly the oracle's LEFT JOIN + coalesce); ties
    break by lowest id. Candidates missing from ``vectors`` keep
    their relevance but have no pair rows (scored as novel).

    Returns (query_id, id, mmr_score 6dp, step 1..min(k, |C|)).
    """
    import pandas as pd

    lam, mu, kk = MMR_LAMBDA, MMR_MU, k
    cand = candidates.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.round(F.col(rel_col), 6).alias("rel"),
    )
    cv = (
        vectors.select(
            F.col(vec_id_col).alias("__vid"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .withColumn(
            "__n",
            F.sqrt(
                F.aggregate(
                    F.zip_with(F.col("__v"), F.col("__v"), lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
        )
        .filter(F.col("__n") > 0)
    )
    with_vec = cand.join(cv, cand["doc_id"] == cv["__vid"]).select(
        "query_id", "doc_id", "__v", "__n"
    )
    a = with_vec.select(
        "query_id",
        F.col("doc_id").alias("a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = with_vec.select(
        F.col("query_id").alias("__qid_b"),
        F.col("doc_id").alias("b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    # Per-candidate neighbor lists instead of a separate pair table:
    # sims collapse to (query, a) → [(b, sim)...] and join back onto
    # the candidates, so the greedy takes ONE input frame (Spark's
    # ambiguous-self-join analysis rejects cogrouping two frames that
    # share the candidate lineage). The list is ≤C−1 entries.
    sims = (
        a.join(b, F.col("query_id") == F.col("__qid_b"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("query_id", "a")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("b").alias("b"),
                    F.round(
                        F.aggregate(
                            F.zip_with(
                                F.col("__va"), F.col("__vb"), lambda x, y: x * y
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                        / (F.col("__na") * F.col("__nb")),
                        6,
                    ).alias("sim"),
                )
            ).alias("nbrs")
        )
        .select(
            F.col("query_id").alias("__qid_s"),
            F.col("a").alias("__did_s"),
            "nbrs",
        )
    )
    enriched = cand.join(
        sims,
        (F.col("query_id") == F.col("__qid_s"))
        & (F.col("doc_id") == F.col("__did_s")),
        "left",
    ).select("query_id", "doc_id", "rel", "nbrs")

    def greedy(cands: pd.DataFrame) -> pd.DataFrame:
        if cands.empty:
            return pd.DataFrame(
                {"query_id": [], "doc_id": [], "mmr_score": [], "step": []}
            ).astype({"query_id": "int64", "doc_id": "int64", "step": "int32"})
        qid = int(cands["query_id"].iloc[0])
        rel, sim = {}, {}
        for r in cands.itertuples(index=False):
            d = int(r.doc_id)
            rel[d] = float(r.rel)
            if r.nbrs is not None:
                for item in r.nbrs:
                    sim[(d, int(item["b"]))] = float(item["sim"])
        selected: list[int] = []
        out = []
        remaining = sorted(rel)
        for step in range(1, min(kk, len(remaining)) + 1):
            best_d, best_s = None, None
            for d in remaining:
                vals = [sim[(d, s)] for s in selected if (d, s) in sim]
                ms = max(vals) if vals else 0.0
                score = lam * rel[d] - mu * ms
                if best_s is None or score > best_s:
                    best_d, best_s = d, score
            # NO Python rounding here: λ·(6dp value) lands exactly on
            # decimal midpoints, where Python's half-even disagrees
            # with Spark/DuckDB's half-away — the final F.round below
            # is the cross-engine-consistent boundary.
            out.append((qid, best_d, best_s, step))
            selected.append(best_d)
            remaining.remove(best_d)
        return pd.DataFrame(
            out, columns=["query_id", "doc_id", "mmr_score", "step"]
        ).astype({"query_id": "int64", "doc_id": "int64", "step": "int32"})

    return enriched.groupby("query_id").applyInPandas(
        greedy, "query_id long, doc_id long, mmr_score double, step int"
    ).withColumn("mmr_score", F.round("mmr_score", 6))


# Cross-rerank defaults — single-sourced with the q132 oracle.
CROSS_RERANK_K = 5


def cross_score_token_jaccard(q_text, d_text):
    """Default cross-scorer: token-SET Jaccard between the full query
    text and the full candidate text — a genuine pair function (it
    sees both texts at once, the defining property of a cross-encoder
    stage) that stays 100% JVM builtins and SQL-replayable:
    |tokens(q) ∩ tokens(d)| / |tokens(q) ∪ tokens(d)|, 0.0 when both
    are empty. A real model scorer plugs into the same slot as an
    Arrow-batched pandas_udf with the identical (q_text, d_text) →
    double contract."""
    qt = F.array_distinct(whitespace_tokens(F.lower(q_text)))
    dt = F.array_distinct(whitespace_tokens(F.lower(d_text)))
    union = F.size(F.array_union(qt, dt))
    return F.when(
        union > 0,
        F.size(F.array_intersect(qt, dt)).cast("double") / union.cast("double"),
    ).otherwise(F.lit(0.0))


def cross_rerank(
    candidates: DataFrame,
    doc_texts: DataFrame,
    query_texts: DataFrame,
    scorer=None,
    k: int = CROSS_RERANK_K,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Second-stage (cross-encoder-style) rerank of a first-stage
    candidate union — the production retrieval stack's last hop:
    cheap retrievers (BM25, ANN) nominate, an expensive PAIR scorer
    that reads both texts re-orders, only the nominated pairs ever
    reach it.

    ``candidates`` is the (query_id, doc_id) union of the retrieval
    legs (duplicates welcome — deduped here, the same candidate-union
    plumbing as rrf_fuse). ``scorer`` is pluggable: any callable
    (q_text Column, d_text Column) → double Column; the default is
    the JVM-side token-Jaccard cross-score, and a model-backed
    pandas_udf satisfies the same contract (Arrow-batched, one batch
    per ~10k pairs — still candidate-bounded work).

    Scale shape: the pair table is |queries| × (depth_a + depth_b)
    rows BY CONSTRUCTION — never the corpus. Text attachment is two
    joins: queries (eval-split-sized, broadcast) and the corpus
    (candidate ids broadcast INTO the corpus scan, so the big table
    streams through one broadcast hash join and only candidate rows
    survive). The final cut is a per-query window over ≤depth rows.
    Determinism: score rounds to 6dp BEFORE ranking; ties break by
    doc id.

    Returns (query_id, doc_id, cross_score 6dp, rank 1..k).
    """
    scorer = scorer or cross_score_token_jaccard
    cand = candidates.select(
        F.col(query_id_col).alias("query_id"), F.col(id_col).alias("doc_id")
    ).distinct()
    q = query_texts.select(
        F.col(query_id_col).alias("query_id"), F.col(text_col).alias("__q_text")
    )
    d = doc_texts.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__d_text")
    )
    # candidate side broadcast: the corpus streams, candidates filter
    pairs = d.join(F.broadcast(cand.join(F.broadcast(q), "query_id")), "doc_id")
    scored = pairs.select(
        "query_id",
        "doc_id",
        F.round(scorer(F.col("__q_text"), F.col("__d_text")), 6).alias(
            "cross_score"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cross_score"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "cross_score", "rank")
    )
