"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All expressions are JVM builtins (split/regexp/aggregate) — these run in
whole-stage codegen over a single scan of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import spread_small_input, whitespace_tokens

# Tiny stopword list used by the quality heuristic (public/, common).
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2 pre-tokenizer family's shape, re-expressed as a plain regex).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish piece count per document."""
    toks = whitespace_tokens(F.col(text_col))
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
    return df.withColumn("n_tokens", F.size(toks)).withColumn("n_pieces", F.size(pieces))


def _stopword_hits(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features, plus a
    composite quality score in [0,1]."""
    text = F.col(text_col)
    toks = whitespace_tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    avg_tok_len = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, _stopword_hits(toks).cast("double") / n_tokens).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(0.0)
    length_score = F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    score = F.round(
        0.4 * length_score + 0.3 * (1.0 - punct_ratio) + 0.3 * F.least(stop_ratio * 5, F.lit(1.0)),
        6,
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("avg_token_len", F.round(avg_tok_len, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("quality_score", score)
    )


def lang_id_heuristic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword language heuristic: rates of English function
    words vs non-ASCII characters. (Toy by design — the real signal in
    a production pipeline is a model; the *shape* — per-doc scoring via
    codegen'd expressions, no UDF — is the point.)"""
    text = F.col(text_col)
    toks = whitespace_tokens(text)
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    en_rate = _stopword_hits(toks).cast("double") / n_tokens
    non_ascii = F.length(F.regexp_replace(text, r"[\x00-\x7F]", ""))
    non_ascii_rate = F.when(
        F.length(text) > 0, non_ascii.cast("double") / F.length(text)
    ).otherwise(0.0)
    pred = (
        F.when(non_ascii_rate > 0.3, "non_latin")
        .when(en_rate >= 0.05, "en_like")
        .otherwise("other")
    )
    return df.withColumn("en_stopword_rate", F.round(en_rate, 6)).withColumn(
        "pred_lang", pred
    )


def fingerprint(df: DataFrame, text_col: str = "text", prefix_tokens: int = 8) -> DataFrame:
    """Document fingerprint: md5 over the normalized first-N tokens
    (rolling-hash-style shift-resistant prefix signature)."""
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    prefix = F.array_join(F.slice(toks, 1, prefix_tokens), " ")
    return df.withColumn("fingerprint", F.md5(prefix))


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", top_n: int = 3
) -> DataFrame:
    """Top-N characteristic terms per document by TF-IDF
    (tf · ln(N/df_t), lowercased whitespace tokens; ties broken by term
    so the pick is deterministic).

    Shuffle shape at scale: explode → (doc, term) hash aggregate →
    term-level doc-frequency aggregate (the term dictionary is orders
    smaller than the corpus, so its re-join is the cheap side) → one
    window on doc for the top-N cut. The corpus total N is a scalar
    count, not a collected table."""
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    terms = spread_small_input(df).select(F.col(id_col), F.explode(toks).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # Doc frequency from the already-reduced tf table (one row per
    # (doc, term), so a plain count IS the distinct-doc count): both
    # branches then share the same (doc, term) exchange, which Spark
    # dedupes via ReusedExchange — the corpus is tokenized ONCE, where
    # aggregating the raw term stream again would re-explode it.
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.count()
    scored = tf.join(dft, "term").select(
        id_col,
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_t")), 6).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "term", "tfidf", "rank")
    )


def char_bigram_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Shannon entropy (nats) of each document's character-bigram
    distribution — the classic gibberish/compressibility signal that
    catches what word-level rules miss (keyboard mash scores low,
    natural prose ~high, base64 blobs very high).

    Explode bigrams via sequence→transform (pure array codegen), count
    per (doc, bigram), then H = ln(n) − Σ c·ln(c)/n per doc — two
    map-side-combined shuffles, state bounded by the per-doc distinct
    bigram count. Documents shorter than 2 chars have no bigrams and
    produce no output row.

    Measured plan choice: a zero-shuffle per-row variant (array_sort +
    run-boundary filter + aggregate fold) measured 9.2 s warm at sf0.1
    vs ~0.9 s for this formulation (with the small-input spread; ~3.7 s
    single-core without) — Spark higher-order lambdas are interpreted,
    while explode feeds whole-stage-codegen hash aggregation. The two
    map-side-combined shuffles are the cheaper currency."""
    t = F.lower(F.col(text_col))
    # sequence(1, 0) would count DOWN in Spark; guard short docs with
    # an explicit empty array instead.
    grams = F.when(
        F.length(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 1),
            lambda i: t.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # per-char expansion is the CPU-dense step: spread a single-split
    # input across cores first (no-op at real scale)
    ex = spread_small_input(df).select(F.col(id_col), F.explode(grams).alias("__g"))
    counts = ex.groupBy(id_col, "__g").agg(F.count(F.lit(1)).alias("__c"))
    return counts.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_bigrams"),
        F.round(
            F.log(F.sum("__c"))
            - F.sum(F.col("__c") * F.log("__c")) / F.sum("__c"),
            6,
        ).alias("entropy"),
    )


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic text normalization for corpus preprocessing:
    lowercase, strip characters outside a conservative keep-set
    (ascii letters, digits, basic punctuation ``.,!?'- ``), collapse
    whitespace runs, trim. Emits ``norm_text`` plus audit columns
    ``n_removed_chars`` (characters dropped by the keep-set filter) and
    ``changed``.

    Pure codegen expressions (lower/regexp_replace/length) over one
    scan — the normalize step costs what the scan costs at any scale.
    The regexes use only plain character classes so any SQL engine
    (RE2 or Java regex) replays them byte-for-byte.

    NULL body normalizes as the empty body (the engine-wide
    tokenize-boundary invariant): norm_text '', 0 removed chars,
    changed=false — never a null audit row, whose nullable ints would
    render differently through the driver's pandas hash the first
    time a whole group is null-bodied.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lowered = F.lower(text)
    kept = F.regexp_replace(lowered, r"[^a-z0-9.,!?' -]", "")
    collapsed = F.trim(F.regexp_replace(kept, r"  +", " "))
    return (
        df.withColumn("norm_text", collapsed)
        .withColumn("n_removed_chars", F.length(lowered) - F.length(kept))
        .withColumn("changed", F.col("norm_text") != text)
    )


def tfidf_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """L2-normalized TF-IDF postings (id, term, w) with a document-
    frequency cutoff: terms present in more than ``max_df_ratio`` of
    the corpus are dropped BEFORE any pairwise work. The cutoff is the
    scale dial of every sparse-similarity join — per-term work is
    |postings_t|², so the hottest (least informative) terms are exactly
    the ones that would blow the join up. Norms are computed over the
    PRUNED vector, so downstream dot products are exact cosines of the
    kept-term space (deterministic and SQL-replayable, vs the common
    pre-prune-norm approximation)."""
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    terms = spread_small_input(df).select(F.col(id_col), F.explode(toks).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # Same ReusedExchange trick as tfidf_top_terms: df_t from tf, so
    # the tokenize+explode pass runs once, not per branch.
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.count()
    kept = dft.filter(F.col("df_t") <= F.lit(max_df_ratio * n_docs))
    w = tf.join(kept, "term").select(
        id_col,
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_t"))).alias("__w"),
    )
    norm = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__n"))
    return w.join(norm, id_col).select(
        id_col, "term", (F.col("__w") / F.col("__n")).alias("w")
    )


def sparse_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sim: float = 0.1,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """All-pairs sparse cosine similarity via a term-postings self-join
    (the classic IR formulation): cos(a,b) = Σ_t w_at·w_bt over shared
    terms, computed by joining normalized postings on term and summing
    per pair. The complement of the dense-embedding ANN paths — this is
    how similarity joins run when vectors are sparse (text, tags,
    n-grams).

    Scale shape: shuffle keyed on term; per-term cost is |postings_t|²
    bounded by the ``max_df_ratio`` cutoff (tfidf_postings) — never a
    corpus cross product. Pairs sharing ONLY pruned terms score 0 and
    are absent, by construction."""
    # The postings table is consumed by BOTH sides of the self-join;
    # persist it (MEMORY_AND_DISK) so the tokenize→tf→df→normalize
    # lineage runs once, not twice — the same trade ngram_jaccard_pairs
    # makes for its shingle sets.
    p = tfidf_postings(df, id_col, text_col, max_df_ratio).persist()
    a = p.select(F.col(id_col).alias("id_a"), "term", F.col("w").alias("wa"))
    b = p.select(F.col(id_col).alias("id_b"), "term", F.col("w").alias("wb"))
    return (
        a.join(b, on="term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        # Round BEFORE the threshold: the cut is then taken on a value
        # both engines agree on bit-for-bit, so float summation-order
        # noise can't flip membership at the boundary.
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= min_sim)
        .select("id_a", "id_b", "cos_sim")
    )


# Outlier threshold on the rounded per-token negative log-likelihood,
# shared with the DuckDB oracle (single-sourced constant). ln(V) for a
# ~2k-word synthetic vocab is ~7.6, so 7.0 marks docs dominated by
# rare/garbage tokens without tripping on ordinary prose.
UNIGRAM_NLL_OUTLIER = 7.0


def unigram_nll(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram-LM negative log-likelihood — the CCNet-style
    perplexity proxy used to filter gibberish/outlier documents when no
    external LM is available: train a unigram model ON the corpus
    (p(t) = count(t) / total_tokens) and score each document by
    nll = −(Σ_t tf_dt · ln p(t)) / dl. High nll ⇒ the document is made
    of corpus-rare tokens (boilerplate headers score low, keyboard mash
    and foreign-script docs score high).

    Scale shape: one tokenize→(doc,term) aggregate; the unigram table
    (corpus vocabulary) re-joins the postings on term — the dictionary
    is orders smaller than the corpus, same shape as tfidf_top_terms.
    The corpus total is a bounded scalar. Zero-token documents have no
    model evidence: nll 0.0, never NULL (the engine-wide invariant —
    nullable floats render differently through the driver's pandas
    hash, and "no tokens" is a fact, not a missing observation).

    Returns (id, n_tokens, nll, is_outlier) with nll rounded to 6dp
    BEFORE the threshold flag so both engines flag the same rows.
    """
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    terms = spread_small_input(df).select(F.col(id_col), F.explode(toks).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    unigrams = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    # Corpus token total from ONE column-pruned scan (sum of per-row
    # token counts — no explode, no shuffle): Σ size(tokens) ≡ Σ ct,
    # without running the tokenize→tf→unigram pipeline twice.
    total = df.agg(F.sum(F.size(toks))).first()[0] or 0
    scored = (
        tf.join(unigrams, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("dl"),
            F.sum(-F.col("tf") * F.log(F.col("ct") / F.lit(float(total)))).alias("__nll_sum"),
        )
        .select(
            id_col,
            F.col("dl").alias("n_tokens"),
            F.round(F.col("__nll_sum") / F.col("dl"), 6).alias("nll"),
        )
    )
    # Left join back so zero-token docs appear with (0, 0.0, false).
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("nll", F.lit(0.0)).alias("nll"),
            (F.coalesce("nll", F.lit(0.0)) > F.lit(UNIGRAM_NLL_OUTLIER)).alias(
                "is_outlier"
            ),
        )
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """First BPE merge round over the corpus: frequency of every
    adjacent character pair inside lowercased alphabetic words — the
    primitive of tokenizer training (each real BPE round merges the top
    pair into a new symbol and recounts; the recount is this same job
    re-run with the merged symbol, a bounded driver loop like
    PageRank's).

    Scale shape: per-row char expansion (explode words → explode the
    L−1 substrings) feeds a hash aggregate whose key space is ≤26²
    pairs — map-side combine collapses everything before the exchange,
    so the shuffle is O(pairs × partitions) regardless of corpus size.
    Counting is exact integer arithmetic: no float drift possible.

    Returns (pair, n, rank): the top-``top_n`` pairs, ties broken by
    pair text so the cut is deterministic.
    """
    words = spread_small_input(df).select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("w")
    )
    pairs = (
        # sequence(1, L-1) needs L >= 2 (Spark sequences DESCEND when
        # start > stop, so an unguarded length-1 word would emit [1, 0]).
        words.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.substring(F.col("w"), i, 2),
                )
            ).alias("pair")
        )
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.col("pair"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("pair", "n", "rank")
    )


# PMI collocation defaults — single-sourced here so the DuckDB oracle
# replays the exact same floor and cut.
PMI_MIN_COUNT = 5
PMI_TOP_K = 20


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = PMI_MIN_COUNT,
    top_k: int = PMI_TOP_K,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over STRICT
    adjacent token pairs: PMI(w1,w2) = ln(c12·N / (c1·c2)) where c12
    is the corpus pair count, c1/c2 are the pair-table marginals
    (occurrences as left / right neighbor — so the distribution the
    PMI is computed against is exactly the bigram event space), and
    N = Σc12. The min_count floor kills the hapax-pair noise that
    otherwise owns the top of every PMI list.

    Scale shape: one tokenize→pair explode feeds a dictionary-scale
    pair aggregate; the marginals RE-AGGREGATE the pair table (never
    a second corpus scan); N is a broadcast scalar (1-row cross
    join, the q88 normalizer pattern — no collect). The top-k cut is
    orderBy().limit() — TakeOrderedAndProject (per-partition heap +
    k-row merge) — and the rank window runs over the ≤k survivors
    only (the q94 pattern); a bigram dictionary with a count floor is
    still vocab²-tail-sized on a real corpus, so a single-partition
    sort of it would be the bottleneck at scale. Deterministic
    cross-engine order: 6dp-ROUNDED pmi, then the pair.

    Returns (w1, w2, pair_count, pmi, rank).
    """
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs_arr = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda w1, w2: F.struct(w1.alias("w1"), w2.alias("w2")),
    )
    pairs = spread_small_input(df).select(F.explode(pairs_arr).alias("pr")).select(
        F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2")
    )
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    left = bi.groupBy("w1").agg(F.sum("pair_count").alias("c1"))
    right = bi.groupBy("w2").agg(F.sum("pair_count").alias("c2"))
    total = bi.agg(F.sum("pair_count").alias("n_total"))
    scored = (
        bi.filter(F.col("pair_count") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .withColumn(
            # All-double arithmetic: c1·c2 as bigint would overflow at
            # corpus scale under ANSI; the double product is the same
            # IEEE expression the oracle replays.
            "pmi",
            F.round(
                F.log(
                    (F.col("pair_count").cast("double") * F.col("n_total").cast("double"))
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                ),
                6,
            ),
        )
    )
    top = scored.orderBy(F.desc("pmi"), "w1", "w2").limit(top_k)
    w = Window.orderBy(F.desc("pmi"), "w1", "w2")
    return top.select(
        "w1", "w2", "pair_count", "pmi", F.row_number().over(w).alias("rank")
    )


# Charset/shape audit patterns — single-sourced with the q149 oracle.
# Mojibake: the classic UTF-8-decoded-as-Latin-1 artifact prefixes
# (Ã/Â/â€ followed by any char) — literal characters, so Java regex
# and RE2 read them identically. Control chars and U+FFFD use \x /
# literal escapes both engines accept.
MOJIBAKE_PATTERN = "Ã.|â€.|Â."
CTRL_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
NON_ASCII_PATTERN = r"[^\x00-\x7f]"
UPPER_TOKEN_PATTERN = "^[A-Z]{2,}$"
DIGIT_TOKEN_PATTERN = "^[0-9]+$"


def charset_audit(df: DataFrame, text_col: str = "text", group_col: str = "source") -> DataFrame:
    """Per-source charset/shape audit — the encoding-health pass a
    crawl-scale curation pipeline runs before anything tokenizes
    (ftfy-class detection, re-expressed as codegen regexes): doc-level
    flags for mojibake artifacts (UTF-8 read as Latin-1: Ã©/â€™/Â·
    prefixes), raw control characters, U+FFFD replacement chars and
    any non-ASCII byte, plus token-shape rates (ALL-CAPS and all-digit
    token fractions — the shouting/table-dump signal). ONE corpus scan
    into a map-side-combining per-source aggregate; nothing shuffles
    but the |sources| dictionary. NULL text = zero tokens, no flags
    (the whitespace_tokens invariant). Token fractions are
    corpus-level per source (Σ hits / Σ tokens), not doc means, so
    empty docs can't skew them; a source with zero tokens reads 0.0."""
    text = F.col(text_col)
    toks = whitespace_tokens(text)
    n_upper = F.size(F.filter(toks, lambda t: t.rlike(UPPER_TOKEN_PATTERN)))
    n_digit = F.size(F.filter(toks, lambda t: t.rlike(DIGIT_TOKEN_PATTERN)))
    flag = lambda pat: F.when(text.rlike(pat), 1).otherwise(0)  # noqa: E731
    per_doc = df.select(
        F.col(group_col).alias("source"),
        F.size(toks).alias("__nt"),
        n_upper.alias("__nu"),
        n_digit.alias("__nd"),
        flag(MOJIBAKE_PATTERN).alias("__moji"),
        flag(CTRL_PATTERN).alias("__ctrl"),
        flag("�").alias("__repl"),
        flag(NON_ASCII_PATTERN).alias("__nonascii"),
    )
    tok_frac = lambda hits: F.round(  # noqa: E731
        F.when(
            F.sum("__nt") > 0,
            F.sum(hits).cast("double") / F.sum("__nt").cast("double"),
        ).otherwise(0.0),
        6,
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__moji").cast("bigint").alias("n_mojibake_docs"),
        F.sum("__ctrl").cast("bigint").alias("n_ctrl_docs"),
        F.sum("__repl").cast("bigint").alias("n_replacement_docs"),
        F.sum("__nonascii").cast("bigint").alias("n_non_ascii_docs"),
        tok_frac("__nu").alias("upper_token_frac"),
        tok_frac("__nd").alias("digit_token_frac"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — the RAG / context-window prep
    step: fixed ``chunk_tokens``-token windows advancing by
    ``chunk_tokens - overlap`` (so consecutive chunks share ``overlap``
    tokens and no retrieval-relevant span is ever split across a hard
    boundary). Chunk starts at every stride multiple below the token
    count, so the tail chunk may be short (>= 1 token); empty/null
    docs produce no chunks (the engine-wide zero-token invariant).

    Emits (id, chunk_id, start_tok, n_chunk_tokens, chunk_fp) with the
    chunk content as a 15-hex md5 fingerprint — the join key downstream
    chunk-level dedup/retrieval actually needs — rather than
    re-materializing text (at 100 TB the chunk table with inline text
    is ~(1 + overlap/stride)× the corpus; fingerprints keep it narrow,
    and the (id, start_tok) pair reconstructs any chunk on demand).

    One scan, narrow posexplode of a per-doc index sequence, zero
    shuffles and zero joins — chunking stays entirely map-side.
    """
    if chunk_tokens < 1 or not 0 <= overlap < chunk_tokens:
        raise ValueError("chunk_documents: need chunk_tokens >= 1, 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    base = (
        spread_small_input(df)
        .select(F.col(id_col), whitespace_tokens(F.col(text_col)).alias("__t"))
        .withColumn("__n", F.size("__t"))
        .filter(F.col("__n") > 0)
    )
    idx = base.select(
        id_col,
        "__t",
        "__n",
        F.posexplode(
            F.sequence(F.lit(0), F.floor((F.col("__n") - 1) / stride).cast("int"))
        ).alias("chunk_id", "__i"),
    )
    start = F.col("chunk_id") * stride
    chunk = F.slice("__t", start + 1, chunk_tokens)
    return idx.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.cast("int").alias("start_tok"),
        F.least(F.lit(chunk_tokens), F.col("__n") - start).cast("int").alias("n_chunk_tokens"),
        F.substring(F.md5(F.array_join(chunk, " ").cast("binary")), 1, 15).alias("chunk_fp"),
    )


def token_fertility(
    df: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Tokenizer fertility audit: pieces-per-word by group — the
    standard multilingual tokenizer-fairness diagnostic (a language
    whose fertility is 2× pays 2× the context budget per word, so
    mixture weights set in DOCUMENTS silently under-represent it in
    TOKENS). Whitespace words are the denominator, BPE-ish pieces
    (``BPE_ISH_PATTERN``, the q22 convention) the numerator.

    One narrow scan → per-row two size() counts → |groups|-row hash
    aggregate; zero-word docs carry no fertility evidence and are
    excluded from the ratio but reported in n_docs. avg_fertility is
    the per-DOC mean ratio; corpus_fertility the token-weighted ratio
    (they diverge when long docs tokenize differently than short —
    that gap is itself the audit signal). NULL text counts as zero
    words AND zero pieces (the whitespace_tokens invariant, applied to
    the piece regex too): a NULL-propagating count would turn a group
    of bodyless docs into a NULL sum, which renders as float drift
    through the driver's pandas hash."""
    counted = token_counts(
        df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit(""))), text_col
    )
    return counted.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_words"),
        F.sum("n_pieces").cast("bigint").alias("total_pieces"),
        F.round(
            F.avg(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("n_pieces").cast("double") / F.col("n_tokens"),
                )
            ),
            6,
        ).alias("avg_fertility"),
        F.round(
            F.sum(F.when(F.col("n_tokens") > 0, F.col("n_pieces")).otherwise(0)).cast(
                "double"
            )
            / F.greatest(
                F.sum(F.when(F.col("n_tokens") > 0, F.col("n_tokens")).otherwise(0)),
                F.lit(1),
            ),
            6,
        ).alias("corpus_fertility"),
    )


def perplexity_buckets(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 3,
) -> DataFrame:
    """CCNet-style head/middle/tail perplexity buckets per group: score
    every document with the corpus unigram NLL (``unigram_nll``, the
    perplexity proxy), then split each group into thirds by score —
    head = most-fluent third, tail = gibberish third. CCNet trains on
    head+middle and drops tail; the output is the per-(group, bucket)
    funnel a curation run needs to set that knob.

    Scale shape — NO corpus sort: scores quantize to an INTEGER
    milli-NLL grid (round(nll·10^decimals)) and collapse to a (group,
    grid-point) histogram (the q157 adaptive-cutoff trick, ≤
    |groups|·10^decimals·range rows); bucket boundaries are integer
    thirds of the group count applied to the histogram's cumulative
    counts, so a bin belongs to the bucket its FIRST document falls in
    (deterministic, replayable integer logic — no percent_rank ties,
    no ntile nondeterminism). All bucket stats stay in EXACT integer
    arithmetic until one final division — the per-bucket mean is a
    round-half-up integer division ((2·Σ + n) div 2n), never a
    float round: an average over a decimal grid lands on decimal
    rounding TIES routinely (e.g. Σ/32 → …375), and Java-vs-C
    round() disagree on ties because one sees the shortest decimal
    rendering and the other the binary double."""
    scale = 10**decimals
    # distinct BEFORE the group join: unigram_nll emits one row per
    # INPUT row (its left-join-back contract), so a duplicated doc_id
    # would otherwise count quadratically (score rows × attribute
    # rows) — the score is per-document, one row per id
    scored = (
        unigram_nll(df, id_col=id_col, text_col=text_col)
        .filter(F.col("n_tokens") > 0)
        .select(id_col, "nll")
        .distinct()
    )
    labeled = scored.join(df.select(id_col, group_col), on=id_col)
    # floor, not round: both engines hold bit-identical `nll` doubles
    # (q107's 6dp contract), and floor is a pure function of the
    # binary double — round() consults the DECIMAL rendering in Java
    # (shortest repr, HALF_UP) but the binary value in C, so the two
    # disagree whenever nll's digits 4-6 are exactly "500" (~1/1000
    # of docs — guaranteed hits at corpus scale).
    # the 1e-4 (in grid units) nudge before floor: nll is a 6dp-rounded
    # double whose BITS can differ by final ulps across engines even
    # when the 10-significant-digit display agrees (summation order
    # inside the NLL aggregate) — a grid-point double sitting an ulp
    # BELOW its decimal value would floor into the lower bin on one
    # engine only. The nudge (1e-7 in NLL units, 10× finer than the
    # score's own 6dp grid) snaps every grid-point double up into its
    # intended bin on both engines.
    hist = labeled.groupBy(
        group_col,
        F.floor(F.col("nll") * scale + 1e-4).cast("bigint").alias("__mnll"),
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy(group_col).orderBy("__mnll")
    cum = hist.select(
        group_col,
        "__mnll",
        "__cnt",
        (F.sum("__cnt").over(w) - F.col("__cnt")).alias("__before"),
        F.sum("__cnt").over(Window.partitionBy(group_col)).alias("__n"),
    )
    bucket = (
        F.when(F.col("__before") * 3 >= F.col("__n") * 2, F.lit("tail"))
        .when(F.col("__before") * 3 >= F.col("__n"), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    agg = (
        cum.withColumn("bucket", bucket)
        .groupBy(group_col, "bucket")
        .agg(
            F.sum("__cnt").cast("bigint").alias("n_docs"),
            F.sum(F.col("__mnll") * F.col("__cnt")).cast("bigint").alias("__sum_mnll"),
            F.max("__mnll").alias("__max_mnll"),
        )
    )
    return agg.select(
        group_col,
        "bucket",
        "n_docs",
        # round-half-up(Σmnll / n) in pure bigint, then one exact
        # IEEE division back to NLL units — identical bits everywhere
        (
            F.expr("(__sum_mnll * 2 + n_docs) DIV (n_docs * 2)") / F.lit(float(scale))
        ).alias("avg_nll"),
        (F.col("__max_mnll") / F.lit(float(scale))).alias("max_nll"),
    )
