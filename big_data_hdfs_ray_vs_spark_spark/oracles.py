"""DuckDB oracle SQL for every oracle-expressible query in queries.py.

Each statement replays the Spark query's exact semantics (same formulas,
same rounding, same aliases) against the same parquet tables, which the
driver pre-registers as DuckDB views. EVERY registry query has an entry:
iterative algorithms unroll as CTE chains (_pagerank_sql,
_lloyd_kmeans_ctes), sequential recurrences replay as recursive CTEs
(q33) or prefix window aggregates (q34), and hash-dependent operators
use engine-portable hashes (md5 minhash/simhash, literal LSH planes).
"""

from __future__ import annotations

import re

# -- shared fragments -------------------------------------------------------

# Whitespace tokenization identical to functions.whitespace_tokens.
# NULL text tokenizes to [] — same invariant as functions.
# whitespace_tokens (a document without a body has zero tokens, not a
# null-propagating feature row).
_TOKS = r"list_filter(string_split_regex(trim(coalesce({col}, '')), '\s+'), x -> x <> '')"

def _grams_sql(n: int, distinct: bool = True) -> str:
    """Word n-gram SQL over a token list ``t``, identical to
    functions.word_shingles: n-grams for >= n tokens, the whole joined
    text for 1..n-1 tokens, and ZERO grams for ZERO tokens — spelled
    explicitly rather than via the array_to_string([])->NULL +
    list_distinct-drops-NULL coincidence. Single-sourced so the
    three-way fallback can never desynchronize between the shingle
    family (distinct 3-grams) and q53's occurrence-counted 2-grams."""
    joined = " || ' ' || ".join(
        f"t[i+{j}]" if j else "t[i]" for j in range(n)
    )
    core = (
        f"CASE WHEN len(t) >= {n} THEN "
        f"list_transform(range(1, len(t) - {n - 2}), i -> {joined}) "
        "WHEN len(t) > 0 THEN [array_to_string(t, ' ')] "
        "ELSE []::VARCHAR[] END"
    )
    return f"list_distinct({core})" if distinct else core


_SHINGLES = _grams_sql(3)

_STOPWORDS_SQL = "['the','a','an','and','or','of','to','in','is','it']"


def _minhash_cte(num_hashes: int = 12, rows_per_band: int = 2) -> str:
    # One md5 digest feeds TWO signature slots (its 16-hex-char
    # halves), mirroring operators/dedup.py:minhash_bands exactly:
    #   slot 2d   = substr(md5('s{d}:' || x),  1, 16)
    #   slot 2d+1 = substr(md5('s{d}:' || x), 17, 16)
    sigs = ", ".join(
        "list_aggregate(list_transform(s, x -> "
        f"substr(md5('s{i // 2}:' || x), {1 + 16 * (i % 2)}, 16)), 'min') AS s{i}"
        for i in range(num_hashes)
    )
    n_bands = num_hashes // rows_per_band
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS band_key FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"s{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(n_bands)
    )
    toks = _TOKS.format(col="text")
    return (
        f"WITH toks AS (SELECT doc_id, {toks} AS t FROM documents), "
        f"sh AS (SELECT doc_id, {_SHINGLES} AS s FROM toks), "
        f"sig AS (SELECT doc_id, {sigs} FROM sh), "
        f"bands AS ({band_selects})"
    )


def _pagerank_sql(iters: int = 3, damping: float = 0.85) -> str:
    ctes = [
        "edges AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges))",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "s0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS score FROM nodes)",
    ]
    for i in range(1, iters + 1):
        prev = f"s{i - 1}"
        ctes.append(
            f"s{i} AS (SELECT nd.node, (1 - {damping}) / (SELECT n FROM nn) + "
            f"COALESCE(c.contrib, 0) AS score FROM nodes nd LEFT JOIN ("
            f"SELECT e.dst AS node, sum(s.score * {damping} / d.outdeg) AS contrib "
            f"FROM edges e JOIN {prev} s ON s.node = e.src "
            f"JOIN deg d ON d.src = e.src GROUP BY e.dst) c ON c.node = nd.node)"
        )
    return (
        "WITH " + ", ".join(ctes) + f" SELECT node, round(score, 8) AS score FROM s{iters}"
    )


def _simhash_sql(max_hamming: int = 6) -> str:
    """Replays operators/dedup.py:simhash64 (md5_hash60 token hash) +
    simhash_near_pairs bit-for-bit: 60-bit md5 token hash, per-bit
    +1/-1 votes, banded 8-bit blocks, pigeonhole bucket join, hamming
    filter. Bits 60-63 of the 60-bit hash are always 0, so only 60
    vote columns are needed."""
    n_blocks = next(n for n in (4, 8, 16) if n > max_hamming)
    width = 64 // n_blocks
    mask = (1 << width) - 1
    toks = _TOKS.format(col="text")
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(60)
    )
    sim = " | ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << {i})"
        for i in range(60)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS t FROM documents
), h AS (
  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h FROM tok
), votes AS (
  SELECT doc_id, {votes} FROM h GROUP BY doc_id
), sim AS (
  SELECT doc_id, {sim} AS simhash FROM votes
), banded AS (
  SELECT doc_id, simhash, blk, (simhash >> (blk * {width})) & {mask} AS key
  FROM sim, (SELECT unnest(range(0, {n_blocks})) AS blk)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
    a.simhash AS sa, b.simhash AS sb
  FROM banded a
  JOIN banded b ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def _lsh_ann_sql(planes: int = 8, dim: int = 64, k: int = 10) -> str:
    """Replays q28 exactly: the ±1 plane matrix comes from the SAME
    pure-Python generator the Spark query uses (similarity.plane_matrix),
    embedded as literal arrays; bucket = sign-bit sum; top-k by cosine
    inside the query vector's bucket."""
    from .operators.similarity import plane_matrix

    m = plane_matrix(planes, dim)
    rows = ["[" + ", ".join(f"{float(s):.1f}" for s in row) + "]" for row in m]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {rows[p]}) >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes)
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE embedding IS NOT NULL),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0),
cand AS (SELECT vec_id, v FROM b WHERE bucket = (SELECT qb FROM q)),
s AS (SELECT vec_id,
  list_dot_product(v, (SELECT qv FROM q))
  / (sqrt(list_dot_product(v, v))
     * sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))) AS cos
FROM cand
WHERE list_dot_product(v, v)
      * list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)) > 0)
SELECT vec_id, round(cos, 6) AS cos_sim FROM s ORDER BY cos DESC, vec_id LIMIT {k}
"""


def _lloyd_kmeans_cte_list(
    k: int,
    iters: int,
    vec_expr: str,
    train_limit: int | None = None,
    prefix: str = "",
    where: str = "embedding IS NOT NULL",
) -> list[str]:
    """CTE list for one Lloyd fit (see _lloyd_kmeans_ctes). ``prefix``
    namespaces every CTE so several fits (the PQ per-subspace trains)
    can share one WITH clause; ``where`` is the feats row filter."""
    p = prefix
    assign = (
        "(SELECT vec_id, v, cluster FROM ("
        "SELECT f.vec_id, f.v, c.cluster, row_number() OVER ("
        "PARTITION BY f.vec_id ORDER BY list_distance(f.v, c.c), c.cluster) AS rn "
        "FROM {src} f CROSS JOIN {cen} c) WHERE rn = 1)"
    )
    ctes = [
        f"{p}feats AS (SELECT vec_id, {vec_expr} AS v FROM embeddings WHERE {where})",
        f"{p}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c "
        f"FROM (SELECT * FROM {p}feats ORDER BY vec_id LIMIT {k}))",
    ]
    train_src = f"{p}feats"
    if train_limit is not None:
        ctes.insert(
            1,
            f"{p}train AS (SELECT * FROM {p}feats ORDER BY vec_id LIMIT {train_limit})",
        )
        train_src = f"{p}train"
    for i in range(1, iters + 1):
        ctes.append(f"{p}a{i} AS " + assign.format(src=train_src, cen=f"{p}c{i - 1}"))
        ctes.append(
            f"{p}m{i} AS (SELECT cluster, pos, avg(x) AS mx FROM ("
            f"SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM {p}a{i}"
            f") GROUP BY cluster, pos)"
        )
        ctes.append(
            f"{p}c{i} AS (SELECT p.cluster, coalesce(n.c, p.c) AS c FROM {p}c{i - 1} p "
            f"LEFT JOIN (SELECT cluster, array_agg(mx ORDER BY pos) AS c FROM {p}m{i} "
            f"GROUP BY cluster) n ON n.cluster = p.cluster)"
        )
    ctes.append(f"{p}afin AS " + assign.format(src=f"{p}feats", cen=f"{p}c{iters}"))
    return ctes


def _lloyd_kmeans_ctes(
    k: int, iters: int, vec_expr: str, train_limit: int | None = None
) -> str:
    """Unrolls plans/kmeans.py:lloyd_kmeans exactly (like _pagerank_sql
    unrolls the power iteration): c0 = first-k-by-id init; each round
    assigns by nearest centroid (ties → lowest cluster) and recomputes
    element-wise means (empty clusters keep the old centroid); afin is
    the assignment under the FINAL centroids over ALL rows.

    train_limit replays lloyd_kmeans_sample: the fit iterations run
    over only the train_limit smallest-id rows (the bounded FAISS-style
    quantizer sample); final assignment still covers everything."""
    return "WITH " + ",\n".join(
        _lloyd_kmeans_cte_list(k, iters, vec_expr, train_limit)
    )


_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)


def _ivf_ann_sql(nprobe: int = 4, k: int = 10) -> str:
    """Replays q30 end-to-end: lloyd fit, centroid ranking by cosine to
    the query vector, nprobe-list candidate filter, in-list top-k.
    The quantizer shape (k, iters, training-sample size) comes from the
    SAME constant the Spark query trains with — never restate it here."""
    from .plans.kmeans import IVF_QUANTIZER

    k_lists = IVF_QUANTIZER["k"]
    iters = IVF_QUANTIZER["iters"]
    qv = "(SELECT v FROM feats WHERE vec_id = 0)"
    return (
        _lloyd_kmeans_ctes(
            k_lists,
            iters,
            "CAST(embedding AS DOUBLE[])",
            train_limit=IVF_QUANTIZER["sample_n"],
        )
        + f""",
ranked AS (SELECT cluster, {_COS.format(a="c", b=qv)} AS ccos FROM c{iters}),
probe AS (SELECT cluster FROM ranked ORDER BY ccos DESC, cluster LIMIT {nprobe}),
cand AS (SELECT vec_id, v FROM afin WHERE cluster IN (SELECT cluster FROM probe)),
s AS (SELECT vec_id, {_COS.format(a="v", b=qv)} AS cos FROM cand
      WHERE list_dot_product(v, v) * list_dot_product({qv}, {qv}) > 0)
SELECT vec_id, round(cos, 6) AS cos_sim FROM s ORDER BY cos DESC, vec_id LIMIT {k}
"""
    )


def _quality_features_cte() -> str:
    """Per-doc quality features identical to operators.text.quality_features."""
    toks = _TOKS.format(col="text")
    stop_hits = f"len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, lower(x))))"
    return f"""
WITH toks AS (
  SELECT doc_id, source, text, {toks} AS t FROM documents
), feat AS (
  SELECT doc_id, source,
    len(t) AS n_tokens,
    length(text) AS n_chars,
    length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct,
    {stop_hits} AS stop_hits
  FROM toks
), q AS (
  SELECT doc_id, source, n_tokens,
    CASE WHEN n_tokens > 0
         THEN round(CAST(stop_hits AS DOUBLE) / n_tokens, 6) ELSE 0.0 END AS stopword_ratio,
    round(0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE) / n_chars ELSE 0.0 END)
        + 0.3 * least(CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens ELSE 0.0 END * 5, 1.0),
      6) AS quality_score
  FROM feat
)"""


ORACLES: dict[str, str] = {
    "q01_pricing_summary": """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 4) AS avg_qty,
  round(avg(l_extendedprice), 4) AS avg_price,
  round(avg(l_discount), 6) AS avg_disc,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '2025-06-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    "q02_region_revenue": """
SELECT r_name,
  round(sum(o_totalprice), 2) AS revenue,
  CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    "q03_topk_orders": """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
    "q04_quality_stats": """
SELECT
  CAST(count(*) AS BIGINT) AS total_rows,
  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
  CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_value,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
  -- exact decimal sum + portable floor-half-up (see functions.portable_round).
  -- NaN guard mirrors Spark, whose CAST(NaN AS DECIMAL) yields NULL
  -- (sum skips it); DuckDB's cast would RAISE instead.
  floor(CAST(sum(CASE WHEN NOT isnan(value) THEN CAST(value AS DECIMAL(18,6)) END)
             AS DOUBLE) / count(*) * 10000 + 0.5)
    / 10000 AS avg_value,
  round(max(value), 4) AS max_value,
  round(min(value), 4) AS min_value
FROM events
""",
    "q05_bucketize": """
SELECT CASE WHEN value < 10.0 THEN 'low' WHEN value < 100.0 THEN 'mid' ELSE 'high' END AS value_bucket,
  CAST(count(*) AS BIGINT) AS count,
  round(avg(value), 4) AS avg_value
FROM events
GROUP BY 1
""",
    "q06_group_2keys": """
SELECT event_type,
  CASE WHEN value < 10.0 THEN 'low' WHEN value < 100.0 THEN 'mid' ELSE 'high' END AS value_bucket,
  CAST(count(*) AS BIGINT) AS count,
  round(avg(value), 4) AS avg_value,
  round(avg(user_id), 4) AS avg_user
FROM events
GROUP BY 1, 2
""",
    "q07_cleansing": """
WITH k AS (
  SELECT *, (value BETWEEN 0 AND 500) AND props IS NOT NULL AND user_id >= 0 AS kept
  FROM events
)
SELECT
  CAST(count(*) AS BIGINT) AS total_rows,
  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_rows,
  CAST(count(*) - sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS removed_rows,
  round(avg(CASE WHEN kept THEN value END), 4) AS kept_avg_value
FROM k
""",
    "q08_composite_scores": """
WITH scored AS (
  SELECT
    round(l_extendedprice * (1 - l_discount) / 100, 3) AS revenue_score,
    round(l_quantity * (1 + l_tax) / 10, 3) AS volume_score,
    round((1 - l_discount) * l_quantity, 3) AS net_qty_score
  FROM lineitem
)
SELECT
  CAST(count(*) AS BIGINT) AS final_count,
  round(avg(revenue_score), 4) AS avg_revenue_score,
  round(avg(volume_score), 4) AS avg_volume_score,
  round(avg(net_qty_score), 4) AS avg_net_qty_score,
  round(max(revenue_score), 3) AS max_revenue_score,
  round(max(volume_score), 3) AS max_volume_score,
  round(max(net_qty_score), 3) AS max_net_qty_score
FROM scored
""",
    "q09_union_distinct": """
SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM (
  SELECT DISTINCT node FROM (
    SELECT o_custkey AS node FROM orders
    UNION ALL
    SELECT c_custkey AS node FROM customer
  )
)
""",
    "q10_window_rank": """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
""",
    "q11_window_running": """
SELECT event_id, user_id,
  round(sum(value) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
FROM events
""",
    "q12_out_degrees": """
WITH d AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem)
SELECT src AS node, CAST(count(*) AS BIGINT) AS out_degree FROM d GROUP BY src
""",
    "q13_pagerank": _pagerank_sql(iters=3, damping=0.85),
    "q14_triangles": """
WITH raw AS (SELECT l_partkey AS src, l_suppkey AS dst FROM lineitem),
d AS (SELECT DISTINCT src, dst FROM raw)
SELECT CAST(count(*) AS BIGINT) AS triangles
FROM raw e
JOIN d a ON a.src = e.src
JOIN d b ON b.src = e.dst AND b.dst = a.dst
""",
    "q15_kmeans": _lloyd_kmeans_ctes(3, 4, "CAST(embedding[1:8] AS DOUBLE[])")
    + """
SELECT cluster, CAST(count(*) AS BIGINT) AS count
FROM afin GROUP BY cluster ORDER BY cluster
""",
    "q16_dedup_exact": """
SELECT
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
  CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dupes
FROM documents
""",
    "q17_minhash_pairs": _minhash_cte()
    + """
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
""",
    "q18_jaccard_consecutive": (
        "WITH toks AS (SELECT doc_id, "
        + _TOKS.format(col="text")
        + " AS t FROM documents), "
        + f"sh AS (SELECT doc_id, {_SHINGLES} AS s FROM toks) "
        + """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  -- zero union (both bodies empty -> zero shingles): jaccard is 0.0
  -- by the engine's convention, not a 0/0
  round(CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
             THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
             ELSE 0.0 END, 6) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
"""
    ),
    "q19_similarity_topk": """
WITH q AS (
  SELECT CAST(unnest(embedding) AS DOUBLE) AS qv, generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id = 0
), e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS ev, generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id <> 0
), s AS (
  SELECT e.vec_id,
    sum(e.ev * q.qv) AS dp,
    sqrt(sum(e.ev * e.ev)) AS ne,
    sqrt(sum(q.qv * q.qv)) AS nq
  FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id
)
SELECT vec_id, round(dp / (ne * nq), 6) AS cos_sim
FROM s WHERE ne * nq > 0  -- engine cosine is NULL on zero vectors (sorts last)
ORDER BY dp / (ne * nq) DESC, vec_id LIMIT 10
""",
    "q20_text_quality": _quality_features_cte()
    + """
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  -- exact sums + portable floor-half-up (see functions.portable_round)
  floor(sum(n_tokens) / count(*) * 10000 + 0.5) / 10000 AS avg_tokens,
  floor(CAST(sum(CAST(stopword_ratio AS DECIMAL(18,6))) AS DOUBLE) / count(*)
    * 1000000 + 0.5) / 1000000 AS avg_stopword_ratio,
  floor(CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / count(*)
    * 1000000 + 0.5) / 1000000 AS avg_quality
FROM q GROUP BY source
""",
    "q21_lang_id": (
        "WITH toks AS (SELECT doc_id, lang, text, "
        + _TOKS.format(col="text")
        + " AS t FROM documents), f AS ("
        + f"SELECT lang, CAST(len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, lower(x)))) AS DOUBLE)"
        + " / greatest(len(t), 1) AS en_rate,"
        + " CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS non_ascii_rate"
        + " FROM toks)"
        + """
SELECT lang,
  CASE WHEN non_ascii_rate > 0.3 THEN 'non_latin'
       WHEN en_rate >= 0.05 THEN 'en_like'
       ELSE 'other' END AS pred_lang,
  CAST(count(*) AS BIGINT) AS count
FROM f GROUP BY 1, 2
"""
    ),
    "q22_token_counts": (
        "WITH f AS (SELECT len("
        + _TOKS.format(col="text")
        + ") AS n_tokens, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_pieces FROM documents)"
        + """
SELECT
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST(sum(n_pieces) AS BIGINT) AS total_pieces,
  round(avg(n_tokens), 4) AS avg_tokens
FROM f
"""
    ),
    "q23_fingerprint": (
        "WITH toks AS (SELECT doc_id, source, "
        + _TOKS.format(col="lower(text)")
        + " AS t FROM documents), fp AS (SELECT doc_id, source, "
        # coalesce: array_to_string([]) is NULL in DuckDB but Spark's
        # array_join([]) is '' — a zero-token doc fingerprints as
        # md5('') on both sides.
        "md5(coalesce(array_to_string(list_slice(t, 1, 8), ' '), '')) AS fingerprint FROM toks)"
        + """
SELECT source,
  CAST(count(DISTINCT fingerprint) AS BIGINT) AS n_fingerprints,
  CAST(count(*) AS BIGINT) AS n_docs
FROM fp GROUP BY source
"""
    ),
    "q24_simhash_pairs": _simhash_sql(max_hamming=6),
    "q25_sessionize": """
WITH o AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, value, ts,
    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM o
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
  CAST(count(*) AS BIGINT) AS n_events,
  round(sum(value), 4) AS sum_value,
  round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 2) AS duration_sec
FROM s GROUP BY user_id, session_idx
""",
    "q26_windowed_events": """
SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS window_start_s,
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  -- exact decimal sum; avg via portable floor-half-up on the exact-sum
  -- quotient (see q26_windowed_events docstring: round() splits engines
  -- on exact 4-decimal midpoints)
  -- NaN guard mirrors Spark's CAST(NaN AS DECIMAL) => NULL (sum skips)
  round(CAST(sum(CASE WHEN NOT isnan(value) THEN CAST(value AS DECIMAL(18,6)) END)
             AS DOUBLE), 4) AS sum_value,
  floor(CAST(sum(CASE WHEN NOT isnan(value) THEN CAST(value AS DECIMAL(18,6)) END)
             AS DOUBLE) / count(*) * 10000 + 0.5)
    / 10000 AS avg_value
FROM events GROUP BY 1, 2
""",
    # The norm>0 guards mirror the engine's zero-vector drop (cosine is
    # undefined there; DuckDB would yield NaN, and NaN >= t is TRUE).
    "q27_embedding_neardup": """
WITH nz AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
    AND sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[]))) > 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
FROM nz a
JOIN nz b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.35
""",
    "q28_lsh_ann": _lsh_ann_sql(planes=4, dim=64, k=10),
    "q30_ivf_ann": _ivf_ann_sql(nprobe=4, k=10),
    # q29's media table is synthesized in-plan from spark.range (see
    # operators/multimodal.py:synthetic_media): payload = utf-8 bytes of
    # 'media-payload-' || lpad(id, 16, '0'), images are id % 3 == 0, and
    # the stub kernel's mean_byte is the mean of the payload bytes (all
    # ASCII, so unicode(char) == byte value) and feat is always 8 floats.
    "q29_media_features": """
WITH ids AS (SELECT unnest(range(0, 300)) AS id),
img AS (SELECT id FROM ids WHERE id % 3 = 0),
p AS (SELECT id, 'media-payload-' || lpad(CAST(id AS VARCHAR), 16, '0') AS s FROM img)
SELECT id AS media_id,
  CAST(id % 640 + 1 AS INT) AS width,
  CAST(id % 480 + 1 AS INT) AS height,
  round(CAST(list_aggregate(list_transform(range(1, length(s) + 1), i -> unicode(s[i])), 'sum') AS DOUBLE)
        / length(s), 6) AS mean_byte,
  CAST(8 AS INT) AS feat_dim
FROM p
""",
    "q31_rollup": """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
  coalesce(l_linestatus, 'ALL') AS linestatus,
  CAST(count(*) AS BIGINT) AS n_rows,
  round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "q32_quantized_packing": (
        "WITH t AS (SELECT source, doc_id, len("
        + _TOKS.format(col="text")
        + ") AS n_tokens FROM documents)"
        + """
SELECT source, doc_id, CAST(n_tokens AS INT) AS n_tokens,
  CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
       / 512.0) AS BIGINT) AS bin_id
FROM t
"""
    ),
    # Greedy first-fit-contiguous packing is a sequential recurrence; in
    # DuckDB it replays exactly as a recursive CTE walking each source
    # stream in doc_id order (same semantics as operators/packing.py:
    # greedy_packing's per-group loop).
    "q33_greedy_packing": (
        "WITH RECURSIVE toks AS (SELECT source, doc_id, len("
        + _TOKS.format(col="text")
        + """) AS n_tokens FROM documents
), t AS (
  SELECT source, doc_id, n_tokens,
    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM toks
), r AS (
  SELECT source, doc_id, n_tokens, rn, CAST(0 AS BIGINT) AS bin_id, n_tokens AS used
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.doc_id, t.n_tokens, t.rn,
    CASE WHEN r.used > 0 AND r.used + t.n_tokens > 512 THEN r.bin_id + 1 ELSE r.bin_id END,
    CASE WHEN r.used > 0 AND r.used + t.n_tokens > 512 THEN t.n_tokens ELSE r.used + t.n_tokens END
  FROM t JOIN r ON t.source = r.source AND t.rn = r.rn + 1
)
SELECT source, bin_id,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM r GROUP BY source, bin_id
"""
    ),
    # The Welford recurrence over the (ts, event_id)-ordered prefix is
    # mathematically the population mean/variance of the prior events,
    # so the oracle replays it with prefix window aggregates (frame
    # ending at 1 PRECEDING). Parameters match q34: k=2, min_obs=5.
    "q34_anomaly_flags": """
WITH o AS (
  SELECT user_id, event_id, value,
    count(*) OVER w AS n_prior,
    avg(value) OVER w AS mean_prior,
    var_pop(value) OVER w AS var_prior
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, round(value, 4) AS value,
  round((value - mean_prior) / sqrt(var_prior), 4) AS zscore
FROM o
WHERE n_prior >= 5 AND var_prior > 0
  AND abs(value - mean_prior) > 2.0 * sqrt(var_prior)
""",
    "q35_customers_without_orders": """
SELECT c_nationkey,
  CAST(count(*) AS BIGINT) AS n_customers,
  round(avg(c_acctbal), 4) AS avg_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
GROUP BY c_nationkey
""",
    "q36_value_percentiles": """
SELECT event_type,
  round(quantile_cont(value, 0.5), 4) AS p50_value,
  round(quantile_cont(value, 0.95), 4) AS p95_value,
  round(avg(value), 4) AS avg_value
FROM (SELECT event_type,
        CASE WHEN NOT isnan(value) THEN value END AS value
      FROM events)
GROUP BY event_type
""",
    "q37_event_pivot": """
SELECT user_id,
  round(sum(value) FILTER (event_type = 'click'), 4) AS sum_click,
  round(sum(value) FILTER (event_type = 'error'), 4) AS sum_error,
  round(sum(value) FILTER (event_type = 'purchase'), 4) AS sum_purchase,
  round(sum(value) FILTER (event_type = 'signup'), 4) AS sum_signup,
  round(sum(value) FILTER (event_type = 'view'), 4) AS sum_view
FROM events GROUP BY user_id
""",
    # q38: the full fuzzy-dedup pipeline; connected components via a
    # recursive transitive-closure CTE (min reachable id == the min-label
    # fixpoint the Spark loop converges to). The first WITH is promoted
    # to WITH RECURSIVE below.
    "q38_dup_clusters": _minhash_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    + """,
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM verified
  UNION
  SELECT id_b AS u, id_a AS v FROM verified
),
reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.node = e.v
),
cc AS (SELECT node AS doc_id, min(lab) AS cluster FROM reach GROUP BY node),
sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM cc GROUP BY cluster)
SELECT cc.doc_id, cc.cluster, s.cluster_size, cc.doc_id = cc.cluster AS is_rep
FROM cc JOIN sizes s ON s.cluster = cc.cluster
""",
    # q39: salted-md5 Bernoulli membership, identical formula to
    # operators/sampling.py:hash_uniform (60-bit hash / 2^60).
    "q39_stratified_sample": """
SELECT doc_id, lang, source
FROM documents
WHERE CAST(('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      / 1152921504606846976.0
    < CASE lang
        WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.3 WHEN 'fr' THEN 0.3
        WHEN 'es' THEN 0.2 WHEN 'zh' THEN 0.1 ELSE 0.0 END
""",
    # q40: prefix window over the shared quality-features CTE replays the
    # quality-ranked cumulative token quota.
    "q40_token_budget": _quality_features_cte()
    + """
SELECT doc_id, source, n_tokens, cum_tokens FROM (
  SELECT doc_id, source, n_tokens,
    -- BIGINT cast is load-bearing: DuckDB's window SUM yields HUGEINT,
    -- which the driver's pandas canonicalization renders "88.0" against
    -- Spark's bigint "88" (equal values, hash mismatch — r2 verdict).
    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM q
) WHERE cum_tokens <= 800
""",
    # q41: same salted 60-bit md5 as sampling.deterministic_shuffle;
    # shard = hash % 16, pos = in-shard rank by (hash, doc_id).
    "q41_deterministic_shuffle": """
WITH h AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM documents
)
SELECT doc_id, hv % 16 AS shard,
  CAST(row_number() OVER (PARTITION BY hv % 16 ORDER BY hv, doc_id) AS INTEGER) AS pos
FROM h
""",
    # q42: floor(weight) copies + one hash-decided fractional copy,
    # expanded with generate_series (the SQL spelling of explode(sequence)).
    "q42_mixture_weights": """
WITH w AS (
  SELECT doc_id, lang,
    CASE lang WHEN 'en' THEN 2.3 WHEN 'de' THEN 1.0 WHEN 'fr' THEN 0.5
              WHEN 'es' THEN 1.5 WHEN 'zh' THEN 0.25 ELSE 0.0 END AS wt,
    CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      / 1152921504606846976.0 AS u
  FROM documents
), n AS (
  SELECT doc_id, lang,
    CAST(floor(wt) AS INTEGER) + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END AS copies
  FROM w
)
SELECT doc_id, lang, CAST(unnest(generate_series(1, copies)) AS INTEGER) AS copy
FROM n WHERE copies > 0
""",
    # q43: independent formulation of the as-of join — a correlated
    # latest-at-or-before lookup; the engine's union+prefix-window plan
    # must pick the identical row (ties broken by event_id DESC).
    "q43_asof_join": """
SELECT p.event_id, p.user_id, round(p.value, 4) AS purchase_value,
  (SELECT round(c.value, 4) FROM events c
     WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
     ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_value
FROM events p WHERE p.event_type = 'purchase'
""",
    # q44: the range predicate written directly as an inequality join —
    # DuckDB can afford it at sf0.01; the engine's binned equi-join must
    # produce the same half-open-window matches.
    "q44_interval_join": """
SELECT e.event_id AS error_id, CAST(count(*) AS BIGINT) AS n_purchases,
  round(sum(p.value), 4) AS sum_purchase_value
FROM events e JOIN events p
  ON p.event_type = 'purchase'
 AND epoch_us(p.ts) >= epoch_us(e.ts)
 AND epoch_us(p.ts) <  epoch_us(e.ts) + 600000000
WHERE e.event_type = 'error'
GROUP BY e.event_id
""",
    # q45: staged-join formulation (first signup -> first later click ->
    # any later purchase); the engine's chained prefix windows must
    # reach the same three funnel counts.
    "q45_funnel": """
WITH s AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.signup_ts GROUP BY e.user_id
), p AS (
  SELECT DISTINCT e.user_id
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_signup_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_full_funnel
""",
    # q46: same salted 60-bit md5 -> [0,1) as the engine's KMV sketch;
    # estimate (k-1)/kth_min over the k=64 smallest distinct hashes.
    "q46_kmv_distinct": """
WITH h AS (
  SELECT DISTINCT event_type,
    CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
      / 1152921504606846976.0 AS u
  FROM events
), r AS (
  SELECT event_type, u, row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
  FROM h
), s AS (
  SELECT event_type, count(*) AS n_seen, max(CASE WHEN rn = 64 THEN u END) AS kth
  FROM r WHERE rn <= 64 GROUP BY event_type
)
SELECT e.event_type,
  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_exact,
  CAST(CASE WHEN any_value(s.n_seen) < 64 THEN any_value(s.n_seen)
            ELSE round(63 / any_value(s.kth), 0) END AS BIGINT) AS est_distinct
FROM events e JOIN s ON e.event_type = s.event_type
GROUP BY e.event_type
""",
    # q47: tf * ln(N/df_t) over lowercased whitespace tokens, top-3 per
    # doc with the term-ascending tiebreak.
    "q47_tfidf_top_terms": (
        "WITH toks AS (SELECT doc_id, unnest("
        + _TOKS.format(col="lower(text)")
        + """) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dft AS (SELECT term, count(DISTINCT doc_id) AS df_t FROM toks GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, round(tf.tf * ln(n.n_docs / dft.df_t), 6) AS tfidf
  FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN n
)
SELECT doc_id, term, tfidf, CAST(rank AS INTEGER) AS rank FROM (
  SELECT doc_id, term, tfidf,
    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""
    ),
    # q48: pivot-then-melt with a null filter collapses to the plain
    # long-form aggregate — the independent formulation.
    # HAVING mirrors the engine's isNotNull filter on the unpivoted
    # value: a group whose values are ALL null pivots to a null cell
    # and is dropped there.
    "q48_unpivot": """
SELECT user_id, event_type, round(sum(value), 4) AS sum_value
FROM events GROUP BY user_id, event_type
HAVING sum(value) IS NOT NULL
""",
    # q49: RANGE frame over epoch micros; value-defined frames make
    # equal-ts peers unambiguous, no tiebreak needed.
    "q49_trailing_window": """
SELECT event_id, user_id,
  round(sum(value) OVER w, 4) AS trailing_sum,
  CAST(count(*) OVER w AS BIGINT) AS trailing_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
""",
    # q50: the salted join must be row-identical to the plain join —
    # so the oracle is the plain join.
    "q50_salted_join": """
SELECT s.s_nationkey, CAST(count(*) AS BIGINT) AS n_items,
  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
""",
    # q51: same lowercased 3-gram shingles as the minhash oracle; the
    # eval slice is doc_id % 97 == 0.
    "q51_decontaminate": (
        "WITH toks AS (SELECT doc_id, "
        + _TOKS.format(col="lower(text)")
        + " AS t FROM documents), "
        f"sh AS (SELECT doc_id, {_SHINGLES} AS s FROM toks), "
        "ev AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 97 = 0), "
        "tr AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 97 <> 0) "
        "SELECT tr.doc_id, CAST(count(DISTINCT tr.shingle) AS BIGINT) AS n_eval_hits "
        "FROM tr JOIN ev USING (shingle) GROUP BY tr.doc_id "
        "HAVING count(DISTINCT tr.shingle) >= 1"
    ),
    # q52: rule math in unrounded doubles, rounding only on output —
    # identical to the Spark expressions.
    "q52_gopher_quality": (
        "WITH toks AS (SELECT doc_id, "
        + _TOKS.format(col="text")
        + " AS t FROM documents), "
        "feat AS (SELECT doc_id, len(t) AS n_words, "
        "CASE WHEN len(t) > 0 THEN CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE) / len(t) ELSE 0.0 END AS mwl, "
        "CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(t) ELSE 0.0 END AS ar, "
        f"len(list_distinct(list_filter(list_transform(t, x -> lower(x)), x -> list_contains({_STOPWORDS_SQL}, x)))) AS ns "
        "FROM toks) "
        "SELECT doc_id, CAST(n_words AS INT) AS n_words, round(mwl, 6) AS mean_word_len, "
        "round(ar, 6) AS alpha_word_ratio, CAST(ns AS INT) AS n_distinct_stopwords, "
        "(n_words >= 50 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0 "
        "AND ar >= 0.8 AND ns >= 2) AS keep FROM feat"
    ),
    # q53: 2-gram construction mirrors functions.word_shingles(n=2)
    # including the fallbacks (shared _grams_sql helper; occurrences
    # counted, so NOT distinct).
    "q53_repetition": (
        "WITH toks AS (SELECT doc_id, "
        + _TOKS.format(col="lower(text)")
        + " AS t FROM documents), "
        "base AS (SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct, "
        + _grams_sql(2, distinct=False)
        + " AS grams FROM toks), "
        "gc AS (SELECT doc_id, unnest(grams) AS gram FROM base), "
        "cnt AS (SELECT doc_id, gram, count(*) AS c FROM gc GROUP BY 1, 2), "
        "pd AS (SELECT doc_id, max(c) AS topc, sum(c) AS tot FROM cnt GROUP BY 1) "
        "SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens, "
        "round(CASE WHEN b.n_tokens > 0 THEN CAST(b.n_distinct AS DOUBLE) / b.n_tokens ELSE 0.0 END, 6) AS distinct_token_ratio, "
        "round(CASE WHEN pd.tot > 0 THEN CAST(pd.topc AS DOUBLE) / pd.tot ELSE 0.0 END, 6) AS top_bigram_ratio "
        "FROM base b LEFT JOIN pd ON b.doc_id = pd.doc_id"
    ),
    # q54: same RE2-safe patterns and the same replace order
    # (email → ipv4 → phone) as operators.curation.
    "q54_pii_audit": r"""
WITH s AS (SELECT text,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
  len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ni,
  len(regexp_extract_all(text, '\+?\d[\d -]{7,}\d')) AS np,
  regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
    '\+?\d[\d -]{7,}\d', '[PHONE]', 'g') AS red
FROM documents)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(ne) AS BIGINT) AS total_emails,
  CAST(sum(ni) AS BIGINT) AS total_ipv4,
  CAST(sum(np) AS BIGINT) AS total_phones,
  CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
  CAST(sum(length(text) - length(red)) AS BIGINT) AS chars_delta
FROM s
""",
    # q55: chunk arithmetic in integers. Both engines truncate toward
    # zero on integer division (DuckDB's // on INTEGER and Spark's DIV
    # — verified: (-17)//16 = -1 in both), so the chunk counts agree
    # term-for-term; greatest(...,1) additionally floors the count at
    # one chunk for short/empty docs. Do NOT drop the greatest guard
    # on a floor/trunc-reconciliation theory — it is load-bearing for
    # the 0-token row.
    "q55_chunking": (
        "WITH toks AS (SELECT doc_id, "
        + _TOKS.format(col="text")
        + " AS t FROM documents), "
        "base AS (SELECT doc_id, t, greatest((len(t) - 32 + 16 - 1) // 16 + 1, 1) AS nc FROM toks) "
        "SELECT doc_id, CAST(i AS INT) AS chunk_id, "
        "CAST(len(t[i*16+1 : i*16+32]) AS INT) AS n_chunk_tokens, "
        # coalesce: a zero-token doc still yields its one (empty) chunk,
        # and DuckDB's array_to_string([]) is NULL where Spark's
        # array_join([]) is ''
        "coalesce(array_to_string(t[i*16+1 : i*16+32], ' '), '') AS chunk_text "
        "FROM base, unnest(range(nc)) AS u(i)"
    ),
    # q56: doc-frequency over the per-doc DISTINCT 3-gram stream (the
    # _SHINGLES macro already list_distincts), threshold 20.
    "q56_boilerplate": (
        "WITH toks AS (SELECT doc_id, "
        + _TOKS.format(col="lower(text)")
        + " AS t FROM documents), "
        f"sh AS (SELECT doc_id, unnest({_SHINGLES}) AS gram FROM toks), "
        "df AS (SELECT gram FROM (SELECT gram, count(*) AS dfreq FROM sh GROUP BY gram) WHERE dfreq >= 20) "
        "SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        "CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler, "
        "round(CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS boiler_ratio "
        "FROM sh s LEFT JOIN df b ON s.gram = b.gram GROUP BY s.doc_id"
    ),
    # q57: same explicit floor(x/scale + 0.5) half-up as the Spark
    # expression (engine round() .5 behavior differs; floor does not).
    "q57_quantize": """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv FROM embeddings WHERE embedding IS NOT NULL
), s AS (
  SELECT vec_id, vv,
    list_aggregate(list_transform(vv, x -> abs(x)), 'max') AS amax FROM v
), sc AS (
  SELECT vec_id, vv, CASE WHEN amax > 0 THEN amax / 127.0 ELSE 0.0 END AS scale FROM s
), q AS (
  SELECT vec_id, vv, scale,
    CASE WHEN scale > 0
      THEN list_transform(vv, x -> CAST(floor(x / scale + 0.5) AS INT))
      ELSE list_transform(vv, x -> 0) END AS qvec
  FROM sc
), d AS (
  SELECT vec_id, vv, scale, qvec,
    list_transform(qvec, qi -> CAST(qi AS DOUBLE) * scale) AS dq
  FROM q
)
SELECT vec_id, round(scale, 6) AS scale,
  CAST(list_aggregate(list_transform(qvec, x -> abs(x)), 'sum') AS BIGINT) AS qvec_l1,
  round(list_aggregate(list_transform(range(1, len(vv) + 1), i -> abs(vv[i] - dq[i])), 'max'), 6) AS max_abs_err,
  CASE WHEN scale > 0 THEN round(list_dot_product(vv, dq)
    / (sqrt(list_dot_product(vv, vv)) * sqrt(list_dot_product(dq, dq))), 6)
    ELSE NULL END AS cos_recon
FROM d
""",
}


def _bloom_sql(num_bits: int = 4096, num_hashes: int = 4) -> str:
    """Replay the portable bloom filter exactly: position_i(key) =
    md5-prefix-60-bit hash of 'b{i}:key' mod num_bits; a fact key
    passes iff every one of its positions was set by SOME dim key
    (bits are shared across hash indices — true bloom semantics)."""

    def pos(i: int, key: str) -> str:
        # Two 60-bit positions per digest (hex chars 1-15 / 16-30),
        # mirroring operators/relational.py:_bloom_positions.
        d, off = divmod(i, 2)
        return (
            f"CAST('0x' || substr(md5('b{d}:' || CAST({key} AS VARCHAR)), "
            f"{1 + 15 * off}, 15) AS BIGINT) % {num_bits}"
        )

    dimpos = " UNION ".join(
        f"SELECT {pos(i, 'k')} AS p FROM dim" for i in range(num_hashes)
    )
    checks = " AND ".join(
        f"(({pos(i, 'l_partkey')}) IN (SELECT p FROM dimbits))"
        for i in range(num_hashes)
    )
    return f"""
WITH dim AS (SELECT DISTINCT p_partkey AS k FROM part WHERE p_size <= 3),
dimbits AS ({dimpos}),
flags AS (
  SELECT ({checks}) AS pass,
         l_partkey IN (SELECT k FROM dim) AS match
  FROM lineitem
)
SELECT
  CAST(count(*) AS BIGINT) AS n_fact,
  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
  CAST(sum(CASE WHEN match THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
  CAST(sum(CASE WHEN pass AND NOT match THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM flags
"""


ORACLES["q58_bloom_prune"] = _bloom_sql()

# q59: bands/signatures are per-doc, so computing them over ALL
# documents and filtering by parity in the candidate join is identical
# to signing batch and corpus separately.
ORACLES["q59_incremental_dedup"] = (
    _minhash_cte()
    + """,
bcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key
   AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
),
jac AS (
  SELECT c.id_a,
    CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS j
  FROM bcand c
  JOIN sh x ON x.doc_id = c.id_a
  JOIN sh y ON y.doc_id = c.id_b
),
near AS (SELECT DISTINCT id_a AS doc_id FROM jac WHERE j >= 0.8),
-- text IS NOT NULL + coalesce(IN, FALSE): a NULL body hashes to a
-- NULL key, which Spark's equi-join can never match — exact_dup is
-- FALSE there, not NULL (three-valued IN would poison kept too)
ch AS (SELECT DISTINCT md5(text) AS h FROM documents
       WHERE doc_id % 2 = 0 AND text IS NOT NULL)
SELECT d.doc_id,
  coalesce(md5(d.text) IN (SELECT h FROM ch), FALSE) AS exact_dup,
  (d.doc_id IN (SELECT doc_id FROM near)) AS near_dup,
  (NOT coalesce(md5(d.text) IN (SELECT h FROM ch), FALSE)
   AND NOT (d.doc_id IN (SELECT doc_id FROM near))) AS kept
FROM documents d WHERE d.doc_id % 2 = 1
"""
)


# q60: nearest-rank on bin upper edges; bin width 10 over [0,500), 50
# bins — same integer/double arithmetic as sketches.histogram_quantiles.
ORACLES["q60_histogram_quantiles"] = """
WITH b AS (
  SELECT event_type,
    CAST(least(greatest(floor((value - 0.0) / 10.0), 0), 49) AS INT) AS bin
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
), c AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin,
    sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
    sum(c) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
  min(CASE WHEN cum >= ceil(0.5 * n) THEN (bin + 1) * CAST(10.0 AS DOUBLE) END) AS p50,
  min(CASE WHEN cum >= ceil(0.9 * n) THEN (bin + 1) * CAST(10.0 AS DOUBLE) END) AS p90,
  min(CASE WHEN cum >= ceil(0.99 * n) THEN (bin + 1) * CAST(10.0 AS DOUBLE) END) AS p99
FROM cum GROUP BY event_type
"""

# q61: exact counters replayed with the same salted md5-prefix hash
# ('c{row}:' || key, 60-bit prefix, mod 1024) as sketches.cms_counters.
ORACLES["q61_heavy_hitters"] = """
WITH li AS (SELECT l_partkey FROM lineitem),
top AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS true_count
  FROM li GROUP BY 1 ORDER BY true_count DESC, l_partkey LIMIT 10
),
rows3 AS (SELECT unnest(range(3)) AS r),
pos AS (
  SELECT r, CAST('0x' || substr(md5('c' || r || ':' || CAST(l_partkey AS VARCHAR)), 1, 15)
    AS BIGINT) % 1024 AS pos
  FROM li CROSS JOIN rows3
),
counters AS (SELECT r, pos, count(*) AS c FROM pos GROUP BY 1, 2),
probe AS (
  SELECT t.l_partkey, t.true_count, rows3.r,
    CAST('0x' || substr(md5('c' || rows3.r || ':' || CAST(t.l_partkey AS VARCHAR)), 1, 15)
      AS BIGINT) % 1024 AS pos
  FROM top t CROSS JOIN rows3
)
SELECT p.l_partkey, p.true_count, CAST(min(coalesce(c.c, 0)) AS BIGINT) AS est_count
FROM probe p LEFT JOIN counters c ON c.r = p.r AND c.pos = p.pos
GROUP BY 1, 2
"""


# q62: the order key is the SAME double the Spark side sorts on
# (hash/2^60) — sorting the raw BIGINT would break ties differently
# where the 60-bit hash loses precision in double.
ORACLES["q62_domain_cap"] = """
WITH r AS (
  SELECT doc_id, source,
    row_number() OVER (
      PARTITION BY source
      ORDER BY CAST(CAST('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 15)
                 AS BIGINT) AS DOUBLE) / 1152921504606846976.0,
               doc_id
    ) AS rn
  FROM documents
)
SELECT doc_id, source FROM r WHERE rn <= 30
"""

# q63: fingerprints are compared within one engine only, so VARCHAR
# rendering of doubles never crosses the engine boundary.
ORACLES["q63_snapshot_diff"] = """
-- Independent formulation: no fingerprints at all — compare the value
-- tuples directly (the engine's per-column-md5 row hash is an internal
-- transport detail; statuses are what the operator promises).
WITH old AS (
  SELECT o_orderkey, o_orderstatus AS s, o_totalprice AS p,
    true AS present
  FROM orders WHERE o_orderkey % 7 <> 0
),
new AS (
  SELECT o_orderkey, o_orderstatus AS s,
    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
         ELSE o_totalprice END AS p,
    true AS present
  FROM orders WHERE o_orderkey % 5 <> 0
),
j AS (
  SELECT old.present AS po, new.present AS pn,
    (old.s IS DISTINCT FROM new.s) OR (old.p IS DISTINCT FROM new.p) AS diff
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
)
SELECT CASE WHEN po IS NULL THEN 'added'
            WHEN pn IS NULL THEN 'removed'
            WHEN diff THEN 'changed'
            ELSE 'unchanged' END AS status,
  CAST(count(*) AS BIGINT) AS n
FROM j GROUP BY 1 ORDER BY 1
"""


ORACLES["q64_retention_cohorts"] = """
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
c AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY user_id)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
  CAST(datediff('day', c.cohort_day, e.d) AS INT) AS day_offset,
  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM e JOIN c ON c.user_id = e.user_id
GROUP BY 1, 2
"""


ORACLES["q65_data_quality"] = """
WITH p AS (
  SELECT
    CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r0,
    CAST(sum(CASE WHEN l_quantity IS NOT NULL
                   AND NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS BIGINT) AS r1,
    CAST(sum(CASE WHEN l_extendedprice IS NOT NULL
                   AND NOT (l_extendedprice BETWEEN 0 AND 50000) THEN 1 ELSE 0 END) AS BIGINT) AS r2,
    CAST(sum(CASE WHEN l_returnflag IS NOT NULL
                   AND l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS r3
  FROM lineitem
), u AS (
  -- dbt null-exemption, matching validate.unique: rows with a null in
  -- ANY key column don't participate (Spark's count_distinct skips
  -- them; DuckDB's DISTINCT (a,b) would count null-field tuples).
  SELECT CAST(count(*) FILTER (WHERE l_orderkey IS NOT NULL
                                 AND l_linenumber IS NOT NULL)
            - count(DISTINCT (l_orderkey, l_linenumber))
              FILTER (WHERE l_orderkey IS NOT NULL
                        AND l_linenumber IS NOT NULL) AS BIGINT) AS r4
  FROM lineitem
)
SELECT 'not_null:l_partkey' AS rule, r0 AS n_violations, r0 = 0 AS passed FROM p
UNION ALL SELECT 'in_range:l_quantity', r1, r1 = 0 FROM p
UNION ALL SELECT 'in_range:l_extendedprice', r2, r2 = 0 FROM p
UNION ALL SELECT 'accepted_values:l_returnflag', r3, r3 = 0 FROM p
UNION ALL SELECT 'unique:l_orderkey,l_linenumber', r4, r4 = 0 FROM u
"""


ORACLES["q66_k_anonymity"] = """
WITH g AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT
  CAST(count(*) AS BIGINT) AS n_groups,
  CAST(sum(n) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_below_k,
  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS groups_below_k,
  CAST(min(n) AS BIGINT) AS min_group_size
FROM g
"""

ORACLES["q67_above_avg_orders"] = """
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_above_avg,
       round(max(o_totalprice), 2) AS max_price
FROM orders o
WHERE o_totalprice > (
    SELECT avg(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
GROUP BY o_custkey
"""


# q68: same A-ES key (ln(hash-uniform)/weight) — ln/division are IEEE
# double ops; distinct docs' keys differ by far more than engine libm
# last-ulp noise, and exact ties fall to the doc_id tiebreak.
ORACLES["q68_weighted_sample"] = """
WITH w AS (
  SELECT doc_id, source, CAST(length(text) AS DOUBLE) AS wt,
    CAST(CAST('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 15)
      AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
  FROM documents
), k AS (
  SELECT doc_id, source, ln(u) / wt AS key FROM w WHERE wt IS NOT NULL AND wt > 0
), r AS (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source ORDER BY key DESC, doc_id) AS rn
  FROM k
)
SELECT doc_id, source FROM r WHERE rn <= 20
"""

ORACLES["q69_feature_corr"] = """
SELECT
  round(corr(l_quantity, l_extendedprice), 4) AS corr_quantity_extendedprice,
  round(corr(l_quantity, l_discount), 4) AS corr_quantity_discount,
  round(corr(l_quantity, l_tax), 4) AS corr_quantity_tax,
  round(corr(l_extendedprice, l_discount), 4) AS corr_extendedprice_discount,
  round(corr(l_extendedprice, l_tax), 4) AS corr_extendedprice_tax,
  round(corr(l_discount, l_tax), 4) AS corr_discount_tax
FROM lineitem
"""


ORACLES["q70_char_entropy"] = """
WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
g AS (
  SELECT doc_id, substr(t, CAST(i AS INT), 2) AS g
  FROM t, unnest(range(1, length(t))) AS u(i)
  WHERE length(t) >= 2
),
c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
  round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
FROM c GROUP BY doc_id
"""

ORACLES["q71_split_leakage"] = (
    _minhash_cte()
    + """,
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
jac AS (
  SELECT c.id_a, c.id_b,
    CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS j
  FROM cand c JOIN sh x ON x.doc_id = c.id_a JOIN sh y ON y.doc_id = c.id_b
),
sp AS (
  SELECT doc_id,
    CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
      CAST(CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)
        AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
    FROM documents
  )
)
SELECT j.id_a, j.id_b, a.split AS split_a, b.split AS split_b,
  round(j.j, 6) AS jaccard
FROM jac j JOIN sp a ON a.doc_id = j.id_a JOIN sp b ON b.doc_id = j.id_b
WHERE j.j >= 0.8 AND a.split <> b.split
"""
)


ORACLES["q72_scd2_history"] = """
WITH e AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type
  FROM events
),
d AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, ts_us ORDER BY event_id DESC) AS rn
  FROM e
),
m AS (
  SELECT user_id, ts_us, event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
  FROM d WHERE rn = 1
),
ch AS (SELECT * FROM m WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type,
  ts_us AS valid_from_us,
  -- max-sentinel, not NULL, for the open (current) version: keeps the
  -- column null-free so pandas leaves it int64 (q40/q73 bug class)
  COALESCE(lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us),
           9223372036854775807) AS valid_to_us,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_us) AS INT) AS version,
  (lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL) AS is_current
FROM ch
"""

ORACLES["q73_resample_ffill"] = """
WITH e AS (
  SELECT user_id, event_id,
    CAST(epoch_us(ts) AS BIGINT) // 1000000 AS ts_s, value
  FROM events
),
b AS (
  SELECT user_id, (min(ts_s) // 86400) * 86400 AS lo, (max(ts_s) // 86400) * 86400 AS hi
  FROM e GROUP BY user_id
),
g AS (
  SELECT user_id, lo + 86400 * i AS grid_ts
  FROM b, LATERAL unnest(range(0, (hi - lo) // 86400 + 1)) t(i)
),
u AS (
  SELECT user_id, ts_s AS grid_ts, ts_s AS obs_ts, event_id AS tb, value AS v, 0 AS side FROM e
  UNION ALL
  SELECT user_id, grid_ts, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
    CAST(NULL AS DOUBLE), 1 FROM g
),
f AS (
  -- obs_ts only advances on rows that CARRY a value, so (value,
  -- obs_ts) always describe the same observation (the engine fills
  -- one struct; this is the column-wise equivalent).
  SELECT user_id, grid_ts, side,
    last_value(v IGNORE NULLS) OVER w AS value,
    last_value(CASE WHEN v IS NOT NULL THEN obs_ts END IGNORE NULLS) OVER w AS obs_ts
  FROM u
  WINDOW w AS (
    PARTITION BY user_id ORDER BY grid_ts, side, obs_ts, tb
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
-- obs_ts IS NOT NULL drops grid ticks before the first observation
-- (nothing to fill), mirroring the registry query; it also keeps the
-- column all-int so pandas doesn't render it float64 (r2 verdict).
SELECT user_id, grid_ts, round(value, 4) AS value, obs_ts
FROM f WHERE side = 1 AND obs_ts IS NOT NULL
"""

ORACLES["q74_transitions"] = """
WITH e AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type
  FROM events
),
p AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_state,
         event_type AS next_state
  FROM e
),
c AS (
  SELECT prev_state, next_state, CAST(count(*) AS BIGINT) AS n
  FROM p WHERE prev_state IS NOT NULL GROUP BY 1, 2
)
SELECT prev_state, next_state, n,
  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_state) AS DOUBLE), 6) AS p
FROM c
"""


def _profile_col_sql(col: str, is_string: bool) -> str:
    avg_len = (
        f"round(avg(length({col})), 6)" if is_string else "CAST(NULL AS DOUBLE)"
    )
    return f"""
SELECT '{col}' AS "column",
  (SELECT count(*) FROM documents) AS n_rows,
  CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
  CAST(min({col}) AS VARCHAR) AS min_value,
  CAST(max({col}) AS VARCHAR) AS max_value,
  {avg_len} AS avg_len
FROM documents"""


ORACLES["q75_profile"] = "\nUNION ALL\n".join(
    _profile_col_sql(c, s)
    for c, s in [
        ("doc_id", False),
        ("text", True),
        ("lang", True),
        ("source", True),
        ("n_chars", False),
    ]
)

# NULL body normalizes as the empty body (coalesce mirrors
# operators.text.normalize_text), so the audit ints and the checksum
# stay non-null even for an all-null-body lang group.
ORACLES["q76_normalize_text"] = """
WITH n AS (
  SELECT lang, coalesce(text, '') AS text,
    lower(coalesce(text, '')) AS lt,
    regexp_replace(lower(coalesce(text, '')), '[^a-z0-9.,!?'' -]', '', 'g') AS kept
  FROM documents
),
m AS (
  SELECT lang, text,
    trim(regexp_replace(kept, '  +', ' ', 'g')) AS norm_text,
    length(lt) - length(kept) AS removed
  FROM n
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(removed) AS BIGINT) AS removed_chars,
  CAST(sum(CASE WHEN norm_text <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
  bit_xor(CAST(('0x' || substr(md5(norm_text), 1, 15)) AS BIGINT)) AS checksum
FROM m GROUP BY lang
"""

ORACLES["q77_segment_dedup"] = (
    """
WITH d AS (
  -- colliding ids resolve to one row per id (min md5(text) wins),
  -- mirroring the identity precondition of segment_dedup
  SELECT doc_id, """
    + _TOKS.format(col="text")
    + """ AS w FROM documents
  QUALIFY row_number() OVER (
    PARTITION BY doc_id ORDER BY md5(coalesce(text, ''))) = 1
),
s0 AS (SELECT doc_id, w, CAST(ceil(len(w) / 5.0) AS INT) AS ns FROM d),
segs AS (
  SELECT doc_id, i AS pos, array_to_string(w[i*5+1 : i*5+5], ' ') AS seg
  FROM s0, LATERAL unnest(range(0, ns)) t(i)
  WHERE ns > 0
),
mk AS (
  SELECT doc_id, pos, seg,
    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
  FROM segs
)
SELECT doc_id,
  coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos), '') AS clean_text,
  CAST(count(*) AS BIGINT) AS n_segments,
  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM mk GROUP BY doc_id
"""
)

ORACLES["q78_robust_outliers"] = """
WITH e AS (SELECT event_type, value FROM events),
med AS (
  SELECT event_type, CAST(quantile_cont(value, 0.5) AS DOUBLE) AS median_value
  FROM e GROUP BY event_type
),
r AS (
  SELECT e.event_type, e.value, m.median_value,
    abs(e.value - m.median_value) AS resid
  FROM e JOIN med m USING (event_type)
),
s AS (
  SELECT event_type, median_value, CAST(count(*) AS BIGINT) AS n,
    CAST(quantile_cont(resid, 0.5) AS DOUBLE) AS mad
  FROM r GROUP BY event_type, median_value
),
o AS (
  SELECT r.event_type,
    CAST(sum(CASE WHEN s.mad > 0
      AND 0.6745 * abs(r.value - r.median_value) / s.mad > 3.5
      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM r JOIN s ON s.event_type = r.event_type GROUP BY r.event_type
)
SELECT s.event_type, s.n, round(s.median_value, 6) AS median_value,
  round(s.mad, 6) AS mad, o.n_outliers
FROM s JOIN o ON o.event_type = s.event_type
"""


ORACLES["q79_sparse_cosine"] = (
    """
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
d AS (
  SELECT doc_id, """
    + _TOKS.format(col="lower(text)")
    + """ AS t FROM base
),
terms AS (SELECT doc_id, unnest(t) AS term FROM d),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
dft AS (SELECT term, count(DISTINCT doc_id) AS df_t FROM terms GROUP BY term),
n AS (SELECT count(*) AS nd FROM base),
kept AS (SELECT term, df_t FROM dft, n WHERE df_t <= 0.5 * nd),
w AS (
  SELECT doc_id, tf.term, tf * ln(CAST(nd AS DOUBLE) / df_t) AS w0
  FROM tf JOIN kept ON tf.term = kept.term, n
),
nrm AS (SELECT doc_id, sqrt(sum(w0 * w0)) AS nn FROM w GROUP BY doc_id),
p AS (SELECT w.doc_id, term, w0 / nn AS w FROM w JOIN nrm ON w.doc_id = nrm.doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, round(sum(a.w * b.w), 6) AS cos_sim
FROM p a JOIN p b ON a.term = b.term AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING round(sum(a.w * b.w), 6) >= 0.1
"""
)


ORACLES["q80_equidepth_bins"] = """
WITH b AS (
  SELECT event_type, value,
    ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bin
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
)
SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n,
  round(min(value), 6) AS lo, round(max(value), 6) AS hi
FROM b GROUP BY event_type, bin
"""

ORACLES["q81_grouped_trend"] = """
WITH e AS (
  SELECT event_type, value,
    (CAST(epoch_us(ts) AS BIGINT) - 1704067200000000) / 86400000000.0 AS x_days
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
  round(regr_slope(value, x_days), 6) AS slope,
  round(regr_intercept(value, x_days), 6) AS intercept,
  round(regr_r2(value, x_days), 6) AS r2
FROM e GROUP BY event_type
"""

ORACLES["q82_psi_drift"] = """
WITH t AS (
  SELECT event_type,
    CASE WHEN value < 0 THEN -1
         WHEN value >= 500 THEN 10
         ELSE CAST(floor((value - 0) / 50.0) AS INT) END AS bin,
    CASE WHEN CAST(epoch_us(ts) AS BIGINT) < 1704672000000000 THEN 1 ELSE 0 END AS ref
  FROM events
),
c AS (
  SELECT event_type, bin,
    CAST(sum(ref) AS BIGINT) AS n_ref, CAST(sum(1 - ref) AS BIGINT) AS n_cur
  FROM t GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur
  FROM c GROUP BY event_type
),
j AS (
  SELECT c.event_type,
    greatest(CAST(c.n_ref AS DOUBLE) / t.t_ref, 1e-6) AS p,
    greatest(CAST(c.n_cur AS DOUBLE) / t.t_cur, 1e-6) AS q
  FROM c JOIN tot t ON t.event_type = c.event_type
)
SELECT event_type, round(sum((p - q) * ln(p / q)), 6) AS psi,
  CAST(count(*) AS BIGINT) AS n_bins_used
FROM j GROUP BY event_type
"""


ORACLES["q83_frame_sample"] = """
WITH ids AS (
  SELECT i AS media_id, CAST(i % 300 + 1 AS INT) AS n_frames
  FROM range(0, 300) t(i) WHERE i % 3 = 2
),
f AS (
  SELECT media_id, CAST(fi AS INT) AS frame_idx
  FROM ids, LATERAL unnest(range(0, n_frames, 30)) u(fi)
)
SELECT media_id, frame_idx,
  CAST((media_id * 31 + frame_idx) % 997 AS DOUBLE) AS frame_hash
FROM f
"""


ORACLES["q84_cube"] = """
SELECT o_orderstatus, o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_orders,
  round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


ORACLES["q85_entity_resolution"] = """
WITH v AS (
  SELECT DISTINCT c_custkey, c_name, c_nationkey,
    CASE WHEN i = 0 THEN c_name
         ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1) END AS var
  FROM customer, LATERAL unnest(range(0, length(c_name) + 1)) t(i)
),
cand AS (
  SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b,
    a.c_name AS na, b.c_name AS nb
  FROM v a JOIN v b
    ON a.c_nationkey = b.c_nationkey AND a.var = b.var
   AND a.c_custkey < b.c_custkey
)
SELECT id_a, id_b, CAST(levenshtein(na, nb) AS INT) AS distance
FROM cand WHERE levenshtein(na, nb) <= 1
"""


def _ppr_sql(iters: int = 3, damping: float = 0.85) -> str:
    restart = "CASE WHEN nd.node = (SELECT s FROM src0) THEN 1.0 ELSE 0.0 END"
    ctes = [
        "edges AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges))",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "src0 AS (SELECT min(src) AS s FROM edges)",
        "s0 AS (SELECT nd.node, CASE WHEN nd.node = (SELECT s FROM src0) "
        "THEN 1.0 ELSE 0.0 END AS score FROM nodes nd)",
    ]
    for i in range(1, iters + 1):
        prev = f"s{i - 1}"
        ctes.append(
            f"s{i} AS (SELECT nd.node, (1 - {damping}) * {restart} + "
            f"COALESCE(c.contrib, 0) AS score FROM nodes nd LEFT JOIN ("
            f"SELECT e.dst AS node, sum(s.score * {damping} / d.outdeg) AS contrib "
            f"FROM edges e JOIN {prev} s ON s.node = e.src "
            f"JOIN deg d ON d.src = e.src GROUP BY e.dst) c ON c.node = nd.node)"
        )
    return (
        "WITH " + ", ".join(ctes) + f" SELECT node, round(score, 8) AS score FROM s{iters}"
    )


ORACLES["q86_personalized_pagerank"] = _ppr_sql(iters=3, damping=0.85)

ORACLES["q87_ab_test"] = """
-- NaN mask mirrors the engine: a NaN value is not an observation.
WITH src AS (
  SELECT event_type, user_id,
    CASE WHEN NOT isnan(value) THEN value END AS value
  FROM events
),
a AS (
  SELECT event_type,
    CAST(count(value) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_a,
    CAST(count(value) FILTER (WHERE user_id % 2 <> 0) AS BIGINT) AS n_b,
    avg(value) FILTER (WHERE user_id % 2 = 0) AS m_a,
    avg(value) FILTER (WHERE user_id % 2 <> 0) AS m_b,
    var_samp(value) FILTER (WHERE user_id % 2 = 0) AS v_a,
    var_samp(value) FILTER (WHERE user_id % 2 <> 0) AS v_b
  FROM src GROUP BY event_type
)
SELECT event_type, n_a, n_b,
  round(m_a, 4) AS mean_a, round(m_b, 4) AS mean_b,
  round(CASE WHEN n_a >= 2 AND n_b >= 2 AND (v_a / n_a + v_b / n_b) > 0
    THEN (m_a - m_b) / sqrt(v_a / n_a + v_b / n_b) END, 4) AS t_stat,
  round(CASE WHEN n_a >= 2 AND n_b >= 2 AND (v_a / n_a + v_b / n_b) > 0
    THEN pow(v_a / n_a + v_b / n_b, 2)
      / (pow(v_a / n_a, 2) / (n_a - 1) + pow(v_b / n_b, 2) / (n_b - 1)) END, 4) AS dof
FROM a
"""


def _hits_sql(iters: int = 3) -> str:
    ctes = [
        "edges AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges))",
        "h0 AS (SELECT node, 1.0 AS hub FROM nodes)",
    ]
    for i in range(1, iters + 1):
        prev_h = f"h{i - 1}"
        # AS MATERIALIZED: each half-table is referenced twice (scalar
        # normalizer + join); inlined CTEs would re-evaluate the whole
        # chain per reference - exponential in rounds.
        ctes.append(
            f"a{i}r AS MATERIALIZED (SELECT e.dst AS node, sum(h.hub) AS v "
            f"FROM edges e JOIN {prev_h} h ON h.node = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT nd.node, COALESCE(r.v, 0) / (SELECT sum(v) FROM a{i}r) "
            f"AS auth FROM nodes nd LEFT JOIN a{i}r r ON r.node = nd.node)"
        )
        ctes.append(
            f"h{i}r AS MATERIALIZED (SELECT e.src AS node, sum(a.auth) AS v "
            f"FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src)"
        )
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT nd.node, COALESCE(r.v, 0) / (SELECT sum(v) FROM h{i}r) "
            f"AS hub FROM nodes nd LEFT JOIN h{i}r r ON r.node = nd.node)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT h.node, round(h.hub, 8) AS hub, round(a.auth, 8) AS auth"
        + f" FROM h{iters} h JOIN a{iters} a ON a.node = h.node"
    )


ORACLES["q88_hits"] = _hits_sql(iters=3)


ORACLES["q89_set_ops"] = """
WITH a AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
b AS (SELECT c_custkey FROM customer WHERE c_nationkey < 12),
j AS (
  SELECT coalesce(a.c_custkey, b.c_custkey) AS k,
    (a.c_custkey IS NOT NULL) AS in_a, (b.c_custkey IS NOT NULL) AS in_b
  FROM a FULL OUTER JOIN b ON b.c_custkey = a.c_custkey
)
SELECT
  CAST(count(*) FILTER (WHERE in_a AND in_b) AS BIGINT) AS n_intersect,
  CAST(count(*) FILTER (WHERE in_a AND NOT in_b) AS BIGINT) AS n_orders_only,
  CAST(count(*) FILTER (WHERE in_b AND NOT in_a) AS BIGINT) AS n_segment_only,
  CAST(count(*) AS BIGINT) AS n_union
FROM j
"""

ORACLES["q90_gaps_islands"] = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
  FROM events
),
i AS (
  SELECT user_id, day,
    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
),
runs AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS run_len
  FROM i GROUP BY user_id, grp
)
SELECT user_id,
  CAST(sum(run_len) AS BIGINT) AS n_active_days,
  CAST(count(*) AS BIGINT) AS n_islands,
  CAST(max(run_len) AS BIGINT) AS longest_streak
FROM runs GROUP BY user_id
"""

ORACLES["q91_merge_moments"] = """
WITH e AS (
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day, value
  FROM events
),
p AS (
  SELECT event_type, day,
    CAST(count(value) AS BIGINT) AS n,
    avg(value) AS mean,
    var_pop(value) * count(value) AS m2
  FROM e GROUP BY event_type, day
),
m AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
    sum(mean * n) / sum(n) AS mean
  FROM p GROUP BY event_type
),
m2 AS (
  SELECT p.event_type,
    sum(p.m2 + p.n * (p.mean - m.mean) * (p.mean - m.mean)) AS m2
  FROM p JOIN m ON m.event_type = p.event_type GROUP BY p.event_type
)
SELECT m.event_type, m.n, round(m.mean, 6) AS mean,
  round(CASE WHEN m.n > 1 THEN m2.m2 / (m.n - 1) END, 6) AS var_samp
FROM m JOIN m2 ON m2.event_type = m.event_type
"""


ORACLES["q92_bfs_hops"] = """
WITH off AS (SELECT max(l_partkey) + 1 AS o FROM lineitem),
dir AS (
  SELECT DISTINCT l_partkey AS src, l_suppkey + (SELECT o FROM off) AS dst
  FROM lineitem
), edges AS (
  SELECT src, dst FROM dir UNION SELECT dst, src FROM dir
), root AS (SELECT min(src) AS s FROM edges),
bfs AS (
  WITH RECURSIVE b(node, dist) AS (
    SELECT s, 0 FROM root
    UNION
    SELECT e.dst, b.dist + 1 FROM b JOIN edges e ON e.src = b.node
    WHERE b.dist < 12
  ) SELECT * FROM b
)
SELECT node, CAST(min(dist) AS INT) AS dist FROM bfs GROUP BY node
"""

ORACLES["q93_containment_pairs"] = (
    _minhash_cte()
    + f""",
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), shs AS (
  SELECT doc_id, {_SHINGLES} AS s
  FROM (SELECT doc_id, {_TOKS.format(col="text")} AS t FROM documents)
)
SELECT id_a, id_b,
  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s), 6) AS containment_a,
  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s), 6) AS containment_b
FROM cand JOIN shs a ON a.doc_id = cand.id_a JOIN shs b ON b.doc_id = cand.id_b
WHERE greatest(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s),
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s)) >= 0.3
"""
)

ORACLES["q94_zipf_fit"] = (
    "WITH toks AS (SELECT unnest("
    + _TOKS.format(col="text")
    + """) AS tok FROM documents),
counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok),
top AS (SELECT tok, freq FROM counts ORDER BY freq DESC, tok LIMIT 200),
ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank FROM top
)
SELECT
  round(regr_slope(ln(freq), ln(rank)), 6) AS zipf_slope,
  round(regr_intercept(ln(freq), ln(rank)), 6) AS zipf_intercept,
  round(regr_r2(ln(freq), ln(rank)), 6) AS zipf_r2,
  CAST(count(*) AS BIGINT) AS n_terms
FROM ranked
"""
)

ORACLES["q95_mutual_info"] = """
WITH e AS (
  SELECT event_type, least(CAST(floor(value / 100) AS BIGINT), 4) AS value_band
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
joint AS (
  SELECT event_type, value_band, CAST(count(*) AS DOUBLE) AS nxy
  FROM e GROUP BY event_type, value_band
),
mx AS (SELECT event_type, sum(nxy) AS nx FROM joint GROUP BY event_type),
my AS (SELECT value_band, sum(nxy) AS ny FROM joint GROUP BY value_band),
tot AS (SELECT sum(nxy) AS n FROM joint)
SELECT
  round(sum((nxy / n) * ln((nxy * n) / (nx * ny))), 6) AS mi_nats,
  round(-sum((nxy / n) * ln(nxy / n)), 6) AS joint_entropy_nats,
  CAST(max(n) AS BIGINT) AS n_events
FROM joint
JOIN mx USING (event_type) JOIN my USING (value_band) CROSS JOIN tot
"""

ORACLES["q96_attribution"] = """
WITH ev AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type
  FROM events
),
tagged AS (
  SELECT *,
    last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
      OVER w AS touch_type,
    last_value(CASE WHEN event_type IN ('click','view') THEN ts_us END IGNORE NULLS)
      OVER w AS touch_ts
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT coalesce(touch_type, 'none') AS channel,
  CAST(count(*) AS BIGINT) AS n_purchases,
  round(avg((ts_us - touch_ts) / 60000000.0), 4) AS avg_gap_minutes
FROM tagged WHERE event_type = 'purchase'
GROUP BY coalesce(touch_type, 'none')
"""

ORACLES["q97_centroid_cosine"] = """
WITH e AS (
  SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
    generate_subscripts(embedding, 1) AS pos
  FROM embeddings WHERE embedding IS NOT NULL
),
cent AS (SELECT label, pos, avg(v) AS c FROM e GROUP BY label, pos),
norms AS (SELECT label, sqrt(sum(c * c)) AS nrm FROM cent GROUP BY label),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b, sum(a.c * b.c) AS dot
  FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT label_a, label_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots
JOIN norms na ON na.label = dots.label_a
JOIN norms nb ON nb.label = dots.label_b
"""


ORACLES["q98_json_extract"] = """
-- json_valid guard (same as q100's oracle): DuckDB's ->> RAISES on
-- malformed JSON, while Spark's from_json nulls it — and counting
-- malformed rows as null k is exactly what the query audits.
WITH e AS (
  SELECT event_type,
    CASE WHEN props IS NOT NULL AND json_valid(props)
         THEN TRY_CAST(props->>'$.k' AS BIGINT) END AS k
  FROM events
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(*) FILTER (WHERE k IS NULL) AS BIGINT) AS n_null_k,
  min(k) AS min_k,
  max(k) AS max_k,
  round(avg(k), 6) AS avg_k
FROM e GROUP BY event_type
"""

ORACLES["q99_merge_upsert"] = """
WITH base AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey <= 700
),
changes AS (
  SELECT o_custkey AS c_custkey,
    round(sum(o_totalprice), 2) AS new_acctbal,
    CASE WHEN o_custkey % 10 = 0 THEN 'D' ELSE 'U' END AS op
  FROM orders GROUP BY o_custkey
)
SELECT coalesce(b.c_custkey, c.c_custkey) AS c_custkey,
  b.c_name AS c_name,
  round(coalesce(c.new_acctbal, b.c_acctbal), 2) AS c_acctbal,
  b.c_mktsegment AS c_mktsegment
FROM base b FULL OUTER JOIN changes c ON c.c_custkey = b.c_custkey
WHERE c.op IS NULL OR c.op <> 'D'
"""


ORACLES["q100_variant_extract"] = """
WITH e AS (
  SELECT event_type,
    CASE WHEN props IS NOT NULL AND json_valid(props) THEN 1 ELSE 0 END AS ok,
    CASE WHEN props IS NOT NULL AND json_valid(props)
         THEN TRY_CAST(props->>'$.k' AS BIGINT) END AS k
  FROM events
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(*) FILTER (WHERE ok = 0) AS BIGINT) AS n_unparsed,
  CAST(count(*) FILTER (WHERE k IS NULL) AS BIGINT) AS n_missing_k,
  round(avg(k), 6) AS avg_k,
  max(k) AS max_k
FROM e GROUP BY event_type
"""


# q101: same injected-PII enrichment as the Spark query (the synthetic
# corpus carries no natural PII, so both sides append deterministic
# email/IP/phone fragments first), then the q54 patterns in the same
# replace order (email → ipv4 → phone).
ORACLES["q101_pii_redact"] = r"""
WITH enriched AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 7 = 0
            THEN ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com'
            ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' ELSE '' END
    || CASE WHEN doc_id % 13 = 0
            THEN ' call +1 555 0' || CAST(doc_id AS VARCHAR) || ' 99' ELSE '' END
      AS text
  FROM documents
), s AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
    len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ni,
    len(regexp_extract_all(text, '\+?\d[\d -]{7,}\d')) AS np,
    regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
      '\+?\d[\d -]{7,}\d', '[PHONE]', 'g') AS red
  FROM enriched
)
SELECT doc_id, CAST(ne + ni + np AS BIGINT) AS n_pii, red AS redacted_text
FROM s WHERE ne + ni + np > 0
"""


def _keep_best_sql() -> str:
    """Replays q102: the q38 fuzzy-dedup closure, restricted to
    multi-doc clusters, with the representative re-elected by
    text.quality_features' composite score (ties → lowest doc_id).
    Quality CTEs are q-prefixed to avoid colliding with the minhash
    CTE's toks."""
    return (
        _minhash_cte().replace("WITH ", "WITH RECURSIVE ", 1)
        + f""",
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM verified
  UNION
  SELECT id_b AS u, id_a AS v FROM verified
),
reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.node = e.v
),
cc AS (SELECT node AS doc_id, min(lab) AS cluster FROM reach GROUP BY node),
sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM cc GROUP BY cluster),
multi AS (
  -- no size restriction needed: cc only contains pair-graph nodes, so
  -- every cluster already has >= 2 members
  SELECT cc.doc_id, cc.cluster, s.cluster_size
  FROM cc JOIN sizes s ON s.cluster = cc.cluster
),
qtoks AS (SELECT doc_id, text, {_TOKS.format(col="text")} AS t FROM documents),
qfeat AS (
  SELECT doc_id, len(t) AS n_tokens, length(text) AS n_chars,
    length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct,
    len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, lower(x)))) AS stop_hits
  FROM qtoks
),
qf AS (
  SELECT doc_id,
    round(0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE) / n_chars ELSE 0.0 END)
        + 0.3 * least(CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens ELSE 0.0 END * 5, 1.0),
      6) AS quality_score
  FROM qfeat
),
ranked AS (
  SELECT m.cluster, m.doc_id, m.cluster_size, qf.quality_score,
    row_number() OVER (PARTITION BY m.cluster
                       ORDER BY qf.quality_score DESC, m.doc_id) AS rk
  FROM multi m JOIN qf ON qf.doc_id = m.doc_id
)
SELECT cluster, doc_id AS kept_doc, cluster_size, quality_score AS kept_quality
FROM ranked WHERE rk = 1
"""
    )


ORACLES["q102_dedup_keep_best"] = _keep_best_sql()


def _auto_mask_case_sql() -> str:
    """The corpus-derived bucket-MASK ladder (similarity.
    _auto_mask_column's SQL twin): first true branch ⇔ smallest p
    with n ≤ target·2^p ⇔ 2^p ≥ ceil(n/target), clamped — pure
    integer comparisons, so both engines derive the identical plane
    count from the identical (guarded) count."""
    from .operators.similarity import (
        AUTO_MAX_PLANES,
        AUTO_MIN_PLANES,
        AUTO_TARGET_BUCKET_ROWS,
    )

    branches = " ".join(
        f"WHEN n <= {AUTO_TARGET_BUCKET_ROWS << p} THEN {(1 << p) - 1}"
        for p in range(AUTO_MIN_PLANES, AUTO_MAX_PLANES + 1)
    )
    return f"(CASE {branches} ELSE {(1 << AUTO_MAX_PLANES) - 1} END)"


def _batch_ann_sql(
    planes: int | str = "auto", dim: int = 64, k: int = 3, query_mod: int = 100
) -> str:
    """Replays q103 (and q112/q118/q132's dense leg): the literal-
    plane bucketing, every ``query_mod``-th vector as a query, one
    bucket join, per-query top-k window. ``planes="auto"`` replays
    lsh_bucket_auto: all AUTO_MAX_PLANES bits are computed and the
    bucket is masked down by the count-derived ladder — masking ≡
    using only the first p matrix rows, and plane_matrix rows depend
    only on their index, so the two engines bucket identically."""
    from .operators.similarity import AUTO_MAX_PLANES, plane_matrix

    nbits = AUTO_MAX_PLANES if planes == "auto" else planes
    m = plane_matrix(nbits, dim)
    rows = ["[" + ", ".join(f"{float(s):.1f}" for s in row) + "]" for row in m]
    raw_bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {rows[p]}) >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(nbits)
    )
    if planes == "auto":
        np_cte = (
            f"__np AS (SELECT {_auto_mask_case_sql()} AS bmask "
            "FROM (SELECT count(*) AS n FROM embeddings)), "
        )
        bucket = f"(({raw_bucket}) & (SELECT bmask FROM __np))"
    else:
        np_cte = ""
        bucket = raw_bucket
    return f"""
WITH {np_cte}e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE embedding IS NOT NULL),
b AS (SELECT vec_id, v, {bucket} AS bucket, sqrt(list_dot_product(v, v)) AS nrm FROM e),
c AS (SELECT * FROM b WHERE nrm > 0),
q AS (SELECT vec_id AS query_id, v AS qv, bucket, nrm AS qn FROM c WHERE vec_id % {query_mod} = 0),
s AS (
  SELECT q.query_id, c.vec_id,
    list_dot_product(q.qv, c.v) / (q.qn * c.nrm) AS cos
  FROM q JOIN c USING (bucket)
  WHERE c.vec_id <> q.query_id
),
r AS (
  SELECT query_id, vec_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {k}
"""


ORACLES["q103_batch_ann"] = _batch_ann_sql(planes="auto", dim=64, k=3)


def _semdedup_sql(threshold: float = 0.35) -> str:
    """Replays q104: the shared sampled-Lloyd quantizer CTEs (same
    IVF_QUANTIZER constant as q30), within-cluster cosine pairs, drop
    the higher id of each pair, per-cluster funnel."""
    from .plans.kmeans import IVF_QUANTIZER

    return (
        _lloyd_kmeans_ctes(
            IVF_QUANTIZER["k"],
            IVF_QUANTIZER["iters"],
            "CAST(embedding AS DOUBLE[])",
            train_limit=IVF_QUANTIZER["sample_n"],
        )
        + f""",
nz AS (SELECT vec_id, v, cluster, sqrt(list_dot_product(v, v)) AS nrm FROM afin),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM nz a JOIN nz b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE a.nrm > 0 AND b.nrm > 0
    AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {threshold}
),
dropped AS (SELECT DISTINCT id_b AS vec_id FROM p)
SELECT af.cluster,
  CAST(count(*) AS BIGINT) AS n_vectors,
  CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
  CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM afin af LEFT JOIN dropped d ON d.vec_id = af.vec_id
GROUP BY af.cluster
"""
    )


ORACLES["q104_semdedup"] = _semdedup_sql(threshold=0.35)


# q105: the staged-flag funnel — every stage is a cumulative boolean in
# one projection (the same two windows + broadcast hit join the Spark
# plan uses), aggregated once. Gopher expressions are q52's; the
# decontamination shingle chain is q51's; the cap hash is q62's.
ORACLES["q105_corpus_pipeline"] = (
    "WITH toks AS (SELECT doc_id, source, text, "
    + _TOKS.format(col="text")
    + " AS t FROM documents WHERE doc_id % 97 <> 0), "
    "feat AS (SELECT doc_id, source, text, len(t) AS n_words, "
    "CASE WHEN len(t) > 0 THEN CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE) / len(t) ELSE 0.0 END AS mwl, "
    "CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(t) ELSE 0.0 END AS ar, "
    f"len(list_distinct(list_filter(list_transform(t, x -> lower(x)), x -> list_contains({_STOPWORDS_SQL}, x)))) AS ns "
    "FROM toks), "
    "k1f AS (SELECT doc_id, source, text, coalesce(n_words, 0) AS tok, "
    "coalesce(n_words >= 50 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0 "
    "AND ar >= 0.8 AND ns >= 2, FALSE) AS k1 FROM feat), "
    "ltoks AS (SELECT doc_id, "
    + _TOKS.format(col="lower(text)")
    + " AS t FROM documents), "
    f"lsh AS (SELECT doc_id, {_SHINGLES} AS s FROM ltoks), "
    "ev AS (SELECT DISTINCT unnest(s) AS shingle FROM lsh WHERE doc_id % 97 = 0), "
    "hit AS (SELECT DISTINCT tr.doc_id FROM "
    "(SELECT doc_id, unnest(s) AS shingle FROM lsh WHERE doc_id % 97 <> 0) tr "
    "JOIN ev USING (shingle)), "
    "r1 AS (SELECT k1f.*, (h.doc_id IS NOT NULL) AS contaminated, "
    "CAST(CAST('0x' || substr(md5('cap:' || CAST(k1f.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u, "
    "row_number() OVER (PARTITION BY md5(text) ORDER BY k1 DESC, k1f.doc_id) AS rn_txt "
    "FROM k1f LEFT JOIN hit h ON h.doc_id = k1f.doc_id), "
    "r2 AS (SELECT *, (k1 AND rn_txt = 1) AS k2 FROM r1), "
    "r3 AS (SELECT *, (k2 AND NOT contaminated) AS k3 FROM r2), "
    "r4 AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY k3 DESC, u, doc_id) AS rn_cap FROM r3), "
    "fin AS (SELECT *, (k3 AND rn_cap <= 30) AS k4 FROM r4) "
    "SELECT 0 AS stage_idx, 'input' AS stage, CAST(count(*) AS BIGINT) AS rows_out, "
    "CAST(coalesce(sum(tok), 0) AS BIGINT) AS tokens_out FROM fin "
    "UNION ALL SELECT 1, 'quality', CAST(coalesce(sum(CASE WHEN k1 THEN 1 ELSE 0 END), 0) AS BIGINT), "
    "CAST(coalesce(sum(CASE WHEN k1 THEN tok ELSE 0 END), 0) AS BIGINT) FROM fin "
    "UNION ALL SELECT 2, 'exact_dedup', CAST(coalesce(sum(CASE WHEN k2 THEN 1 ELSE 0 END), 0) AS BIGINT), "
    "CAST(coalesce(sum(CASE WHEN k2 THEN tok ELSE 0 END), 0) AS BIGINT) FROM fin "
    "UNION ALL SELECT 3, 'decontaminated', CAST(coalesce(sum(CASE WHEN k3 THEN 1 ELSE 0 END), 0) AS BIGINT), "
    "CAST(coalesce(sum(CASE WHEN k3 THEN tok ELSE 0 END), 0) AS BIGINT) FROM fin "
    "UNION ALL SELECT 4, 'domain_cap', CAST(coalesce(sum(CASE WHEN k4 THEN 1 ELSE 0 END), 0) AS BIGINT), "
    "CAST(coalesce(sum(CASE WHEN k4 THEN tok ELSE 0 END), 0) AS BIGINT) FROM fin"
)


def _dbl(v: float) -> str:
    """DOUBLE literal for DuckDB. Bare decimal literals parse as
    DECIMAL there (exact arithmetic Spark's doubles don't do — e.g.
    `tf * 2.2` becomes an exact decimal product, a last-ulp divergence
    class the output rounding usually but not provably hides); repr()
    round-trips to the identical double Spark's F.lit carries."""
    return f"CAST({v!r} AS DOUBLE)"


def _bm25_sql(k: int = 5) -> str:
    """q106 replay. Constants single-sourced from operators.retrieval;
    float literals are embedded via repr() (round-trips to the same
    double DuckDB parses back), every expression keeps the Spark
    plan's association order, and the rank cut is taken on the
    6dp-ROUNDED score — so the two engines cut identical sets."""
    from .operators.retrieval import BM25_B, BM25_K1, BM25_Q106_DF_RATIO

    dbl = _dbl
    toks = _TOKS.format(col="lower(text)")
    return f"""
WITH corpus AS (SELECT doc_id, {toks} AS t FROM documents WHERE doc_id % 97 <> 0),
q AS (SELECT doc_id AS query_id, {toks} AS t FROM documents WHERE doc_id % 97 = 0),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(t) AS term FROM corpus) GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM corpus) AS n,
                 (SELECT CAST(coalesce(sum(dl), 0) AS DOUBLE) FROM dl) AS total),
dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
qt AS (SELECT DISTINCT query_id, unnest(t) AS term FROM q),
per AS (
  SELECT qt.query_id, tf.doc_id,
    ln({dbl(1.0)} + (stats.n - dft.df_t + {dbl(0.5)}) / (dft.df_t + {dbl(0.5)}))
      * (tf.tf * {dbl(BM25_K1 + 1.0)}) /
      (tf.tf + {dbl(BM25_K1)} * ({dbl(1.0 - BM25_B)} + {dbl(BM25_B)} * dl.dl / (stats.total / stats.n))) AS s
  FROM qt JOIN dft USING (term) JOIN tf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  WHERE dft.df_t <= {dbl(BM25_Q106_DF_RATIO)} * stats.n
),
scored AS (SELECT query_id, doc_id, round(sum(s), 6) AS score
           FROM per GROUP BY query_id, doc_id)
SELECT query_id, doc_id, score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT query_id, doc_id, score,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


ORACLES["q106_bm25_search"] = _bm25_sql(k=5)


def _unigram_nll_sql() -> str:
    """q107 replay: corpus unigram LM, per-doc mean negative
    log-likelihood, outlier flag on the ROUNDED score (threshold
    single-sourced from operators.text.UNIGRAM_NLL_OUTLIER). Zero-token
    docs come back via the LEFT JOIN as (0, 0.0, false)."""
    from .operators.text import UNIGRAM_NLL_OUTLIER

    toks = _TOKS.format(col="lower(text)")
    return f"""
WITH d AS (SELECT doc_id, {toks} AS t FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(t) AS term FROM d) GROUP BY doc_id, term),
uni AS (SELECT term, sum(tf) AS ct FROM tf GROUP BY term),
tot AS (SELECT CAST(coalesce(sum(ct), 0) AS DOUBLE) AS total FROM uni),
scored AS (
  SELECT tf.doc_id, sum(tf.tf) AS dl,
         round(sum(-tf.tf * ln(uni.ct / tot.total)) / sum(tf.tf), 6) AS nll
  FROM tf JOIN uni USING (term) CROSS JOIN tot GROUP BY tf.doc_id
)
SELECT d.doc_id, CAST(coalesce(s.dl, 0) AS BIGINT) AS n_tokens,
       coalesce(s.nll, 0.0) AS nll,
       coalesce(s.nll, 0.0) > {UNIGRAM_NLL_OUTLIER!r} AS is_outlier
FROM d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


ORACLES["q107_unigram_nll"] = _unigram_nll_sql()


def _morton_sql(x: str, y: str, bits: int | None = None) -> str:
    """Bit-interleave SQL generated by the same loop as
    functions.morton_key, including its mask-first step (inputs wrap
    to the low ``bits`` bits before any shift, so negative values
    behave identically in every engine); tests/test_layout.py pins the
    implementations against each other on sample values — including
    out-of-range and negative ones — so they cannot drift silently."""
    from .functions import MORTON_BITS

    if bits is None:
        bits = MORTON_BITS
    mask = (1 << bits) - 1
    xm, ym = f"({x} & {mask})", f"({y} & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _zorder_shift() -> int:
    from .functions import ZORDER_BUCKET_SHIFT

    return ZORDER_BUCKET_SHIFT


ORACLES["q108_zorder_stats"] = f"""
WITH e AS (SELECT user_id,
           CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day FROM events),
z AS (SELECT user_id, ({_morton_sql("user_id", "day")}) AS zkey FROM e)
SELECT (zkey >> {_zorder_shift()}) AS zbucket, CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(min(zkey) AS BIGINT) AS z_min, CAST(max(zkey) AS BIGINT) AS z_max
FROM z GROUP BY zbucket
"""


def _hll_sql(key: str, table: str, group: str | None = None) -> str:
    """q110/q111 replay. All HLL constants single-sourced from
    operators.sketches; the rho CASE chain and the exact-integer
    register sum are generated by the same loops as the Spark side, and
    the estimate keeps the identical double association order
    (((α·m)·m)·2^53)/S, so the two engines cut the same branch and
    round the same value."""
    from .operators.sketches import HLL_ALPHA, HLL_M, HLL_P, HLL_W_BITS

    full_scale = 1 << (HLL_W_BITS + 1)
    cases = " ".join(
        f"WHEN w >= {1 << k} THEN {HLL_W_BITS - k}"
        for k in range(HLL_W_BITS - 1, -1, -1)
    )

    dbl = _dbl
    e_raw = (
        f"({dbl(HLL_ALPHA)} * {dbl(float(HLL_M))} * {dbl(float(HLL_M))}"
        f" * {dbl(float(full_scale))}) / s_int"
    )
    gsel = f"{group}, " if group else ""
    gby = f" GROUP BY {group}" if group else ""
    return f"""
WITH h AS (SELECT {gsel}CAST('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 15) AS BIGINT) AS h
           FROM {table} WHERE {key} IS NOT NULL),
b AS (SELECT {gsel}(h & {HLL_M - 1}) AS bucket, (h >> {HLL_P}) AS w FROM h),
regs AS (SELECT {gsel}bucket, max(CASE {cases} ELSE {HLL_W_BITS + 1} END) AS r
         FROM b GROUP BY {gsel}bucket),
agg AS (SELECT {gsel}count(*) AS used,
               sum(CAST(1 AS BIGINT) << ({HLL_W_BITS + 1} - r)) AS s_present
        FROM regs{gby}),
base AS (SELECT {gsel}{HLL_M} AS m, coalesce(used, 0) AS used,
                {HLL_M} - coalesce(used, 0) AS zeros,
                CAST(coalesce(s_present, 0)
                     + ({HLL_M} - coalesce(used, 0)) * CAST({full_scale} AS BIGINT)
                     AS BIGINT) AS s_int
         FROM agg)
SELECT {gsel}CAST(m AS INT) AS m, CAST(used AS BIGINT) AS used,
       CAST(zeros AS BIGINT) AS zeros, s_int,
       floor((CASE WHEN {e_raw} <= {dbl(2.5 * HLL_M)} AND zeros > 0
                   THEN {dbl(float(HLL_M))} * ln({dbl(float(HLL_M))} / zeros)
                   ELSE {e_raw} END) * {dbl(10000.0)} + {dbl(0.5)}) / {dbl(10000.0)} AS est
FROM base
"""


ORACLES["q110_hll_distinct"] = _hll_sql("o_custkey", "orders")
ORACLES["q111_hll_by_group"] = _hll_sql("user_id", "events", group="event_type")


def _hybrid_rrf_sql(k: int = 5, depth: int = 10) -> str:
    """q112 replay: the q106 BM25 chain and the q103 ANN chain (same
    %97 eval split) nested as subqueries, fused by reciprocal rank
    1/(RRF_K + rank) — constants single-sourced from
    operators.retrieval; the fused score is rounded to 6dp before the
    per-query window, ties by doc id, matching rrf_fuse exactly."""
    from .operators.retrieval import RRF_K

    lex = _bm25_sql(k=depth)
    den = _batch_ann_sql(planes="auto", dim=64, k=depth, query_mod=97)
    return f"""
WITH lex AS (SELECT query_id, doc_id, rank FROM ({lex}) t),
den AS (SELECT query_id, vec_id AS doc_id, rank FROM ({den}) t),
f AS (
  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         coalesce(l.doc_id, d.doc_id) AS doc_id,
         round(coalesce(CAST(1.0 AS DOUBLE) / ({RRF_K} + l.rank), CAST(0.0 AS DOUBLE))
             + coalesce(CAST(1.0 AS DOUBLE) / ({RRF_K} + d.rank), CAST(0.0 AS DOUBLE)),
               6) AS rrf_score
  FROM lex l FULL OUTER JOIN den d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT query_id, doc_id, rrf_score, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, doc_id, rrf_score,
    row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
  FROM f
) WHERE rank <= {k}
"""


ORACLES["q112_hybrid_rrf"] = _hybrid_rrf_sql(k=5, depth=10)


def _naive_bayes_sql() -> str:
    """q113 replay: the same train/eval split, dense vocab×class grid
    anchored on priors (a zero-token class still gets ln(1/V) rows),
    prior + evidence rounded to 6dp BEFORE the argmax (ties by label
    asc). Constants single-sourced from operators.ml. With zero
    labeled train docs the priors CTE is empty and the cross join
    yields an empty confusion matrix — the operator's ln(0) guard."""
    from .operators.ml import EVAL_SPLIT_MOD, NB_ALPHA

    toks = _TOKS.format(col="lower(text)")
    a = _dbl(NB_ALPHA)
    return f"""
WITH labeled AS (
  SELECT doc_id AS id, {toks} AS toks, coalesce(lang, 'und') AS label
  FROM documents),
train AS (SELECT * FROM labeled WHERE id % {EVAL_SPLIT_MOD} != 0 AND label != 'und'),
ev AS (SELECT * FROM labeled WHERE id % {EVAL_SPLIT_MOD} = 0),
nt AS (SELECT count(*) AS n FROM train),
tf_train AS (
  SELECT label, term, count(*) AS ct
  FROM (SELECT label, unnest(toks) AS term FROM train) GROUP BY label, term),
vocab AS (SELECT DISTINCT term FROM tf_train),
vs AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab),
priors AS (SELECT label, count(*) AS n_c FROM train GROUP BY label),
class_tot AS (
  SELECT p.label, coalesce(t.tot, 0) AS tot
  FROM priors p LEFT JOIN (
    SELECT label, sum(ct) AS tot FROM tf_train GROUP BY label) t USING (label)),
model AS (
  SELECT v.term, c.label,
         ln((coalesce(tc.ct, 0) + {a}) / (c.tot + {a} * vs.v)) AS logp
  FROM vocab v CROSS JOIN class_tot c CROSS JOIN vs
  LEFT JOIN tf_train tc ON tc.term = v.term AND tc.label = c.label),
tf_eval AS (
  SELECT id, term, count(*) AS tf
  FROM (SELECT id, unnest(toks) AS term FROM ev) GROUP BY id, term),
evidence AS (
  SELECT e.id, m.label, sum(e.tf * m.logp) AS evd
  FROM tf_eval e JOIN model m USING (term) GROUP BY e.id, m.label),
scored AS (
  SELECT e.id, e.label AS true_label, p.label AS pred_label,
         round(ln(p.n_c) - ln(nt.n) + coalesce(evd.evd, {_dbl(0.0)}), 6) AS score
  FROM ev e CROSS JOIN priors p CROSS JOIN nt
  LEFT JOIN evidence evd ON evd.id = e.id AND evd.label = p.label),
preds AS (
  SELECT id, true_label, pred_label,
         row_number() OVER (PARTITION BY id ORDER BY score DESC, pred_label) AS rk
  FROM scored)
SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n_docs
FROM preds WHERE rk = 1 GROUP BY true_label, pred_label
"""


ORACLES["q113_naive_bayes"] = _naive_bayes_sql()


ORACLES["q114_roc_auc"] = f"""
WITH base AS (
  SELECT n_chars AS score, coalesce(lang = 'en', false) AS pos
  FROM documents WHERE n_chars IS NOT NULL),
per AS (
  SELECT score,
         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS p_s,
         sum(CASE WHEN pos THEN 0 ELSE 1 END) AS n_s
  FROM base GROUP BY score),
ranked AS (
  SELECT *, coalesce(sum(n_s) OVER (
    ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg
  FROM per)
SELECT
  round(CASE WHEN sum(p_s) > 0 AND sum(n_s) > 0
    THEN sum(p_s * (cum_neg + n_s / {_dbl(2.0)}))
         / (CAST(sum(p_s) AS DOUBLE) * sum(n_s))
    ELSE {_dbl(0.0)} END, 6) AS auc,
  CAST(coalesce(sum(p_s), 0) AS BIGINT) AS n_pos,
  CAST(coalesce(sum(n_s), 0) AS BIGINT) AS n_neg
FROM ranked
"""


def _chi2_terms_sql(top_k: int = 5) -> str:
    """q115 replay: document-frequency contingency over observed
    (term, class) pairs only, χ² in pure double arithmetic in the
    Spark plan's association order, rounded to 4dp BEFORE the
    per-class top-k window (ties by term asc)."""
    toks = _TOKS.format(col="lower(text)")
    return f"""
WITH labeled AS (
  SELECT doc_id AS id, lang AS label, {toks} AS toks
  FROM documents WHERE lang IS NOT NULL),
nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM labeled),
dt AS (SELECT id, label, unnest(list_distinct(toks)) AS term FROM labeled),
tc AS (SELECT term, label, count(*) AS a FROM dt GROUP BY term, label),
tdf AS (SELECT term, sum(a) AS df_t FROM tc GROUP BY term),
cn AS (SELECT label, count(*) AS n_c FROM labeled GROUP BY label),
scored AS (
  SELECT tc.label, tc.term,
    round(CASE WHEN (A + B) * (C + D) * (A + C) * (B + D) > 0
      THEN nt.n * pow(A * D - B * C, 2) / ((A + B) * (C + D) * (A + C) * (B + D))
      ELSE {_dbl(0.0)} END, 4) AS chi2
  FROM (
    SELECT tc.label, tc.term,
      CAST(tc.a AS DOUBLE) AS A,
      CAST(tdf.df_t - tc.a AS DOUBLE) AS B,
      CAST(cn.n_c - tc.a AS DOUBLE) AS C,
      CAST(nt0.n_i - tdf.df_t - cn.n_c + tc.a AS DOUBLE) AS D
    FROM tc JOIN tdf USING (term) JOIN cn USING (label)
    CROSS JOIN (SELECT count(*) AS n_i FROM labeled) nt0
  ) tc CROSS JOIN nt)
SELECT label, term, chi2, CAST(rank AS INTEGER) AS rank FROM (
  SELECT label, term, chi2,
         row_number() OVER (PARTITION BY label ORDER BY chi2 DESC, term) AS rank
  FROM scored
) WHERE rank <= {top_k}
"""


ORACLES["q115_chi2_terms"] = _chi2_terms_sql()


def _bigram_nll_sql() -> str:
    """q116 replay: STRICT adjacent pairs via a 1-indexed lateral
    range (range(1, len) is empty for <2 tokens), context totals from
    the pair table, V from the unigram vocabulary; constants
    single-sourced from operators.ml; zero-bigram docs come back
    (0, 0.0) via the LEFT join."""
    from .operators.ml import BIGRAM_K

    toks = _TOKS.format(col="lower(text)")
    k = _dbl(BIGRAM_K)
    return f"""
WITH d AS (SELECT doc_id, {toks} AS t FROM documents),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM d, unnest(range(1, len(t))) AS r(i)),
tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM pairs GROUP BY doc_id, w1, w2),
bi AS (SELECT w1, w2, sum(tf) AS c12 FROM tf GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM bi GROUP BY w1),
vs AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v
       FROM (SELECT unnest(t) AS term FROM d)),
scored AS (
  SELECT tf.doc_id, sum(tf.tf) AS nb,
         round(sum(-tf.tf * ln((bi.c12 + {k}) / (ctx.c1 + {k} * vs.v)))
               / sum(tf.tf), 6) AS nll
  FROM tf JOIN bi USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vs
  GROUP BY tf.doc_id)
SELECT d.doc_id, CAST(coalesce(s.nb, 0) AS BIGINT) AS n_bigrams,
       coalesce(s.nll, {_dbl(0.0)}) AS nll
FROM d LEFT JOIN scored s USING (doc_id)
"""


ORACLES["q116_bigram_nll"] = _bigram_nll_sql()


def _pca_projection_sql() -> str:
    """q117 replay: the identical three stages — moment sums via a
    double lateral range (cov rounded to PCA_ROUND before any
    iteration), the power-iteration recurrence UNROLLED one CTE pair
    per round (division guarded by the same z>0 fallback-to-previous
    rule), sign fixed by the largest-|component| (lowest index on
    ties), projections against the rounded mean/eigenvector, and
    per-label mean/variance from explicit sum/count arithmetic.
    Constants single-sourced from operators.ml."""
    from .operators.ml import PCA_POWER_ITERS, PCA_ROUND

    iters = []
    for k in range(1, PCA_POWER_ITERS + 1):
        p = f"v{k - 1}"
        iters.append(
            f"""u{k} AS (
  SELECT c.i, sum(c.c * {p}.x) AS x
  FROM cov c JOIN {p} ON {p}.i = c.j GROUP BY c.i),
z{k} AS (SELECT sqrt(sum(x * x)) AS z FROM u{k}),
v{k} AS (
  SELECT u.i, CASE WHEN z.z > 0 THEN u.x / z.z ELSE p.x END AS x
  FROM u{k} u CROSS JOIN z{k} z JOIN {p} p ON p.i = u.i)"""
        )
    last = f"v{PCA_POWER_ITERS}"
    return f"""
WITH base AS (
  SELECT vec_id AS id, coalesce(label, -1) AS label,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings),
-- MODAL dim over NON-NULL vectors (ties -> smaller), matching
-- pca_label_projection (a NULL-plurality corpus must not pick d=NULL)
dim AS (SELECT d FROM (SELECT len(v) AS d, count(*) AS c FROM base
        WHERE v IS NOT NULL
        GROUP BY 1 ORDER BY c DESC, d ASC LIMIT 1)),
b AS (SELECT base.* FROM base CROSS JOIN dim WHERE len(v) = d),
n AS (SELECT count(*) AS n FROM b),
flat AS (
  SELECT label, v, r.i, v[r.i] AS xi
  FROM b, unnest(range(1, len(v) + 1)) r(i)),
ms AS (SELECT i, sum(xi) AS si FROM flat GROUP BY i),
ps AS (
  SELECT f.i, r2.j, sum(f.xi * f.v[r2.j]) AS sxy
  FROM flat f, unnest(range(1, len(f.v) + 1)) r2(j)
  GROUP BY f.i, r2.j),
cov AS (
  SELECT p.i, p.j,
         round(p.sxy / n.n - (mi.si / n.n) * (mj.sj / n.n), {PCA_ROUND}) AS c
  FROM ps p
  JOIN ms mi ON mi.i = p.i
  JOIN (SELECT i AS j, si AS sj FROM ms) mj ON mj.j = p.j
  CROSS JOIN n),
v0 AS (
  SELECT r.i, CAST(1.0 AS DOUBLE) / sqrt(d) AS x
  FROM dim, unnest(range(1, d + 1)) r(i)),
{",".join(iters)},
sgn AS (
  SELECT CASE WHEN (SELECT x FROM {last} ORDER BY abs(x) DESC, i LIMIT 1) < 0
         THEN CAST(-1.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END AS s),
vr AS (SELECT i, round(x * sgn.s, {PCA_ROUND}) AS x FROM {last} CROSS JOIN sgn),
mr AS (SELECT i, round(si / n.n, {PCA_ROUND}) AS m FROM ms CROSS JOIN n),
t AS (SELECT vr.i, vr.x, mr.m FROM vr JOIN mr USING (i)),
proj AS (
  SELECT b.id, b.label,
         round(coalesce(sum((b.v[t.i] - t.m) * t.x), {_dbl(0.0)}), {PCA_ROUND}) AS p
  FROM b CROSS JOIN t GROUP BY b.id, b.label)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(sum(p) / count(*), 4) AS mean_proj,
       round(sum(p * p) / count(*) - pow(sum(p) / count(*), 2), 4) AS var_proj
FROM proj GROUP BY label
"""


ORACLES["q117_pca_projection"] = _pca_projection_sql()


def _mmr_sql(k: int = 5, depth: int = 10) -> str:
    """q118 replay: q112's dense ANN leg as the candidate CTE, then
    the MMR greedy UNROLLED one (score, select, accumulate) CTE
    triple per step — λ/μ single-sourced from operators.retrieval,
    rel and pair sims rounded to 6dp before the greedy, max-sim from
    a LEFT JOIN over PRESENT pairs only (coalesce 0.0 — the zero-norm
    contract), ties by doc id. Matches mmr_diversify's cogrouped
    pandas greedy exactly."""
    from .operators.retrieval import MMR_LAMBDA, MMR_MU

    ann = _batch_ann_sql(planes="auto", dim=64, k=depth, query_mod=97)
    lam, mu, z = _dbl(MMR_LAMBDA), _dbl(MMR_MU), _dbl(0.0)
    steps = []
    for t in range(2, k + 1):
        p = f"all{t - 1}"
        steps.append(
            f"""sc{t} AS (
  SELECT c.query_id, c.doc_id,
         {lam} * c.rel - {mu} * coalesce(mx.ms, {z}) AS mmr
  FROM cand c
  LEFT JOIN (
    SELECT p.query_id, p.a AS doc_id, max(p.sim) AS ms
    FROM sims p JOIN {p} s ON s.query_id = p.query_id AND s.doc_id = p.b
    GROUP BY p.query_id, p.a) mx
    ON mx.query_id = c.query_id AND mx.doc_id = c.doc_id
  WHERE NOT EXISTS (SELECT 1 FROM {p} s2
                    WHERE s2.query_id = c.query_id AND s2.doc_id = c.doc_id)),
sel{t} AS (
  SELECT query_id, doc_id, mmr, {t} AS step FROM (
    SELECT query_id, doc_id, mmr,
           row_number() OVER (PARTITION BY query_id ORDER BY mmr DESC, doc_id) AS rk
    FROM sc{t}) WHERE rk = 1),
all{t} AS (SELECT * FROM {p} UNION ALL SELECT * FROM sel{t})"""
        )
    return f"""
WITH cand AS (
  SELECT query_id, vec_id AS doc_id, cos_sim AS rel FROM ({ann}) t),
cv AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) t
  WHERE sqrt(list_dot_product(v, v)) > 0),
sims AS (
  SELECT c1.query_id, c1.doc_id AS a, c2.doc_id AS b,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6) AS sim
  FROM cand c1
  JOIN cand c2 ON c1.query_id = c2.query_id AND c1.doc_id <> c2.doc_id
  JOIN cv va ON va.vec_id = c1.doc_id
  JOIN cv vb ON vb.vec_id = c2.doc_id),
sel1 AS (
  SELECT query_id, doc_id, {lam} * rel - {mu} * {z} AS mmr, 1 AS step FROM (
    SELECT query_id, doc_id, rel,
           row_number() OVER (PARTITION BY query_id
             ORDER BY {lam} * rel - {mu} * {z} DESC, doc_id) AS rk
    FROM cand) WHERE rk = 1),
all1 AS (SELECT * FROM sel1),
{",".join(steps)}
SELECT query_id, doc_id, round(mmr, 6) AS mmr_score, CAST(step AS INT) AS step
FROM all{k}
"""


ORACLES["q118_mmr_rerank"] = _mmr_sql(k=5, depth=10)


ORACLES["q119_calibration"] = f"""
WITH base AS (
  -- ((x % m) + m) % m ≡ Spark pmod (non-negative even for negative x)
  SELECT (((n_chars % 1000) + 1000) % 1000) / {_dbl(1000.0)} AS score,
         coalesce(lang = 'en', false) AS pos
  FROM documents WHERE n_chars IS NOT NULL)
SELECT least(CAST(floor(score * 10) AS INT), 9) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(score) / count(*), 6) AS mean_score,
       round(sum(CASE WHEN pos THEN 1 ELSE 0 END) / count(*), 6) AS frac_pos,
       round(abs(sum(score) / count(*)
                 - sum(CASE WHEN pos THEN 1 ELSE 0 END) / count(*)), 6) AS gap
FROM base GROUP BY 1
"""


def _ecdf_sql() -> str:
    """q120 replay: identical quantize→distinct-value-window→join-back
    plan; group equality via IS NOT DISTINCT FROM to mirror the
    operator's eqNullSafe (the events guard makes NULL groups
    impossible, but the join must not be the thing that depends on
    it). Resolution single-sourced from operators.profile."""
    from .operators.profile import ECDF_RESOLUTION

    return f"""
WITH base AS (
  SELECT event_id AS id, event_type AS grp,
         round(value, {ECDF_RESOLUTION}) AS v
  FROM events WHERE round(value, {ECDF_RESOLUTION}) IS NOT NULL),
cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base),
pv AS (SELECT v, count(*) AS c FROM base GROUP BY v),
gcdf AS (
  SELECT v, round(sum(c) OVER (ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / cnt.n, 6) AS ecdf_global
  FROM pv CROSS JOIN cnt),
pgv AS (SELECT grp, v, count(*) AS cg FROM base GROUP BY grp, v),
gt AS (SELECT grp, count(*) AS ng FROM base GROUP BY grp),
grpc AS (
  SELECT pgv.grp, pgv.v,
         round(sum(cg) OVER (PARTITION BY pgv.grp ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           / CAST(gt.ng AS DOUBLE), 6) AS ecdf_group
  FROM pgv JOIN gt ON gt.grp IS NOT DISTINCT FROM pgv.grp)
SELECT b.id, b.grp, b.v, g.ecdf_global, gc.ecdf_group
FROM base b
JOIN gcdf g ON g.v = b.v
JOIN grpc gc ON gc.v = b.v AND gc.grp IS NOT DISTINCT FROM b.grp
"""


ORACLES["q120_ecdf_transform"] = _ecdf_sql()


ORACLES["q122_copurchase_pairs"] = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
counts AS (SELECT part_a, part_b, count(*) AS support FROM pairs GROUP BY 1, 2)
SELECT part_a, part_b, support, CAST(rank AS INT) AS rank FROM (
  SELECT part_a, part_b, support,
         row_number() OVER (ORDER BY support DESC, part_a, part_b) AS rank
  FROM counts)
WHERE rank <= 20
"""


def _bootstrap_ci_sql() -> str:
    """q123 replay: replicate membership = bit b of the salted 60-bit
    md5 of the ROW (one digest per row, the operator's recipe),
    rank-indexed percentiles over each group's replicate means (no
    interpolation), B single-sourced from queries."""
    from .queries import BOOTSTRAP_REPS

    p05, p95 = _dbl(0.05), _dbl(0.95)
    return f"""
WITH base AS (
  SELECT event_type, value,
         CAST(('0x' || substr(md5('boot:' || CAST(event_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events WHERE value IS NOT NULL),
rep AS (
  SELECT event_type, value, r.b
  FROM base, unnest(range(0, {BOOTSTRAP_REPS})) r(b)
  WHERE ((h >> r.b) & 1) = 1),
means AS (
  -- 6dp round BEFORE the rank window (operator convention: ties then
  -- break deterministically on b, immune to fp summation order)
  SELECT event_type, b, round(sum(value) / count(*), 6) AS m
  FROM rep GROUP BY 1, 2),
ranked AS (
  SELECT event_type, m,
         row_number() OVER (PARTITION BY event_type ORDER BY m, b) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n_b
  FROM means)
SELECT event_type, CAST(max(n_b) AS BIGINT) AS n_reps,
       round(sum(m) / count(*), 6) AS boot_mean,
       round(max(CASE WHEN rk = greatest(1, CAST(floor(n_b * {p05}) AS INT))
                 THEN m END), 6) AS ci_lo,
       round(max(CASE WHEN rk = least(n_b, CAST(ceil(n_b * {p95}) AS INT))
                 THEN m END), 6) AS ci_hi
FROM ranked GROUP BY event_type
"""


ORACLES["q123_bootstrap_ci"] = _bootstrap_ci_sql()


def _source_overlap_sql(num_hashes: int = 12) -> str:
    """q124 replay: the minhash_bands digest recipe (one md5 per two
    slots, halves as independent 64-bit keys) aggregated per SOURCE
    over its distinct token set; pairwise slot agreement / n."""
    toks = _TOKS.format(col="lower(text)")
    slots = ", ".join(
        f"min(substr(md5('s{s // 2}:' || e), {1 + 16 * (s % 2)}, 16)) AS s{s}"
        for s in range(num_hashes)
    )
    matches = " + ".join(
        f"(CASE WHEN a.s{s} = b.s{s} THEN 1 ELSE 0 END)" for s in range(num_hashes)
    )
    return f"""
WITH ex AS (
  SELECT DISTINCT source AS g, unnest(toks) AS e
  FROM (SELECT source, {toks} AS toks FROM documents)
  WHERE source IS NOT NULL),
sig AS (SELECT g, {slots} FROM ex GROUP BY g)
SELECT a.g AS group_a, b.g AS group_b,
       round(({matches}) / {_dbl(float(num_hashes))}, 6) AS est_jaccard,
       {num_hashes} AS n_slots
FROM sig a JOIN sig b ON a.g < b.g
"""


ORACLES["q124_source_overlap"] = _source_overlap_sql()


ORACLES["q125_shipping_priority"] = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


ORACLES["q126_local_supplier_volume"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


ORACLES["q127_large_volume_customers"] = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
SELECT c_name, c_custkey, big.l_orderkey AS o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(o_totalprice, 2) AS total_price,
       round(qty, 2) AS total_qty
FROM big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


ORACLES["q128_returned_items"] = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def _pmi_collocations_sql() -> str:
    """q129 replay: strict adjacent pairs from the shared tokenize,
    marginals re-aggregated from the pair table, all-double PMI
    arithmetic (matching the operator's IEEE expression), min-count
    floor and top-k single-sourced from operators.text."""
    from .operators.text import PMI_MIN_COUNT, PMI_TOP_K

    toks = _TOKS.format(col="lower(text)")
    return f"""
WITH d AS (SELECT {toks} AS t FROM documents),
pairs AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM d, unnest(range(1, len(t))) AS r(i)),
bi AS (SELECT w1, w2, count(*) AS pair_count FROM pairs GROUP BY w1, w2),
lm AS (SELECT w1, sum(pair_count) AS c1 FROM bi GROUP BY w1),
rm AS (SELECT w2, sum(pair_count) AS c2 FROM bi GROUP BY w2),
tot AS (SELECT sum(pair_count) AS n_total FROM bi),
scored AS (
  SELECT bi.w1, bi.w2, bi.pair_count,
         round(ln((CAST(bi.pair_count AS DOUBLE) * CAST(tot.n_total AS DOUBLE))
                  / (CAST(lm.c1 AS DOUBLE) * CAST(rm.c2 AS DOUBLE))), 6) AS pmi
  FROM bi JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tot
  WHERE bi.pair_count >= {PMI_MIN_COUNT})
SELECT w1, w2, pair_count, pmi, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rank FROM scored)
WHERE rank <= {PMI_TOP_K}
"""


ORACLES["q129_pmi_collocations"] = _pmi_collocations_sql()


ORACLES["q130_path_trigrams"] = """
WITH tri AS (
  SELECT event_type AS step1,
         lead(event_type, 1) OVER w AS step2,
         lead(event_type, 2) OVER w AS step3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
counts AS (
  SELECT step1, step2, step3, count(*) AS n_paths
  FROM tri WHERE step2 IS NOT NULL AND step3 IS NOT NULL
  GROUP BY 1, 2, 3)
SELECT step1, step2, step3, n_paths, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_paths DESC, step1, step2, step3) AS rank
  FROM counts)
WHERE rank <= 20
"""


def _cross_rerank_sql(k: int = 5, depth: int = 10) -> str:
    """q132 replay: the q106 BM25 and q103 ANN chains (same %97 eval
    split, same depth as q112) unioned into a distinct candidate set,
    re-scored by the default token-set Jaccard cross-score over the
    FULL query/candidate texts (list_intersect / list_distinct sizes
    — set semantics, order-independent), 6dp-rounded before the
    per-query rank, ties by doc id. Constants single-sourced from
    operators.retrieval."""
    from .operators.retrieval import CROSS_RERANK_K  # noqa: F401 - doc anchor

    lex = _bm25_sql(k=depth)
    den = _batch_ann_sql(planes="auto", dim=64, k=depth, query_mod=97)
    toks = _TOKS.format(col="lower(text)")
    return f"""
WITH lex AS (SELECT query_id, doc_id FROM ({lex}) t),
den AS (SELECT query_id, vec_id AS doc_id FROM ({den}) t),
cand AS (
  SELECT DISTINCT query_id, doc_id
  FROM (SELECT * FROM lex UNION ALL SELECT * FROM den)),
qt AS (SELECT doc_id AS query_id, list_distinct({toks}) AS q_toks
       FROM documents WHERE doc_id % 97 = 0),
dt AS (SELECT doc_id, list_distinct({toks}) AS d_toks FROM documents),
scored AS (
  SELECT c.query_id, c.doc_id,
    round(CASE WHEN len(list_distinct(list_concat(qt.q_toks, dt.d_toks))) > 0
          THEN CAST(len(list_intersect(qt.q_toks, dt.d_toks)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(qt.q_toks, dt.d_toks))) AS DOUBLE)
          ELSE {_dbl(0.0)} END, 6) AS cross_score
  FROM cand c JOIN qt USING (query_id) JOIN dt USING (doc_id))
SELECT query_id, doc_id, cross_score, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, doc_id, cross_score,
    row_number() OVER (PARTITION BY query_id ORDER BY cross_score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


ORACLES["q132_cross_rerank"] = _cross_rerank_sql(k=5, depth=10)


def _dsir_sql() -> str:
    """q133 replay: one tokenize feeds both unigram LMs; the log-ratio
    dictionary re-joins the raw postings; N_T/N_R/V come from the lm
    CTE (exact integers as doubles, same values the Spark side embeds
    as literals); rank on the 6dp-ROUNDED per-token importance, ties
    by doc id, cut-then-rank. Smoothing/top-k single-sourced from
    operators.sampling. sum() casts to BIGINT (DuckDB sums to HUGEINT
    — the q40-r2 rendering lesson)."""
    from .operators.sampling import DSIR_SMOOTHING, DSIR_TOP_K

    a = _dbl(DSIR_SMOOTHING)
    toks = _TOKS.format(col="lower(text)")
    return f"""
WITH base AS (SELECT doc_id, (doc_id % 97 = 0) AS t, {toks} AS tk FROM documents),
terms AS (SELECT doc_id, t, unnest(tk) AS term FROM base),
tf AS (SELECT doc_id, t, term, count(*) AS tf FROM terms GROUP BY 1, 2, 3),
ctt AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ct_t FROM tf WHERE t GROUP BY term),
ctr AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ct_r FROM tf WHERE NOT t GROUP BY term),
lm AS (
  SELECT coalesce(ctt.term, ctr.term) AS term,
         coalesce(ct_t, 0) AS ct_t, coalesce(ct_r, 0) AS ct_r
  FROM ctt FULL OUTER JOIN ctr ON ctt.term = ctr.term),
s AS (SELECT CAST(sum(ct_t) AS DOUBLE) AS nt, CAST(sum(ct_r) AS DOUBLE) AS nr,
             CAST(count(*) AS DOUBLE) AS v FROM lm),
ratio AS (
  SELECT term,
         ln((ct_t + {a}) / (s.nt + {a} * s.v))
       - ln((ct_r + {a}) / (s.nr + {a} * s.v)) AS lr
  FROM lm CROSS JOIN s),
scored AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl, sum(tf * lr) AS lw
  FROM tf JOIN ratio USING (term) WHERE NOT t GROUP BY doc_id),
full_t AS (
  SELECT b.doc_id,
         coalesce(dl, 0) AS n_tokens,
         round(coalesce(lw, {_dbl(0.0)}), 6) AS logw,
         round(CASE WHEN dl > 0 THEN lw / dl ELSE {_dbl(0.0)} END, 6) AS avg_logw
  FROM (SELECT doc_id FROM base WHERE NOT t) b LEFT JOIN scored USING (doc_id)),
top AS (SELECT * FROM full_t ORDER BY avg_logw DESC, doc_id LIMIT {DSIR_TOP_K})
SELECT doc_id, n_tokens, logw, avg_logw,
       CAST(row_number() OVER (ORDER BY avg_logw DESC, doc_id) AS INT) AS rank
FROM top
"""


ORACLES["q133_dsir_selection"] = _dsir_sql()


def _temperature_mixture_sql() -> str:
    """q134 replay: per-source token totals from the SHARED _TOKS
    tokenizer (never an inline copy — the r5 review caught the drift
    hazard), pow(n, 1/T) weights, 1-row normalizer, guarded divisions
    so zero-token sources stay visible with 0.0 everywhere."""
    toks = _TOKS.format(col="text")
    return f"""
WITH sz AS (SELECT source, CAST(len({toks}) AS BIGINT) AS n
            FROM documents WHERE source IS NOT NULL),
sizes AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tok FROM sz GROUP BY source),
w AS (SELECT source, n_tok, pow(CAST(n_tok AS DOUBLE), {_dbl(0.5)}) AS w FROM sizes),
t AS (SELECT coalesce(sum(w), {_dbl(0.0)}) AS tw FROM w)
SELECT source, n_tok AS n_tokens, round(w, 6) AS weight,
       round(CASE WHEN tw > 0 THEN w / tw ELSE {_dbl(0.0)} END, 6) AS p,
       round(CASE WHEN n_tok > 0 AND tw > 0
             THEN w / tw * {_dbl(1_000_000.0)} / n_tok
             ELSE {_dbl(0.0)} END, 6) AS epochs
FROM w CROSS JOIN t
"""


ORACLES["q134_temperature_mixture"] = _temperature_mixture_sql()


def _pq_sql() -> str:
    """q135 replay: one prefixed Lloyd fit per subspace over the SAME
    bounded smallest-id training sample (the generalized
    _lloyd_kmeans_cte_list), slice bounds derived from the modal dim
    at query time (len = max(len) filter on both engines), distortion
    = exact squared-diff fold to the assigned final centroid (same
    arithmetic as the operator's sqdist — sqrt-then-square would add
    ~1-ulp noise under the 6dp round), per-
    (subspace, code) counts and 6dp mean. Shape constants single-
    sourced from operators.similarity.PQ_CONFIG."""
    from .operators.similarity import PQ_CONFIG

    m, k = PQ_CONFIG["m"], PQ_CONFIG["k"]
    iters, sample_n = PQ_CONFIG["iters"], PQ_CONFIG["sample_n"]
    # MODAL dim (ties → smaller), matching pq_codebook_stats
    dimq = (
        "(SELECT d FROM (SELECT len(CAST(embedding AS DOUBLE[])) AS d, "
        "count(*) AS c FROM embeddings WHERE embedding IS NOT NULL "
        "GROUP BY 1 ORDER BY c DESC, d ASC LIMIT 1))"
    )
    where = f"embedding IS NOT NULL AND len(CAST(embedding AS DOUBLE[])) = {dimq}"
    ctes: list[str] = []
    parts: list[str] = []
    for mi in range(m):
        sub = f"list_slice(CAST(embedding AS DOUBLE[]), {mi} * ({dimq} // {m}) + 1, {mi + 1} * ({dimq} // {m}))"
        ctes += _lloyd_kmeans_cte_list(
            k, iters, sub, train_limit=sample_n, prefix=f"s{mi}_", where=where
        )
        parts.append(
            f"SELECT {mi} AS subspace, CAST(f.cluster AS INT) AS code, "
            f"CAST(count(*) AS BIGINT) AS n_vecs, "
            f"round(sum(list_sum(list_transform(list_zip(f.v, c.c), "
            f"x -> (x[1] - x[2]) * (x[1] - x[2])))) / count(*), 6) AS mean_sqdist "
            f"FROM s{mi}_afin f JOIN s{mi}_c{iters} c USING (cluster) "
            f"GROUP BY f.cluster"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(parts)
        + "\n) ORDER BY subspace, code"
    )


ORACLES["q135_pq_codebook"] = _pq_sql()


def _ngram_novelty_sql() -> str:
    """q136 replay: the shared tokenize + word-shingle macro at the
    novelty n, shingle document-frequency from the distinct-per-doc
    shingle table, LEFT JOIN back so zero-shingle docs read
    (0, 0, 0.0, false); flag compares the ROUNDED rate. Constants
    single-sourced from operators.dedup."""
    from .operators.dedup import NOVELTY_DUP_THRESHOLD, NOVELTY_SHINGLE_N

    toks = _TOKS.format(col="lower(text)")
    grams = _grams_sql(NOVELTY_SHINGLE_N)
    thr = _dbl(NOVELTY_DUP_THRESHOLD)
    rate = (
        "round(CASE WHEN coalesce(n_sh, 0) > 0 "
        f"THEN coalesce(n_dup, 0) / CAST(n_sh AS DOUBLE) ELSE {_dbl(0.0)} END, 6)"
    )
    return f"""
WITH toks AS (SELECT doc_id, {toks} AS t FROM documents),
sh AS (SELECT doc_id, unnest({grams}) AS s FROM toks),
dft AS (SELECT s, count(*) AS c FROM sh GROUP BY s),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh,
         CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM sh JOIN dft USING (s) GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(n_sh, 0) AS n_shingles,
       coalesce(n_dup, 0) AS n_duplicated,
       {rate} AS dup_rate,
       {rate} > {thr} AS is_memorized
FROM documents d LEFT JOIN per USING (doc_id)
"""


ORACLES["q136_ngram_novelty"] = _ngram_novelty_sql()


def _fk_audit_sql() -> str:
    """q137 replay: per relationship, one LEFT JOIN of the child's
    non-null keys against the parent's distinct non-null keys —
    orphan = no match; same exclusion rule as the operator (NULL is
    not a reference)."""
    rels = [
        ("doc_to_emb", "documents", "doc_id", "embeddings", "vec_id"),
        ("emb_to_doc", "embeddings", "vec_id", "documents", "doc_id"),
        ("order_to_cust", "orders", "o_custkey", "customer", "c_custkey"),
        ("item_to_order", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ]
    parts = []
    for name, child, ck, parent, pk in rels:
        parts.append(
            f"""
SELECT '{name}' AS relationship, n_child, n_orphans,
       round(CASE WHEN n_child > 0
             THEN n_orphans / CAST(n_child AS DOUBLE)
             ELSE {_dbl(0.0)} END, 6) AS orphan_rate
FROM (
  SELECT CAST(count(*) AS BIGINT) AS n_child,
         CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
  FROM (SELECT {ck} AS k FROM {child} WHERE {ck} IS NOT NULL) c
  LEFT JOIN (SELECT DISTINCT {pk} AS k FROM {parent} WHERE {pk} IS NOT NULL) p
    USING (k))"""
        )
    return "\nUNION ALL\n".join(parts)


ORACLES["q137_fk_audit"] = _fk_audit_sql()


def _join_advisor_sql() -> str:
    """q138 replay: per side, the key-dictionary aggregate then a
    (count, rounded max-share) reduction, cross-joined and pushed
    through the same threshold CASE; thresholds single-sourced from
    operators.relational; the strategy compares the 6dp-ROUNDED
    share (the operator's cut)."""
    from .operators.relational import ADVISOR_BROADCAST_ROWS, ADVISOR_SKEW_SHARE

    rels = [
        ("item_x_order", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("item_x_part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("order_x_cust", "orders", "o_custkey", "customer", "c_custkey"),
        ("doc_x_emb", "documents", "doc_id", "embeddings", "vec_id"),
    ]
    thr = _dbl(ADVISOR_SKEW_SHARE)

    def side(table, key, p):
        return (
            f"(SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS {p}_rows, "
            f"round(coalesce(max(c) / CAST(sum(c) AS DOUBLE), {_dbl(0.0)}), 6) "
            f"AS {p}_max_share FROM "
            f"(SELECT count(*) AS c FROM {table} WHERE {key} IS NOT NULL "
            f"GROUP BY {key}))"
        )

    parts = []
    for name, lt, lk, rt, rk in rels:
        parts.append(
            f"""
SELECT '{name}' AS join_name, l_rows AS left_rows, r_rows AS right_rows,
       l_max_share AS left_max_share, r_max_share AS right_max_share,
       CASE WHEN r_rows <= {ADVISOR_BROADCAST_ROWS} AND r_rows <= l_rows
              THEN 'broadcast_right'
            WHEN l_rows <= {ADVISOR_BROADCAST_ROWS} THEN 'broadcast_left'
            WHEN r_rows <= {ADVISOR_BROADCAST_ROWS} THEN 'broadcast_right'
            WHEN l_max_share > {thr} OR r_max_share > {thr}
              THEN 'salted_shuffle'
            ELSE 'shuffle_hash' END AS strategy
FROM {side(lt, lk, 'l')} CROSS JOIN {side(rt, rk, 'r')}"""
        )
    return "\nUNION ALL\n".join(parts)


ORACLES["q138_join_advisor"] = _join_advisor_sql()


def _exact_substring_sql() -> str:
    """q139 replay: one md5 per sliding min_run-token window, the
    segment_dedup first-occurrence election (row_number over (doc,
    pos)), coverage test per token via a bounded range-join against
    the per-doc duplicate positions, rebuild via ordered string_agg
    over the survivors. Same colliding-id election as q77. Constant
    single-sourced from operators.dedup."""
    from .operators.dedup import EXACT_SUBSTR_MIN_RUN as K

    toks = _TOKS.format(col="text")
    return f"""
WITH d AS (
  SELECT doc_id, {toks} AS t FROM documents
  QUALIFY row_number() OVER (
    PARTITION BY doc_id ORDER BY md5(coalesce(text, ''))) = 1
),
occ AS (
  SELECT doc_id, i AS p, md5(array_to_string(t[i : i + {K - 1}], ' ')) AS h
  FROM d, LATERAL unnest(range(1, len(t) - {K - 2})) r(i)
  WHERE len(t) >= {K}
),
dups AS (
  SELECT doc_id, p FROM (
    SELECT doc_id, p,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn
    FROM occ) WHERE rn > 1
),
flat AS (
  SELECT doc_id, generate_subscripts(t, 1) AS i, unnest(t) AS tok FROM d
),
rem AS (
  SELECT f.doc_id, f.i, f.tok,
         EXISTS (SELECT 1 FROM dups x WHERE x.doc_id = f.doc_id
                 AND f.i BETWEEN x.p AND x.p + {K - 1}) AS removed
  FROM flat f
),
per AS (
  SELECT doc_id,
         CAST(count(*) AS INT) AS n_tokens,
         CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS INT) AS n_removed,
         coalesce(string_agg(CASE WHEN NOT removed THEN tok END,
                             ' ' ORDER BY i), '') AS clean_text
  FROM rem GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(n_tokens, 0) AS n_tokens,
       coalesce(n_removed, 0) AS n_removed,
       coalesce(clean_text, '') AS clean_text
FROM d LEFT JOIN per USING (doc_id)
"""


ORACLES["q139_exact_substring_dedup"] = _exact_substring_sql()


def _bpe_encode_sql() -> str:
    """q140 replay: the greedy left-to-right merge fold as an iterated
    boundary-anchored string replace run to fixpoint per merge inside
    ONE recursive CTE over the distinct-word table ('|a|b|'→'|ab|';
    equal to the fold because every BPE_FIXED_MERGES pair has a != b —
    see plans/bpe.py), then the word→token-count dictionary joins the
    doc word stream back. Merges ride as literals, single-sourced."""
    from .plans.bpe import BPE_FIXED_MERGES

    n = len(BPE_FIXED_MERGES)
    arms = " ".join(
        f"WHEN {i} THEN replace(s, '|{a}|{b}|', '|{a}{b}|')"
        for i, (a, b) in enumerate(BPE_FIXED_MERGES)
    )
    return f"""
WITH RECURSIVE words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS w
  FROM documents),
vocab AS (SELECT DISTINCT w FROM words),
enc AS (
  SELECT w, '|' || array_to_string(string_split(w, ''), '|') || '|' AS s,
         0 AS mi
  FROM vocab
  UNION ALL
  SELECT w, CASE WHEN r <> s THEN r ELSE s END,
         CASE WHEN r <> s THEN mi ELSE mi + 1 END
  FROM (SELECT w, s, mi, CASE mi {arms} END AS r
        FROM enc WHERE mi < {n}) t
),
lens AS (
  SELECT w, length(s) - length(replace(s, '|', '')) - 1 AS tok_len
  FROM enc WHERE mi = {n}),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(tok_len) AS BIGINT) AS n_tokens
  FROM words JOIN lens USING (w) GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(n_words, 0) AS n_words,
       coalesce(n_tokens, 0) AS n_tokens,
       round(CASE WHEN coalesce(n_words, 0) > 0
             THEN n_tokens / CAST(n_words AS DOUBLE)
             ELSE {_dbl(0.0)} END, 6) AS fertility
FROM documents d LEFT JOIN per USING (doc_id)
"""


ORACLES["q140_bpe_encode"] = _bpe_encode_sql()


# Modal-dim subquery + valid-row filter shared by every PQ/embedding-
# prefix oracle (matches _pq_base + _pq_fit's election exactly).
_PQ_DIMQ = (
    "(SELECT d FROM (SELECT len(CAST(embedding AS DOUBLE[])) AS d, "
    "count(*) AS c FROM embeddings WHERE embedding IS NOT NULL "
    "GROUP BY 1 ORDER BY c DESC, d ASC LIMIT 1))"
)
_PQ_WHERE = f"embedding IS NOT NULL AND len(CAST(embedding AS DOUBLE[])) = {_PQ_DIMQ}"
_SQDIFF = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> (x[1] - x[2]) * (x[1] - x[2])))"
)


def _pq_adc_parts() -> tuple[list[str], str, str, str]:
    """Shared q141/q142 ADC machinery: the q135 per-subspace Lloyd
    CTEs (same prefixes, same modal-dim slice bounds), per-subspace
    distance CTEs d{mi} (query slice vs assigned final centroid, exact
    squared-diff fold), and the FIXED left-associative m-term ADC sum
    (bit-identical IEEE addition to the Spark expression). Returns
    (ctes incl. qids + d{mi}, adc expr, joins clause, adc_top cte)."""
    from .operators.similarity import PQ_CONFIG, PQ_SEARCH_QUERIES, PQ_SEARCH_TOPK

    m, k = PQ_CONFIG["m"], PQ_CONFIG["k"]
    iters, sample_n = PQ_CONFIG["iters"], PQ_CONFIG["sample_n"]
    ctes: list[str] = []
    dists: list[str] = []
    for mi in range(m):
        sub = (
            f"list_slice(CAST(embedding AS DOUBLE[]), "
            f"{mi} * ({_PQ_DIMQ} // {m}) + 1, {mi + 1} * ({_PQ_DIMQ} // {m}))"
        )
        ctes += _lloyd_kmeans_cte_list(
            k, iters, sub, train_limit=sample_n, prefix=f"s{mi}_", where=_PQ_WHERE
        )
        pair = _SQDIFF.format(a="q.v", b="c.c")
        dists.append(
            f"d{mi} AS ("
            f"SELECT q.vec_id AS qid, a.vec_id AS vid, {pair} AS d "
            f"FROM s{mi}_afin a JOIN s{mi}_c{iters} c USING (cluster) "
            f"CROSS JOIN (SELECT f.vec_id, f.v FROM s{mi}_feats f "
            f"JOIN qids USING (vec_id)) q "
            f"WHERE a.vec_id <> q.vec_id)"
        )
    ctes.append(
        f"qids AS (SELECT vec_id FROM s0_feats ORDER BY vec_id "
        f"LIMIT {PQ_SEARCH_QUERIES})"
    )
    ctes += dists
    adc = " + ".join(f"d{mi}.d" for mi in range(m))
    joins = " ".join(f"JOIN d{mi} USING (qid, vid)" for mi in range(1, m))
    adc_top = (
        f"adc_top AS (SELECT qid, vid, adc_dist, rank FROM ("
        f"SELECT qid, vid, round({adc}, 6) AS adc_dist, "
        f"row_number() OVER (PARTITION BY qid "
        f"ORDER BY round({adc}, 6), vid) AS rank "
        f"FROM d0 {joins}) WHERE rank <= {PQ_SEARCH_TOPK})"
    )
    return ctes, adc, joins, adc_top


def _pq_search_sql() -> str:
    """q141 replay — see _pq_adc_parts; rank over the 6dp-rounded
    distance then id. Shape constants single-sourced from
    operators.similarity."""
    ctes, _adc, _joins, adc_top = _pq_adc_parts()
    return (
        "WITH "
        + ",\n".join([*ctes, adc_top])
        + """
SELECT qid AS query_id, vid AS vec_id, adc_dist, CAST(rank AS INT) AS rank
FROM adc_top
"""
    )


ORACLES["q141_pq_search"] = _pq_search_sql()


def _pq_recall_sql() -> str:
    """q142 replay: the q141 ADC top-k verbatim, exact squared-
    euclidean top-k from one full-vector scored pass (same 6dp-round +
    id tie rule), per-query intersection count, recall = m/k as an
    explicit DOUBLE division. Zero-match queries read (0, 0.0) via the
    qids spine."""
    from .operators.similarity import PQ_SEARCH_TOPK

    ctes, _adc, _joins, adc_top = _pq_adc_parts()
    ex_pair = _SQDIFF.format(a="q.v", b="a.v")
    exact = (
        f"vfeats AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings WHERE {_PQ_WHERE}),"
        f"ex_top AS (SELECT qid, vid FROM ("
        f"SELECT q.vec_id AS qid, a.vec_id AS vid, "
        f"row_number() OVER (PARTITION BY q.vec_id "
        f"ORDER BY round({ex_pair}, 6), a.vec_id) AS rn "
        f"FROM vfeats a CROSS JOIN "
        f"(SELECT f.vec_id, f.v FROM vfeats f JOIN qids USING (vec_id)) q "
        f"WHERE a.vec_id <> q.vec_id) WHERE rn <= {PQ_SEARCH_TOPK})"
    )
    return (
        "WITH "
        + ",\n".join([*ctes, adc_top, exact])
        + f""",
matched AS (
  SELECT a.qid, count(*) AS m
  FROM adc_top a JOIN ex_top e ON e.qid = a.qid AND e.vid = a.vid
  GROUP BY a.qid)
SELECT qids.vec_id AS query_id,
       coalesce(m, 0) AS n_matched,
       round(CAST(coalesce(m, 0) AS DOUBLE) / {PQ_SEARCH_TOPK}, 6) AS recall
FROM qids LEFT JOIN matched ON matched.qid = qids.vec_id
"""
    )


ORACLES["q142_pq_recall"] = _pq_recall_sql()


def _ivf_pq_parts() -> tuple[list[str], str]:
    """Shared q147/q148 machinery — the q141 ADC CTEs verbatim
    (_pq_adc_parts: per-subspace Lloyd fits, d{mi} distance CTEs, fixed
    left-assoc ADC sum) composed with the q30 quantizer contract
    (bounded-sample Lloyd fit on the FULL vector, prefix ivf_): per-
    query probe list = the IVF_PQ_NPROBE centroids nearest by squared
    euclidean (ties → lowest cluster), candidates = probed-list members
    minus self, ADC top-k restricted to candidates. Shape constants
    single-sourced from operators.similarity / plans.kmeans. Returns
    (cte list incl. adc_top, final adc_top name)."""
    from .operators.similarity import IVF_PQ_NPROBE, PQ_SEARCH_TOPK
    from .plans.kmeans import IVF_QUANTIZER

    ctes, adc, joins, _adc_top = _pq_adc_parts()
    ivf_ctes = _lloyd_kmeans_cte_list(
        IVF_QUANTIZER["k"],
        IVF_QUANTIZER["iters"],
        "CAST(embedding AS DOUBLE[])",
        train_limit=IVF_QUANTIZER["sample_n"],
        prefix="ivf_",
        where=_PQ_WHERE,
    )
    it = IVF_QUANTIZER["iters"]
    probe_d = _SQDIFF.format(a="q.v", b="c.c")
    routing = [
        "qfeats AS (SELECT f.vec_id, f.v FROM ivf_feats f JOIN qids USING (vec_id))",
        f"qprobe AS (SELECT q.vec_id AS qid, c.cluster, "
        f"row_number() OVER (PARTITION BY q.vec_id "
        f"ORDER BY {probe_d}, c.cluster) AS pr "
        f"FROM qfeats q CROSS JOIN ivf_c{it} c)",
        f"probe AS (SELECT qid, cluster FROM qprobe WHERE pr <= {IVF_PQ_NPROBE})",
        "cand AS (SELECT p.qid, a.vec_id AS vid FROM ivf_afin a "
        "JOIN probe p ON a.cluster = p.cluster WHERE a.vec_id <> p.qid)",
    ]
    adc_top = (
        f"adc_top AS (SELECT qid, vid, adc_dist, rank FROM ("
        f"SELECT d0.qid, d0.vid, round({adc}, 6) AS adc_dist, "
        f"row_number() OVER (PARTITION BY d0.qid "
        f"ORDER BY round({adc}, 6), d0.vid) AS rank "
        f"FROM d0 {joins} JOIN cand ON cand.qid = d0.qid AND cand.vid = d0.vid"
        f") WHERE rank <= {PQ_SEARCH_TOPK})"
    )
    return [*ivf_ctes, *ctes, *routing, adc_top], "adc_top"


def _ivf_pq_search_sql() -> str:
    """q147 replay — see _ivf_pq_parts."""
    ctes, top = _ivf_pq_parts()
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT qid AS query_id, vid AS vec_id, adc_dist, CAST(rank AS INT) AS rank
FROM {top}
"""
    )


ORACLES["q147_ivf_pq_search"] = _ivf_pq_search_sql()


def _ivf_pq_recall_sql() -> str:
    """q148 replay: the q147 routed top-k verbatim, the q142 exact
    squared-euclidean top-k (same 6dp-round + id tie rule), per-query
    intersection over the qids spine — the routing-loss dial."""
    from .operators.similarity import PQ_SEARCH_TOPK

    ctes, top = _ivf_pq_parts()
    ex_pair = _SQDIFF.format(a="q.v", b="a.v")
    exact = (
        f"vfeats AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings WHERE {_PQ_WHERE}),"
        f"ex_top AS (SELECT qid, vid FROM ("
        f"SELECT q.vec_id AS qid, a.vec_id AS vid, "
        f"row_number() OVER (PARTITION BY q.vec_id "
        f"ORDER BY round({ex_pair}, 6), a.vec_id) AS rn "
        f"FROM vfeats a CROSS JOIN "
        f"(SELECT f.vec_id, f.v FROM vfeats f JOIN qids USING (vec_id)) q "
        f"WHERE a.vec_id <> q.vec_id) WHERE rn <= {PQ_SEARCH_TOPK})"
    )
    return (
        "WITH "
        + ",\n".join([*ctes, exact])
        + f""",
matched AS (
  SELECT a.qid, count(*) AS m
  FROM {top} a JOIN ex_top e ON e.qid = a.qid AND e.vid = a.vid
  GROUP BY a.qid)
SELECT qids.vec_id AS query_id,
       coalesce(m, 0) AS n_matched,
       round(CAST(coalesce(m, 0) AS DOUBLE) / {PQ_SEARCH_TOPK}, 6) AS recall
FROM qids LEFT JOIN matched ON matched.qid = qids.vec_id
"""
    )


ORACLES["q148_ivf_pq_recall"] = _ivf_pq_recall_sql()


def _charset_audit_sql() -> str:
    """q149 replay — patterns single-sourced from operators.text
    (literal mojibake chars + \\x escapes both Java regex and RE2 read
    identically); token fractions are corpus-level Σhits/Σtokens per
    source, zero when a source has zero tokens."""
    from .operators.text import (
        CTRL_PATTERN,
        DIGIT_TOKEN_PATTERN,
        MOJIBAKE_PATTERN,
        NON_ASCII_PATTERN,
        UPPER_TOKEN_PATTERN,
    )

    toks = _TOKS.format(col="text")

    def flag(pat: str) -> str:
        esc = pat.replace("'", "''")
        return f"CASE WHEN regexp_matches(coalesce(text, ''), '{esc}') THEN 1 ELSE 0 END"

    def frac(col: str) -> str:
        return (
            f"round(CASE WHEN sum(nt) > 0 THEN CAST(sum({col}) AS DOUBLE) / sum(nt) "
            f"ELSE 0.0 END, 6)"
        )

    return f"""
WITH d AS (
  SELECT source,
    len({toks}) AS nt,
    len(list_filter({toks}, x -> regexp_matches(x, '{UPPER_TOKEN_PATTERN}'))) AS nu,
    len(list_filter({toks}, x -> regexp_matches(x, '{DIGIT_TOKEN_PATTERN}'))) AS nd,
    {flag(MOJIBAKE_PATTERN)} AS moji,
    {flag(CTRL_PATTERN)} AS ctrl,
    {flag("�")} AS repl,
    {flag(NON_ASCII_PATTERN)} AS nonascii
  FROM documents
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(moji) AS BIGINT) AS n_mojibake_docs,
  CAST(sum(ctrl) AS BIGINT) AS n_ctrl_docs,
  CAST(sum(repl) AS BIGINT) AS n_replacement_docs,
  CAST(sum(nonascii) AS BIGINT) AS n_non_ascii_docs,
  {frac('nu')} AS upper_token_frac,
  {frac('nd')} AS digit_token_frac
FROM d GROUP BY source
"""


ORACLES["q149_charset_audit"] = _charset_audit_sql()


# q150: per-dimension embedding profile — unnest + generate_subscripts
# replays posexplode; population std, exact zero fraction.
ORACLES["q150_embedding_dim_profile"] = """
WITH v AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
),
x AS (SELECT generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM v)
SELECT CAST(dim AS INT) AS dim,
  CAST(count(*) AS BIGINT) AS n,
  round(avg(x), 6) AS mean,
  round(sqrt(var_pop(x)), 6) AS std,
  round(min(x), 6) AS min_x,
  round(max(x), 6) AS max_x,
  round(avg(CASE WHEN x = 0 THEN 1.0 ELSE 0.0 END), 6) AS zero_frac
FROM x GROUP BY dim
"""


# q151: anisotropy — E[cos(u,v)] over pairs = ||mean(û)||² for unit
# vectors (the n²-pairs average in closed form); zero-norm dropped.
ORACLES["q151_anisotropy"] = """
WITH b AS (
  SELECT v, sqrt(list_dot_product(v, v)) AS n
  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE embedding IS NOT NULL)
  WHERE sqrt(list_dot_product(v, v)) > 0
),
u AS (SELECT n, list_transform(v, e -> e / n) AS u FROM b),
x AS (SELECT n, generate_subscripts(u, 1) AS pos, unnest(u) AS ux FROM u),
pd AS (SELECT pos, avg(ux) AS mu, count(*) AS c, sum(n) AS sn FROM x GROUP BY pos)
SELECT CAST(max(c) AS BIGINT) AS n_vecs,
  round(max(sn / c), 6) AS mean_norm,
  round(sum(mu * mu), 6) AS anisotropy
FROM pd
"""


def _matryoshka_sql() -> str:
    """q143 replay: one valid-vector CTE, per-prefix cosine candidates
    (prefix slices share the array; zero-magnitude slices drop for
    that prefix only), rank per (prefix, query) over the 6dp-rounded
    cosine desc then id, full-dim top-k as truth, spine × left join so
    a zero-match (prefix, query) reads (0, 0.0). Prefixes >= the modal
    dim are excluded on BOTH engines (not a truncation). Constants
    single-sourced from operators.similarity."""
    from .operators.similarity import (
        MATRYOSHKA_PREFIXES,
        MATRYOSHKA_QUERIES,
        MATRYOSHKA_TOPK,
    )

    def cos_block(d_expr: str) -> str:
        return (
            f"list_sum(list_transform(list_zip(q.v[1:{d_expr}], a.v[1:{d_expr}]), "
            f"x -> x[1] * x[2])) AS num, "
            f"sqrt(list_sum(list_transform(q.v[1:{d_expr}], x -> x * x))) AS qn, "
            f"sqrt(list_sum(list_transform(a.v[1:{d_expr}], x -> x * x))) AS vn"
        )

    prefix_sel = " UNION ALL ".join(
        f"SELECT {d} AS prefix_dim, q.vec_id AS qid, a.vec_id AS vid, {cos_block(str(d))} "
        f"FROM vfeats a CROSS JOIN qv q WHERE a.vec_id <> q.vec_id "
        f"AND {d} < {_PQ_DIMQ}"
        for d in MATRYOSHKA_PREFIXES
    )
    return f"""
WITH vfeats AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE {_PQ_WHERE}),
qv AS (SELECT vec_id, v FROM vfeats ORDER BY vec_id LIMIT {MATRYOSHKA_QUERIES}),
cand AS (
  SELECT prefix_dim, qid, vid, round(num / (qn * vn), 6) AS cos
  FROM ({prefix_sel}
        UNION ALL
        SELECT CAST({_PQ_DIMQ} AS INT) AS prefix_dim, q.vec_id, a.vec_id,
               {cos_block(f"len(a.v)")}
        FROM vfeats a CROSS JOIN qv q WHERE a.vec_id <> q.vec_id)
  WHERE qn > 0 AND vn > 0),
ranked AS (
  SELECT prefix_dim, qid, vid FROM (
    SELECT prefix_dim, qid, vid,
           row_number() OVER (PARTITION BY prefix_dim, qid
                              ORDER BY cos DESC, vid) AS rn
    FROM cand) WHERE rn <= {MATRYOSHKA_TOPK}),
truth AS (SELECT qid, vid FROM ranked WHERE prefix_dim = {_PQ_DIMQ}),
matched AS (
  SELECT p.prefix_dim, p.qid, count(*) AS m
  FROM ranked p JOIN truth t ON t.qid = p.qid AND t.vid = p.vid
  WHERE p.prefix_dim <> {_PQ_DIMQ}
  GROUP BY p.prefix_dim, p.qid),
spine AS (
  SELECT d AS prefix_dim, q.vec_id AS qid
  FROM qv q CROSS JOIN (VALUES {", ".join(f"({d})" for d in MATRYOSHKA_PREFIXES)}) p(d)
  WHERE d < {_PQ_DIMQ})
SELECT s.prefix_dim, s.qid AS query_id,
       coalesce(m, 0) AS n_matched,
       round(CAST(coalesce(m, 0) AS DOUBLE) / {MATRYOSHKA_TOPK}, 6) AS recall
FROM spine s LEFT JOIN matched USING (prefix_dim, qid)
"""


ORACLES["q143_matryoshka_recall"] = _matryoshka_sql()


def _source_kl_sql() -> str:
    """q144 replay: identical smoothed-LM arithmetic and the same
    closed-form absent-term block (p0·((V−V_s)·ln p0 − (S_all−S_s))),
    NULL source grouped as '', zero-token sources restored from the
    source spine with (0, 0, 0.0). All divisions forced DOUBLE."""
    toks = _TOKS.format(col="lower(text)")
    one = _dbl(1.0)
    return f"""
WITH terms AS (
  SELECT coalesce(source, '') AS src, unnest({toks}) AS term
  FROM documents),
st AS (SELECT src, term, count(*) AS cs FROM terms GROUP BY src, term),
lm AS (SELECT term, sum(cs) AS c FROM st GROUP BY term),
scal AS (SELECT sum(c) AS n_all, count(*) AS v_all, sum(ln(c + 1)) AS a_all FROM lm),
tot AS (SELECT src, sum(cs) AS ns, count(*) AS vs FROM st GROUP BY src),
pt AS (
  SELECT st.src, tot.ns, tot.vs, scal.n_all, scal.v_all, scal.a_all,
         ln(st.cs + 1) - ln(tot.ns + scal.v_all) AS lnp,
         ln(lm.c + 1) - ln(scal.n_all + scal.v_all) AS lnq,
         CAST(st.cs + 1 AS DOUBLE) / (tot.ns + scal.v_all) AS p
  FROM st JOIN lm USING (term) JOIN tot USING (src) CROSS JOIN scal),
ag AS (
  SELECT src, ns, vs, n_all, v_all, a_all,
         sum(p * (lnp - lnq)) AS t1, sum(lnq) AS ss
  FROM pt GROUP BY src, ns, vs, n_all, v_all, a_all),
kl AS (
  SELECT src, ns, vs,
         t1 + ({one} / (ns + v_all)) *
              ((v_all - vs) * (-ln(ns + v_all))
               - ((a_all - v_all * ln(n_all + v_all)) - ss)) AS kl
  FROM ag),
spine AS (SELECT DISTINCT coalesce(source, '') AS src FROM documents)
SELECT spine.src AS source,
       CAST(coalesce(ns, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(vs, 0) AS BIGINT) AS n_terms,
       round(coalesce(kl, {_dbl(0.0)}), 6) AS kl
FROM spine LEFT JOIN kl USING (src)
"""


ORACLES["q144_source_kl"] = _source_kl_sql()


def _distribution_match_sql() -> str:
    """q145 replay: same bucket CASE, K = min over target buckets of
    n/t (absent target buckets injected via the full join → K = 0),
    acceptance = 6dp-rounded least(1, t·K/n), membership = the q39
    salted-md5 / 2^60 rule compared against the SAME rounded rate,
    kept_share over the realized total. Targets ride as DOUBLE
    literals matching the Spark map."""
    bucket = (
        "CASE WHEN n_chars < 150 THEN 'short' "
        "WHEN n_chars < 350 THEN 'medium' ELSE 'long' END"
    )
    targets = ", ".join(
        f"('{b}', {_dbl(t)})"
        for b, t in (("short", 0.25), ("medium", 0.5), ("long", 0.25))
    )
    u = (
        "CAST(('0x' || substr(md5('dmatch:' || CAST(doc_id AS VARCHAR)), 1, 15)) "
        "AS BIGINT) / 1152921504606846976.0"
    )
    return f"""
WITH b AS (SELECT doc_id, {bucket} AS bk FROM documents),
t(bk, ts) AS (VALUES {targets}),
cnt AS (SELECT bk, count(*) AS n FROM b GROUP BY bk),
fullj AS (
  SELECT coalesce(cnt.bk, t.bk) AS bk,
         coalesce(n, 0) AS n,
         coalesce(ts, {_dbl(0.0)}) AS ts
  FROM cnt FULL JOIN t ON t.bk = cnt.bk),
k AS (SELECT coalesce(min(CASE WHEN ts > 0 THEN n / ts END), {_dbl(0.0)}) AS kk
      FROM fullj),
rates AS (
  SELECT bk, n, round(ts, 6) AS target_share,
         round(CASE WHEN n > 0 AND ts > 0
               THEN least({_dbl(1.0)}, ts * kk / n)
               ELSE {_dbl(0.0)} END, 6) AS accept_rate
  FROM fullj CROSS JOIN k),
kept AS (
  SELECT b.bk, count(*) AS nk
  FROM b JOIN rates ON rates.bk = b.bk
  WHERE {u} < rates.accept_rate
  GROUP BY b.bk),
audit AS (
  SELECT rates.bk AS bucket, n AS n_rows, target_share, accept_rate,
         coalesce(nk, 0) AS n_kept
  FROM rates LEFT JOIN kept ON kept.bk = rates.bk
  WHERE n > 0),
tot AS (SELECT sum(n_kept) AS tk FROM audit)
SELECT bucket, CAST(n_rows AS BIGINT) AS n_rows, target_share, accept_rate,
       CAST(n_kept AS BIGINT) AS n_kept,
       round(CASE WHEN tk > 0 THEN CAST(n_kept AS DOUBLE) / tk
             ELSE {_dbl(0.0)} END, 6) AS kept_share
FROM audit CROSS JOIN tot
"""


ORACLES["q145_distribution_match"] = _distribution_match_sql()


# q146: replay the deterministic audio stub kernel
# (operators/multimodal.py:_audio_features_stub) — payload-derived
# features over the synthetic media table's audio rows (id % 3 = 1).
# n = len(payload) = 30 (< the 64-byte stat window, so rms/peak run
# over the whole string); env[0] = first payload byte / 255.
ORACLES["q146_audio_features"] = """
WITH ids AS (SELECT unnest(range(0, 300)) AS id),
aud AS (SELECT id FROM ids WHERE id % 3 = 1),
p AS (SELECT id, 'media-payload-' || lpad(CAST(id AS VARCHAR), 16, '0') AS s FROM aud)
SELECT id AS media_id,
  CAST(16000 AS INT) AS sample_rate,
  CAST(length(s) AS BIGINT) AS n_samples,
  round(length(s) / 16000.0, 6) AS duration_sec,
  round(sqrt(CAST(list_aggregate(list_transform(range(1, length(s) + 1),
        i -> pow(unicode(s[i]) / 255.0, 2)), 'sum') AS DOUBLE) / length(s)), 6) AS rms,
  round(CAST(list_aggregate(list_transform(range(1, length(s) + 1),
        i -> unicode(s[i])), 'max') AS DOUBLE) / 255.0, 6) AS peak,
  round(0.0, 6) AS zcr,
  round(unicode(s[1]) / 255.0, 6) AS env0
FROM p
"""


ORACLES["q131_key_skew_audit"] = """
WITH counts AS (
  SELECT l_suppkey AS k, count(*) AS c
  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
ranked AS (
  SELECT c, k,
         row_number() OVER (ORDER BY c, k) AS i,
         row_number() OVER (ORDER BY c DESC, k) AS i_desc
  FROM counts)
SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS max_key_share,
       round(sum(CASE WHEN i_desc <= 10 THEN c ELSE 0 END)
             / CAST(sum(c) AS DOUBLE), 6) AS top10_share,
       round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / CAST(sum(c) AS DOUBLE), 6)
         AS entropy,
       round(2.0 * sum(i * c) / (count(*) * CAST(sum(c) AS DOUBLE))
             - (count(*) + 1) / CAST(count(*) AS DOUBLE), 6) AS gini
FROM ranked
"""


ORACLES["q121_market_share"] = """
WITH asia_cust AS (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'),
sn AS (
  SELECT s_suppkey, n_name AS supp_nation FROM supplier
  JOIN nation ON s_nationkey = n_nationkey),
rev AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year, sn.supp_nation,
         sum(l_extendedprice * (1 - l_discount)) AS r
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN asia_cust ON o_custkey = c_custkey
  JOIN sn ON l_suppkey = sn.s_suppkey
  GROUP BY 1, 2)
SELECT o_year, supp_nation, round(r, 2) AS revenue,
       round(r / sum(r) OVER (PARTITION BY o_year), 6) AS share
FROM rev
"""


ORACLES["q109_bpe_merges"] = """
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS w
  FROM documents),
pairs AS (
  SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
  FROM words WHERE length(w) >= 2),
counted AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair)
SELECT pair, n, CAST(rank AS INTEGER) AS rank FROM (
  SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rank FROM counted
) WHERE rank <= 20
"""


# Malformed-event ingest reject, mirrored from sources/registry.
# load_table: an event without its identity dimensions (ts, user_id,
# event_type) is not an observation. Spelled once here and injected
# into every event oracle: each `events` reference is rewritten to a
# guard CTE (`__events`) whose body is the only place the base name
# appears — so the 30+ FROM/JOIN sites and their aliases need no
# manual edits, the invariant cannot drift, and NO assumption is made
# about how the harness registered `events` (view, replacement scan,
# any schema). `\bevents\b` cannot match identifiers like n_events
# (underscore is a word character) and no oracle uses 'events' as a
# string literal.
# One shadow CTE per guarded base table; each body is the ONLY place
# the raw name survives (every other reference is rewritten to the
# __name alias), so the 100+ FROM/JOIN sites need no manual edits and
# the invariant cannot drift. The rules mirror sources/registry.
# load_table exactly:
#   events     — an event without its identity dimensions is malformed;
#   documents  — a document without an id cannot be keyed/deduped;
#   embeddings — a NULL id or NULL vector is not a retrievable vector.
_TABLE_GUARDS = {
    # REPLACE nullifies non-finite measurements (the event is still an
    # observation for counts/sessions; its NaN/±Inf value is not —
    # NULL is the one non-observation token both engines treat
    # identically in every aggregate and percentile).
    "events": (
        "__events AS (SELECT * REPLACE ("
        "CASE WHEN isfinite(value) THEN value END AS value) "
        "FROM events WHERE ts IS NOT NULL "
        "AND user_id IS NOT NULL AND event_type IS NOT NULL)"
    ),
    "documents": (
        "__documents AS (SELECT * FROM documents WHERE doc_id IS NOT NULL)"
    ),
    # A vector with any non-finite component is not a vector; empty
    # vectors pass (len(filter)=0).
    "embeddings": (
        "__embeddings AS (SELECT * FROM embeddings "
        "WHERE vec_id IS NOT NULL AND embedding IS NOT NULL "
        "AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0)"
    ),
}
_TABLE_REFS = {
    t: re.compile(rf"\b{t}\b", re.IGNORECASE) for t in _TABLE_GUARDS
}
# Backwards-compat alias used by tests.
_EVENTS_GUARD = _TABLE_GUARDS["events"]
_EVENTS_REF = _TABLE_REFS["events"]

_SQL_HEAD = re.compile(
    r"(\s*(?:--[^\n]*\n\s*)*)(WITH(\s+RECURSIVE)?\b)?", re.IGNORECASE
)


def _guard_tables(sql: str, tables: list[str]) -> str:
    m = _SQL_HEAD.match(sql)
    prefix, rest = m.group(1), sql[m.end() :]
    for t in tables:
        rest = _TABLE_REFS[t].sub(f"__{t}", rest)
    # Guard bodies are appended AFTER the substitution pass, so each
    # body's own raw FROM <table> is never rewritten.
    ctes = ", ".join(_TABLE_GUARDS[t] for t in tables)
    if m.group(2):
        # re-emit RECURSIVE if the original head had it (DuckDB allows
        # the keyword even when the first CTE is not recursive)
        kw = "WITH RECURSIVE" if m.group(3) else "WITH"
        return f"{prefix}{kw} {ctes}, {rest}"
    return f"{prefix}WITH {ctes} {rest}"


def _guard_events(sql: str) -> str:
    # kept for tests/back-compat; the registration path uses _guard_tables
    return _guard_tables(sql, ["events"])


# The guard rewrites EVERY \b<table>\b token, including any that sits
# inside a string literal — no current oracle has one, but a future
# label column like 'events' or 'documents' would be silently
# corrupted into its __alias. Fail loudly at registration instead of
# shipping a value mismatch. ('' is the only escape inside SQL
# single-quoted strings.) NOTE the lexer shape: the naive
# `'(?:[^']|'')*'` backtracks greedily and can MERGE two separate
# literals across an intervening '' into one giant false literal
# (q77's QUALIFY tripped exactly this); `[^']*(?:''[^']*)*` consumes
# escape pairs without ever crossing a lone closing quote. Lexed
# JOINTLY with -- comments (one alternation, leftmost-first): an
# apostrophe inside a comment must not open a phantom literal, and a
# -- inside a literal must not start a phantom comment.
_SQL_TOKEN = re.compile(r"'[^']*(?:''[^']*)*'|--[^\n]*")


def _sql_literals(sql: str):
    return [t for t in _SQL_TOKEN.findall(sql) if t.startswith("'")]


def _assert_no_guarded_literal(name: str, sql: str, tables: list[str]) -> None:
    for lit in _sql_literals(sql):
        for t in tables:
            if _TABLE_REFS[t].search(lit):
                raise AssertionError(
                    f"oracle {name}: string literal {lit!r} matches \\b{t}\\b "
                    "and would be corrupted by the table guard — rename the "
                    "label or extend the guard to skip literals"
                )


def _assert_no_events_literal(name: str, sql: str) -> None:
    # kept for tests/back-compat
    _assert_no_guarded_literal(name, sql, ["events"])


def all_oracles() -> dict[str, str]:
    out = {}
    for k, v in ORACLES.items():
        hit = [t for t in _TABLE_GUARDS if _TABLE_REFS[t].search(v)]
        if hit:
            _assert_no_guarded_literal(k, v, hit)
            out[k] = _guard_tables(v, hit)
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------- r7 block


def _winnow_sql(k: int = 3, w: int = 4, min_shared: int = 2, max_df: int = 100) -> str:
    """q152 replay: robust winnowing (Schleimer et al. 2003) — token
    k-gram md5 digests, window-of-w min with rightmost tie-break via
    the same fixed-width (15 hex hash || zero-padded reversed pos)
    sort key the Spark op builds, distinct per-doc fingerprints,
    df-cut self-join, shared-count + fingerprint-jaccard."""
    toks = _TOKS.format(col="text")
    return f"""
WITH toks AS (SELECT doc_id, {toks} AS t FROM documents),
gl AS (
  SELECT doc_id,
    list_transform(range(1, len(t) - {k - 2}),
                   i -> array_to_string(list_slice(t, i, i + {k - 1}), ' ')) AS g
  FROM toks WHERE len(t) >= {k + w - 1}
),
grams AS (
  SELECT doc_id, generate_subscripts(g, 1) AS pos,
    substr(md5('win:' || unnest(g)), 1, 15) AS h
  FROM gl
),
keyed AS (
  SELECT doc_id, pos,
    h || lpad(CAST(greatest(0, 999999999 - pos) AS VARCHAR), 9, '0') AS key
  FROM grams
),
sel AS (
  SELECT doc_id,
    min(key) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS s,
    lead(pos, {w - 1}) OVER (PARTITION BY doc_id ORDER BY pos) AS valid
  FROM keyed
),
fps AS (SELECT DISTINCT doc_id, substr(s, 1, 15) AS fp FROM sel WHERE valid IS NOT NULL),
per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp FROM fps GROUP BY doc_id),
rare AS (
  SELECT fp FROM fps GROUP BY fp
  HAVING count(*) >= 2 AND count(*) <= {max_df}
),
pruned AS (SELECT f.fp, f.doc_id FROM fps f JOIN rare r ON r.fp = f.fp),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS shared_fp
  FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {min_shared}
)
SELECT s.id_a, s.id_b, s.shared_fp, na.nfp AS n_fp_a, nb.nfp AS n_fp_b,
  round(CAST(s.shared_fp AS DOUBLE) / (na.nfp + nb.nfp - s.shared_fp), 6) AS fp_jaccard
FROM shared s
JOIN per_doc na ON na.doc_id = s.id_a
JOIN per_doc nb ON nb.doc_id = s.id_b
"""


ORACLES["q152_winnow_overlap"] = _winnow_sql()


def _dup_closure_ctes() -> str:
    """The q38 CTE chain (minhash → candidates → Jaccard-verified edges
    → recursive transitive closure → min-label components + sizes),
    shared verbatim by q153/q154 so the cluster semantics have exactly
    one SQL spelling."""
    return (
        _minhash_cte().replace("WITH ", "WITH RECURSIVE ", 1)
        + """,
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM verified
  UNION
  SELECT id_b AS u, id_a AS v FROM verified
),
reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.node = e.v
),
cc AS (SELECT node AS doc_id, min(lab) AS cluster FROM reach GROUP BY node),
sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM cc GROUP BY cluster)"""
    )


# q153: whole-cluster split assignment — rep = min-label component (or
# the doc itself), split = salted-md5 uniform of the REP (same formula
# as sampling.hash_uniform), per-split audit + the measured cross-split
# near-dup pair count (a 1-row cross join, 0 by construction).
ORACLES["q153_cluster_safe_split"] = (
    _dup_closure_ctes()
    + """,
asgn AS (
  SELECT d.doc_id,
    COALESCE(c.cluster, d.doc_id) AS rep,
    c.cluster IS NOT NULL AS clustered,
    CASE
      WHEN CAST(('0x' || substr(md5('csplit:' || CAST(COALESCE(c.cluster, d.doc_id) AS VARCHAR)), 1, 15)) AS BIGINT)
           / 1152921504606846976.0 < 0.8 THEN 'train'
      WHEN CAST(('0x' || substr(md5('csplit:' || CAST(COALESCE(c.cluster, d.doc_id) AS VARCHAR)), 1, 15)) AS BIGINT)
           / 1152921504606846976.0 < 0.9 THEN 'val'
      ELSE 'test' END AS split
  FROM documents d LEFT JOIN cc c ON c.doc_id = d.doc_id
),
xp AS (
  SELECT CAST(COALESCE(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS cross_split_pairs
  FROM verified v
  JOIN asgn sa ON sa.doc_id = v.id_a
  JOIN asgn sb ON sb.doc_id = v.id_b
)
SELECT a.split,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT a.rep) AS BIGINT) AS n_clusters,
  CAST(sum(CASE WHEN a.clustered THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
  x.cross_split_pairs
FROM asgn a, xp x
GROUP BY a.split, x.cross_split_pairs
"""
)


# q154: soft-dedup weights — 1/|cluster| per clustered doc, 1 per
# singleton; per-source raw vs effective counts.
ORACLES["q154_soft_dedup_weights"] = (
    _dup_closure_ctes()
    + """,
w AS (
  SELECT d.source,
    CASE WHEN s.cluster_size IS NOT NULL THEN 1.0 / s.cluster_size ELSE 1.0 END AS w,
    s.cluster_size IS NOT NULL AS clustered
  FROM documents d
  LEFT JOIN (SELECT cc.doc_id, sizes.cluster_size
             FROM cc JOIN sizes ON sizes.cluster = cc.cluster) s
    ON s.doc_id = d.doc_id
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN clustered THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
  round(sum(w), 4) AS effective_docs,
  round(sum(w) / count(*), 6) AS dedup_ratio
FROM w GROUP BY source
"""
)


# q155: standardization what-if — modal-dim population, per-dim
# mean/pop-std, xs = (x-mu)/sd (sd=0 → 0), per-vector norms as
# vector-partitioned window sums, anisotropy = Σ per-dim mean(û)² for
# the raw and the standardized space.
ORACLES["q155_standardization_audit"] = """
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
),
dm AS (
  SELECT len(v) AS d FROM b GROUP BY len(v)
  ORDER BY count(*) DESC, len(v) ASC LIMIT 1
),
vv AS (SELECT vec_id, v FROM b WHERE len(v) = (SELECT d FROM dm)),
e AS (SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM vv),
dims AS (SELECT pos, avg(x) AS mu, sqrt(var_pop(x)) AS sd FROM e GROUP BY pos),
es AS (
  SELECT e.vec_id, e.pos, e.x,
    CASE WHEN dims.sd > 0 THEN (e.x - dims.mu) / dims.sd ELSE 0.0 END AS xs
  FROM e JOIN dims ON dims.pos = e.pos
),
wn AS (
  SELECT vec_id, pos, x, xs,
    sqrt(sum(x * x) OVER (PARTITION BY vec_id)) AS nr,
    sqrt(sum(xs * xs) OVER (PARTITION BY vec_id)) AS ns
  FROM es
),
rd AS (SELECT pos, avg(x / nr) AS mu, count(*) AS c FROM wn WHERE nr > 0 GROUP BY pos),
sd2 AS (SELECT pos, avg(xs / ns) AS mu, count(*) AS c FROM wn WHERE ns > 0 GROUP BY pos),
r1 AS (SELECT CAST(max(c) AS BIGINT) AS n_vecs_raw, round(sum(mu * mu), 6) AS aniso_raw FROM rd),
r2 AS (SELECT CAST(max(c) AS BIGINT) AS n_vecs_std, round(sum(mu * mu), 6) AS aniso_std FROM sd2)
SELECT CAST((SELECT d FROM dm) AS INT) AS dim,
  r1.n_vecs_raw, r1.aniso_raw, r2.n_vecs_std, r2.aniso_std
FROM r1, r2
-- degenerate corpus (no non-null vectors): EMPTY result, matching the
-- Spark op's empty-with-schema return (not a row of NULLs)
WHERE (SELECT count(*) FROM dm) > 0
"""


# q156: hard negatives — anchors = every 100th id, candidates restricted
# to a DIFFERENT label, rank over the 6dp-rounded cosine then id (the
# q143 rounding convention the Spark op mirrors).
ORACLES["q156_hard_negatives"] = """
WITH b AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
),
nz AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM b),
q AS (
  SELECT vec_id AS query_id, label AS query_label, v AS qv, nrm AS qn
  FROM nz WHERE vec_id % 100 = 0
),
sc AS (
  SELECT q.query_id, q.query_label, a.vec_id,
    round(list_dot_product(a.v, q.qv) / (a.nrm * q.qn), 6) AS cos
  FROM nz a JOIN q ON a.label <> q.query_label
  WHERE a.nrm > 0 AND q.qn > 0
),
r AS (
  SELECT query_id, query_label, vec_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM sc
)
SELECT query_id, query_label, vec_id, cos AS neg_cos, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 3
"""


def _adaptive_cutoff_sql(drop_frac: float = 0.1, decimals: int = 3) -> str:
    """q157 replay: the quality score (q20's expression), quantized to
    ``decimals`` places, collapsed to a (lang × score) count histogram;
    cutoff = smallest quantized score whose cumulative count exceeds
    floor(drop_frac·n) (type-1 quantile, exact-integer logic); kept
    counts read off the same histogram. BIGINT casts on the window sums
    (DuckDB HUGEINT → pandas float otherwise — the q40 lesson)."""
    toks = _TOKS.format(col="text")
    stop_hits = f"len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, lower(x))))"
    return f"""
WITH toks AS (SELECT lang, text, {toks} AS t FROM documents),
feat AS (
  SELECT lang, len(t) AS n_tokens, length(text) AS n_chars,
    length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct,
    {stop_hits} AS stop_hits
  FROM toks
),
q AS (
  SELECT lang,
    round(0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE) / n_chars ELSE 0.0 END)
        + 0.3 * least(CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens ELSE 0.0 END * 5, 1.0),
      6) AS score
  FROM feat
),
h AS (SELECT lang, round(score, {decimals}) AS qs, count(*) AS cnt FROM q GROUP BY 1, 2),
c AS (
  SELECT lang, qs,
    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY qs
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
  FROM h
),
k AS (SELECT lang, qs, cum, n, CAST(floor({drop_frac} * n) AS BIGINT) AS kdrop FROM c)
SELECT lang,
  min(CASE WHEN cum > kdrop THEN qs END) AS cutoff,
  max(n) AS n_docs,
  max(n) - COALESCE(max(CASE WHEN cum <= kdrop THEN cum END), 0) AS n_kept,
  round(CAST(max(n) - COALESCE(max(CASE WHEN cum <= kdrop THEN cum END), 0) AS DOUBLE)
        / max(n), 6) AS kept_frac
FROM k GROUP BY lang
"""


ORACLES["q157_adaptive_quality_cutoff"] = _adaptive_cutoff_sql()


def _chunk_sql(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """q158 replay: chunk starts at every stride multiple below the
    token count; per-chunk content fingerprint = 15-hex md5 of the
    space-joined token slice (identical to the Spark op's key)."""
    stride = chunk_tokens - overlap
    toks = _TOKS.format(col="text")
    return f"""
WITH toks AS (SELECT doc_id, {toks} AS t FROM documents),
nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
i AS (
  SELECT doc_id, t, n,
    unnest(range(0, CAST(floor((n - 1) / {stride}) AS BIGINT) + 1)) AS i
  FROM nz
)
SELECT doc_id,
  CAST(i AS INT) AS chunk_id,
  CAST(i * {stride} AS INT) AS start_tok,
  CAST(least({chunk_tokens}, n - i * {stride}) AS INT) AS n_chunk_tokens,
  substr(md5(array_to_string(
    list_slice(t, i * {stride} + 1, i * {stride} + {chunk_tokens}), ' ')), 1, 15)
    AS chunk_fp
FROM i
"""


ORACLES["q158_chunk_documents"] = _chunk_sql()


# q159: TPC-H-Q7-shaped bilateral trade volume between NATION_1 and
# NATION_2 (both directions) by ship year, 1996-1997.
ORACLES["q159_nation_trade_volume"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l.l_shipdate) AS INT) AS ship_year,
  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


# q160: TPC-H-Q4-shaped priority check (no l_commitdate in this
# schema: late = shipped > 60 days after order date), EXISTS semi-join.
ORACLES["q160_order_priority_check"] = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-04-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def _mutual_knn_sql(k: int = 4) -> str:
    """q161 replay: the q103 batch-ANN SQL with EVERY vector as a query
    (query_mod=1), self-joined on the reversed (query, neighbor) pair."""
    inner = _batch_ann_sql(planes="auto", dim=64, k=k, query_mod=1)
    return f"""
WITH knn AS (SELECT * FROM ({inner}) t)
SELECT a.query_id AS id_a, a.vec_id AS id_b, a.cos_sim,
  CAST(a.rank AS INT) AS rank_ab, CAST(b.rank AS INT) AS rank_ba
FROM knn a JOIN knn b ON b.query_id = a.vec_id AND b.vec_id = a.query_id
WHERE a.query_id < a.vec_id
"""


ORACLES["q161_mutual_knn"] = _mutual_knn_sql()


# q162: exact-size per-group sample — rank over the salted-md5 hash
# order (same 60-bit formula as sampling.hash_uniform's numerator),
# exactly min(30, n) rows per language.
ORACLES["q162_exact_group_sample"] = """
WITH h AS (
  SELECT lang, doc_id,
    CAST(('0x' || substr(md5('exact:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM documents
),
r AS (
  SELECT lang, doc_id,
    row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS sample_rank
  FROM h
)
SELECT lang, doc_id, CAST(sample_rank AS INT) AS sample_rank
FROM r WHERE sample_rank <= 30
"""


def _minhash_calibration_sql(num_hashes: int = 12) -> str:
    """q163 replay: q38's candidate + exact-Jaccard CTEs, signature
    slot-agreement count per pair (exact integers), decile bins with a
    single integer-total / (K·n) division per bin."""
    matches = " + ".join(
        f"(CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END)" for i in range(num_hashes)
    )
    return (
        _minhash_cte(num_hashes=num_hashes)
        + f""",
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
jac AS (
  SELECT c.id_a, c.id_b,
    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
),
m AS (
  SELECT j.jaccard, {matches} AS matches
  FROM jac j
  JOIN sig a ON a.doc_id = j.id_a
  JOIN sig b ON b.doc_id = j.id_b
)
SELECT least(floor(jaccard * 10), 9) / 10.0 AS jacc_bin,
  CAST(count(*) AS BIGINT) AS n_pairs,
  round(CAST(sum(matches) AS DOUBLE) / ({num_hashes} * count(*)), 6) AS avg_est,
  round(avg(jaccard), 6) AS avg_exact
FROM m GROUP BY 1
"""
    )


ORACLES["q163_minhash_calibration"] = _minhash_calibration_sql()


def _stream_rollup_sql() -> str:
    """q164 replay: the synthetic_events stream's final state in
    closed form. Source rows are a pure function of event_id
    (sources/pyds._event_row — md5-derived fields), so the
    micro-batch run's complete-mode aggregate equals this
    generate_series expression regardless of batch boundaries:
      user_id = int(md5('ev:'||id)[bytes 0:2]) % 500   (hex 1..4)
      etype   = TYPES[md5[byte 2] % 5]                 (hex 5..6)
      value   = (int(md5[bytes 3:5]) % 50000) / 100    (hex 7..10)
    (Python's round(x, 2) on an exact 2-decimal grid point is an
    identity on the double, so no round is replayed per row; sums go
    through DECIMAL(18,6) — the q26 exact-addition convention.)"""
    from .streaming.gate import STREAM_GATE_MAX_ROWS

    return f"""
WITH ids AS (SELECT unnest(range(0, {STREAM_GATE_MAX_ROWS})) AS event_id),
h AS (SELECT event_id, md5('ev:' || CAST(event_id AS VARCHAR)) AS hx FROM ids),
e AS (
  SELECT event_id,
    CAST(('0x' || substr(hx, 1, 4)) AS BIGINT) % 500 AS user_id,
    ['view','click','purchase','signup','error'][
      (CAST(('0x' || substr(hx, 5, 2)) AS BIGINT) % 5) + 1] AS event_type,
    CAST(CAST(('0x' || substr(hx, 7, 4)) AS BIGINT) % 50000 AS DOUBLE) / 100.0
      AS value
  FROM h
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value,
  round(max(value), 2) AS max_value,
  CAST(min(event_id) AS BIGINT) AS min_event_id,
  CAST(max(event_id) AS BIGINT) AS max_event_id
FROM e GROUP BY event_type
"""


ORACLES["q164_stream_rollup"] = _stream_rollup_sql()


def _banded_mutual_knn_sql(k: int = 4, bands: int = 2, dim: int = 64) -> str:
    """q165 replay: per band b, the auto-masked literal-plane bucket
    (plane_matrix seed=b — independent hyperplane sets), candidates =
    UNION of in-bucket id pairs over bands (bucketing over ALL guarded
    vectors, matching lsh_bucket_auto), scored once on the nrm>0
    survivors, per-query top-k, reciprocal self-join — exactly
    operators.similarity.banded_mutual_knn."""
    from .operators.similarity import AUTO_MAX_PLANES, plane_matrix

    buckets = []
    for b in range(bands):
        m = plane_matrix(AUTO_MAX_PLANES, dim, seed=b)
        rows = ["[" + ", ".join(f"{float(s):.1f}" for s in row) + "]" for row in m]
        raw = " + ".join(
            f"(CASE WHEN list_dot_product(v, {rows[p]}) >= 0 THEN {1 << p} ELSE 0 END)"
            for p in range(AUTO_MAX_PLANES)
        )
        buckets.append(f"(({raw}) & (SELECT bmask FROM __np)) AS bk{b}")
    cand_legs = "\n  UNION\n".join(
        f"  SELECT q.vec_id AS query_id, t.vec_id AS cand_id "
        f"FROM b q JOIN b t ON q.bk{i} = t.bk{i} WHERE q.vec_id <> t.vec_id"
        for i in range(bands)
    )
    return f"""
WITH __np AS (SELECT {_auto_mask_case_sql()} AS bmask
              FROM (SELECT count(*) AS n FROM embeddings)),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE embedding IS NOT NULL),
b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        {', '.join(buckets)}
      FROM e),
c AS (SELECT vec_id, v, nrm FROM b WHERE nrm > 0),
cand AS (
{cand_legs}
),
s AS (
  SELECT cd.query_id, cd.cand_id,
    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
  FROM cand cd
  JOIN c q ON q.vec_id = cd.query_id
  JOIN c t ON t.vec_id = cd.cand_id
),
r AS (
  SELECT query_id, cand_id AS vec_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
  FROM s
),
knn AS (SELECT * FROM r WHERE rank <= {k})
SELECT a.query_id AS id_a, a.vec_id AS id_b, round(a.cos, 6) AS cos_sim,
  CAST(a.rank AS INT) AS rank_ab, CAST(b2.rank AS INT) AS rank_ba
FROM knn a JOIN knn b2 ON b2.query_id = a.vec_id AND b2.vec_id = a.query_id
WHERE a.query_id < a.vec_id
"""


ORACLES["q165_banded_mutual_knn"] = _banded_mutual_knn_sql()


# q166: two-star CC consumes the SAME verified pair graph and emits the
# SAME (doc_id, cluster, size, is_rep) contract as q38's union-find —
# the recursive transitive-closure CTE replays both strategies.
ORACLES["q166_cc_twostar"] = ORACLES["q38_dup_clusters"]


# q167: TPC-H-Q14-shaped promo revenue share by ship month, H1-1996.
ORACLES["q167_promo_revenue"] = """
SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
  round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0.0 END)
        / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-07-01'
GROUP BY 1
"""


# q168: semantic decontamination — max cosine of each non-eval vector
# against the id%199 eval slice, 6dp-rounded before the 0.30 threshold
# (the q143/q156 rounding convention), per-label funnel.
ORACLES["q168_semantic_decontamination"] = """
WITH b AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
nz AS (
  SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM b
  WHERE sqrt(list_dot_product(v, v)) > 0
),
e AS (SELECT v AS ev, nrm AS en FROM nz
      WHERE vec_id % 199 = 0 AND vec_id < 199 * 512),
c AS (SELECT * FROM nz
      WHERE NOT (vec_id % 199 = 0 AND vec_id < 199 * 512)),
s AS (
  SELECT c.vec_id, c.label,
    round(max(list_dot_product(c.v, e.ev) / (c.nrm * e.en)), 6) AS mx
  FROM c, e GROUP BY 1, 2
)
SELECT label,
  CAST(count(*) AS BIGINT) AS n_vecs,
  CAST(sum(CASE WHEN mx >= 0.30 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
  round(sum(CASE WHEN mx >= 0.30 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
    AS contamination_frac,
  round(max(mx), 6) AS max_cos
FROM s GROUP BY label
"""


# q169: TPC-H-Q19-shaped disjunctive-predicate join, one-row aggregate.
ORACLES["q169_disjunctive_join"] = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 40)
   OR (p_type = 'PROMO' AND l_quantity >= 30)
"""


# q170: TPC-H-Q16-shaped supplier diversity. NOT EXISTS (not NOT IN):
# anti-join semantics under NULL keys — a NULL l_suppkey never matches,
# so it SURVIVES the exclusion in both engines (NOT IN would three-
# value the whole predicate away on a NULL s_suppkey).
ORACLES["q170_supplier_diversity"] = """
SELECT p_brand, p_type,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE NOT EXISTS (SELECT 1 FROM supplier s
                  WHERE s.s_acctbal < 0 AND s.s_suppkey = l.l_suppkey)
GROUP BY 1, 2
"""


# q171: TPC-H-Q15-shaped top supplier — global max over the 2dp-rounded
# per-supplier revenue (rounding BEFORE the equality comparison keeps
# the cross-engine double-sum noise out of the tie set).
ORACLES["q171_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# q172: tokenizer fertility by language — q22's two tokenizations,
# per-lang funnel; zero-word docs excluded from the ratios only.
ORACLES["q172_token_fertility"] = (
    "WITH f AS (SELECT lang, len("
    + _TOKS.format(col="text")
    + ") AS n_tokens, len(regexp_extract_all(coalesce(text, ''),"
    + " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_pieces FROM documents)"
    + """
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_words,
  CAST(sum(n_pieces) AS BIGINT) AS total_pieces,
  round(avg(CASE WHEN n_tokens > 0
                 THEN CAST(n_pieces AS DOUBLE) / n_tokens END), 6)
    AS avg_fertility,
  round(CAST(sum(CASE WHEN n_tokens > 0 THEN n_pieces ELSE 0 END) AS DOUBLE)
        / greatest(sum(CASE WHEN n_tokens > 0 THEN n_tokens ELSE 0 END), 1), 6)
    AS corpus_fertility
FROM f GROUP BY lang
"""
)


def _perplexity_buckets_sql(decimals: int = 3) -> str:
    """q173 replay: q107's unigram-NLL CTEs, (lang × integer milli-NLL)
    histogram, integer-third bucket boundaries on the cumulative
    counts (a bin belongs to the bucket of its FIRST document); the
    bucket mean is the op's exact round-half-up INTEGER division —
    float round() on a decimal-grid average hits cross-engine ties."""
    toks = _TOKS.format(col="lower(text)")
    scale = 10**decimals
    return f"""
WITH d AS (SELECT doc_id, lang, {toks} AS t FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(t) AS term FROM d) GROUP BY doc_id, term),
uni AS (SELECT term, sum(tf) AS ct FROM tf GROUP BY term),
tot AS (SELECT CAST(coalesce(sum(ct), 0) AS DOUBLE) AS total FROM uni),
scored AS (
  SELECT tf.doc_id,
         round(sum(-tf.tf * ln(uni.ct / tot.total)) / sum(tf.tf), 6) AS nll
  FROM tf JOIN uni USING (term) CROSS JOIN tot GROUP BY tf.doc_id
),
lab AS (SELECT d.lang, s.nll FROM scored s JOIN d ON d.doc_id = s.doc_id),
hist AS (SELECT lang, CAST(floor(nll * {scale} + 1e-4) AS BIGINT) AS mnll,
                count(*) AS cnt
         FROM lab GROUP BY 1, 2),
c AS (
  SELECT lang, mnll, cnt,
    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY mnll
                        ROWS UNBOUNDED PRECEDING) - cnt AS BIGINT) AS bef,
    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
  FROM hist
),
b AS (
  SELECT lang,
    CASE WHEN bef * 3 >= n * 2 THEN 'tail'
         WHEN bef * 3 >= n THEN 'middle'
         ELSE 'head' END AS bucket,
    mnll, cnt
  FROM c
),
g AS (
  SELECT lang, bucket, CAST(sum(cnt) AS BIGINT) AS n_docs,
    CAST(sum(mnll * cnt) AS BIGINT) AS sum_mnll,
    max(mnll) AS max_mnll
  FROM b GROUP BY 1, 2
)
SELECT lang, bucket, n_docs,
  ((sum_mnll * 2 + n_docs) // (n_docs * 2)) / {float(scale)} AS avg_nll,
  max_mnll / {float(scale)} AS max_nll
FROM g
"""


ORACLES["q173_perplexity_buckets"] = _perplexity_buckets_sql()


# q174: KMV set algebra — q46's hash/estimator, plus the pooled-union
# sketch and inclusion–exclusion. NULL user_ids dropped (no identity;
# and NULL sort position differs across engines).
ORACLES["q174_kmv_set_ops"] = """
WITH m AS (
  SELECT event_type AS s,
    CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
      / 1152921504606846976.0 AS u
  FROM events
  WHERE event_type IN ('click', 'purchase') AND user_id IS NOT NULL
),
tagged AS (
  SELECT DISTINCT s, u FROM m
  UNION ALL
  SELECT DISTINCT '__union' AS s, u FROM m
),
r AS (SELECT s, u, row_number() OVER (PARTITION BY s ORDER BY u) AS rn FROM tagged),
e AS (
  SELECT s, count(*) AS n_seen, max(CASE WHEN rn = 64 THEN u END) AS kth
  FROM r WHERE rn <= 64 GROUP BY s
),
est AS (
  SELECT s, CAST(CASE WHEN n_seen < 64 THEN n_seen
                      ELSE round(63 / kth, 0) END AS BIGINT) AS est
  FROM e
)
SELECT
  coalesce(max(CASE WHEN s = 'click' THEN est END), 0) AS est_a,
  coalesce(max(CASE WHEN s = 'purchase' THEN est END), 0) AS est_b,
  coalesce(max(CASE WHEN s = '__union' THEN est END), 0) AS est_union,
  greatest(0,
    coalesce(max(CASE WHEN s = 'click' THEN est END), 0)
    + coalesce(max(CASE WHEN s = 'purchase' THEN est END), 0)
    - coalesce(max(CASE WHEN s = '__union' THEN est END), 0)) AS est_intersection
FROM est
"""


# q175: TPC-H-Q21-shaped sole-blame — (order, supplier) lateness flag,
# per-order supplier/late counts, keep the sole late supplier of
# multi-supplier orders, roll up per supplier.
ORACLES["q175_waiting_orders"] = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey,
    max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
             THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
per_order AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late
  FROM late GROUP BY 1
)
SELECT t.l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS n_sole_late_orders
FROM late t JOIN per_order a USING (l_orderkey)
WHERE t.is_late = 1 AND a.n_supp >= 2 AND a.n_late = 1
GROUP BY 1
"""


# q176: TPC-H-Q11-shaped important stock — relative (×1.5 mean)
# threshold in exact integer cents: 2·cents·n > 3·Σcents.
ORACLES["q176_important_parts"] = """
WITH pv AS (
  SELECT l_partkey,
    CAST(round(sum(l_extendedprice * l_quantity) * 100, 0) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(sum(cents) AS HUGEINT) AS total_cents,
               CAST(count(*) AS BIGINT) AS n_parts FROM pv)
SELECT pv.l_partkey, pv.cents / 100.0 AS part_value
FROM pv, tot
WHERE CAST(pv.cents AS HUGEINT) * 2 * tot.n_parts > tot.total_cents * 3
"""


# q177: the round-trip audit computed straight off the parquet — any
# row/null/type loss in the JSONL write→read shows up as a diff.
ORACLES["q177_jsonl_roundtrip"] = """
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
  CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS total_chars,
  CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS total_text_len
FROM documents GROUP BY source
"""


def _kcore_sql(k: int = 3, rounds: int = 20, pred: str = "l_quantity <= 2") -> str:
    """q178 replay: exactly ``rounds`` unrolled peels (each level keeps
    nodes of residual degree ≥ k and restricts the edge list) — the
    Spark op converges-and-stops, but peeling is idempotent at the
    fixpoint so running the full unroll is bit-identical; a graph
    whose core needs more rounds makes the Spark side raise loudly
    instead of silently disagreeing."""
    parts = [
        f"""e0 AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT DISTINCT l_partkey AS u, l_suppkey AS v FROM lineitem
    WHERE {pred} AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
  )
  UNION
  SELECT v, u FROM (
    SELECT DISTINCT l_partkey AS u, l_suppkey AS v FROM lineitem
    WHERE {pred} AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
  )
)"""
    ]
    for i in range(rounds):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT u FROM e{i} GROUP BY u HAVING count(*) >= {k})"
        )
        parts.append(
            f"e{i+1} AS MATERIALIZED (SELECT s.u, s.v FROM e{i} s"
            f" JOIN k{i} a ON a.u = s.u JOIN k{i} b ON b.u = s.v)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
FROM e{rounds} GROUP BY u
"""
    )


ORACLES["q178_kcore"] = _kcore_sql()


# q179: IDF-weighted Jaccard over the q17 LSH candidates — ln(N/df)
# shingle weights; intersection/union weights via candidate-bounded
# joins on the exploded shingle stream.
ORACLES["q179_weighted_jaccard"] = (
    _minhash_cte()
    + """,
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
ex AS (SELECT doc_id, unnest(s) AS shg FROM sh),
dfs AS (SELECT shg, count(*) AS dfc FROM ex GROUP BY 1),
wtd AS (SELECT ex.doc_id, ex.shg, ln(nd.n / dfs.dfc) AS w
        FROM ex JOIN dfs USING (shg) CROSS JOIN nd),
tot AS (SELECT doc_id, sum(w) AS wt FROM wtd GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, sum(wa.w) AS wi
  FROM cand c
  JOIN wtd wa ON wa.doc_id = c.id_a
  JOIN wtd wb ON wb.doc_id = c.id_b AND wb.shg = wa.shg
  GROUP BY 1, 2
),
sc AS (
  SELECT c.id_a, c.id_b,
    round(CASE WHEN ta.wt + tb.wt - coalesce(i.wi, 0) > 0
               THEN coalesce(i.wi, 0) / (ta.wt + tb.wt - coalesce(i.wi, 0))
               ELSE 0.0 END, 6) AS weighted_jaccard
  FROM cand c
  JOIN tot ta ON ta.doc_id = c.id_a
  JOIN tot tb ON tb.doc_id = c.id_b
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
)
SELECT id_a, id_b, weighted_jaccard FROM sc WHERE weighted_jaccard >= 0.3
"""
)


# q180: 5-term EWMA (α=0.5) per user, µs ordering with event_id
# tie-break (the q74 convention), null-aware weight renormalization.
def _ewma_sql(alpha: float = 0.5, terms: int = 5) -> str:
    q = 1 - alpha  # NOTE: weights are (1-α)^i with α=0.5 → q=0.5
    lags = ",\n  ".join(
        f"lag(value, {i}) OVER w AS v{i}" for i in range(1, terms)
    )
    num = " + ".join(
        f"CASE WHEN v{i} IS NOT NULL THEN v{i} * {q**i!r} ELSE 0.0 END"
        if i
        else f"CASE WHEN value IS NOT NULL THEN value * 1.0 ELSE 0.0 END"
        for i in range(terms)
    )
    den = " + ".join(
        f"CASE WHEN v{i} IS NOT NULL THEN {q**i!r} ELSE 0.0 END"
        if i
        else "CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END"
        for i in range(terms)
    )
    return f"""
WITH e AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value
  FROM events
),
l AS (
  SELECT user_id, event_id, value, {lags}
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
s AS (SELECT user_id, event_id, value, {num} AS num, {den} AS den FROM l)
SELECT user_id, event_id, round(value, 4) AS value,
  CASE WHEN den > 0 THEN round(num / den, 4) END AS ewma5
FROM s
"""


ORACLES["q180_ewma"] = _ewma_sql()


# q181: deterministic negative-edge sample — per part, the hash-picked
# supplier index (salted 60-bit md5, the sampling-family primitive),
# minus real edges.
ORACLES["q181_negative_edges"] = """
WITH supp AS (
  SELECT s_suppkey, row_number() OVER (ORDER BY s_suppkey) - 1 AS idx
  FROM supplier
),
ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM supplier),
parts AS (SELECT DISTINCT l_partkey AS src FROM lineitem),
picked AS (
  SELECT p.src, s.s_suppkey AS dst
  FROM parts p CROSS JOIN ns
  JOIN supp s ON s.idx = CAST(floor(
    (CAST(('0x' || substr(md5('negedge:' || CAST(p.src AS VARCHAR)), 1, 15)) AS BIGINT)
     / 1152921504606846976.0) * ns.n) AS INT)
),
realx AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem)
SELECT p.src, p.dst FROM picked p
WHERE NOT EXISTS (SELECT 1 FROM realx r WHERE r.src = p.src AND r.dst = p.dst)
"""


# q182: the q38 verified pairs rolled up by unordered source pair.
ORACLES["q182_dup_cross_source"] = (
    _minhash_cte()
    + """,
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
),
lab AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM verified v
  JOIN documents da ON da.doc_id = v.id_a
  JOIN documents db ON db.doc_id = v.id_b
)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_dup_pairs
FROM lab GROUP BY 1, 2
"""
)


# q183: quality-bucket matched controls — 2dp floor bucket (with the
# engine-standard 1e-7 nudge), min-id control per bucket, equi-join.
ORACLES["q183_matched_controls"] = (
    _quality_features_cte()
    + """,
b AS (SELECT doc_id, source,
        CAST(floor(quality_score * 100 + 1e-7) AS BIGINT) AS qb FROM q),
treated AS (SELECT doc_id AS treated_id, qb FROM b WHERE source = 'src0'),
controls AS (SELECT qb, min(doc_id) AS control_id FROM b
             WHERE source = 'src1' GROUP BY qb)
SELECT t.treated_id, c.control_id, t.qb / 100.0 AS quality_bucket
FROM treated t JOIN controls c USING (qb)
"""
)


# q184: one-pass Poisson bootstrap (B=32 replicas, deterministic
# hash-derived Poisson(1) weights), nearest-rank 95% CI of the
# per-type mean value.
ORACLES["q184_bootstrap_ci"] = """
WITH reps AS (SELECT unnest(range(0, 32)) AS rep),
ev AS (SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL),
h AS (
  SELECT e0.event_type, e0.value, r0.rep,
    CAST(('0x' || substr(md5('boot:' || CAST(e0.event_id AS VARCHAR)
                              || ':' || CAST(r0.rep AS VARCHAR)), 1, 15)) AS BIGINT)
      / 1152921504606846976.0 AS u
  FROM ev e0 CROSS JOIN reps r0
),
wtd AS (
  SELECT event_type, rep, value,
    CASE
      WHEN u < 0.36787944117144233 THEN 0
      WHEN u < 0.7357588823428847 THEN 1
      WHEN u < 0.9196986029286058 THEN 2
      WHEN u < 0.9810118431238462 THEN 3
      WHEN u < 0.9963401531726563 THEN 4
      ELSE 5 END AS w
  FROM h
),
means AS (
  SELECT event_type, rep, sum(value * w) / sum(w) AS m
  FROM wtd GROUP BY 1, 2
  HAVING sum(w) > 0  -- all-zero replica: no resampled rows, no mean
),
ranked AS (
  SELECT event_type, m,
    row_number() OVER (PARTITION BY event_type ORDER BY m) AS rn,
    count(*) OVER (PARTITION BY event_type) AS nb
  FROM means
)
SELECT event_type,
  round(avg(m), 4) AS boot_mean,
  round(min(CASE WHEN rn = CAST(ceil(nb * 0.025) AS INT) THEN m END), 4) AS ci_lo,
  round(min(CASE WHEN rn = CAST(ceil(nb * 0.975) AS INT) THEN m END), 4) AS ci_hi
FROM ranked GROUP BY event_type
"""


# q185: OHLC bars — open/close via struct-min/max keyed on
# (ts_us, event_id) with value riding as the last field.
ORACLES["q185_ohlc_bars"] = """
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS bar_hour,
    CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id, value
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, bar_hour,
  round(min(struct_pack(t := ts_us, i := event_id, v := value)).v, 4) AS open,
  round(max(value), 4) AS high,
  round(min(value), 4) AS low,
  round(max(struct_pack(t := ts_us, i := event_id, v := value)).v, 4) AS close,
  CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY 1, 2
"""


# q186: declared lang × q21 heuristic prediction cross-tab.
def _lang_confusion_sql() -> str:
    toks = _TOKS.format(col="text")
    stop_hits = f"len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, lower(x))))"
    return f"""
WITH d AS (SELECT lang, text, {toks} AS t FROM documents),
f AS (
  SELECT lang,
    CAST({stop_hits} AS DOUBLE) / greatest(len(t), 1) AS en_rate,
    CASE WHEN length(text) > 0
         THEN CAST(length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS DOUBLE)
              / length(text)
         ELSE 0.0 END AS non_ascii_rate
  FROM d
),
p AS (
  SELECT lang,
    CASE WHEN non_ascii_rate > 0.3 THEN 'non_latin'
         WHEN en_rate >= 0.05 THEN 'en_like'
         ELSE 'other' END AS pred_lang
  FROM f
)
SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM p GROUP BY 1, 2
"""


ORACLES["q186_lang_confusion"] = _lang_confusion_sql()


# q187: per-lang counts + deterministic Laplace(b=1) noise from the
# salted 60-bit md5 uniform (inverse CDF, |u-.5| clamped below .5).
ORACLES["q187_dp_counts"] = """
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS true_count
           FROM documents GROUP BY lang),
n AS (
  SELECT lang, true_count,
    CAST(('0x' || substr(md5('dp:' || lang), 1, 15)) AS BIGINT)
      / 1152921504606846976.0 AS u
  FROM c
)
SELECT lang, true_count,
  round(true_count + (-sign(u - 0.5)
        * ln(1 - 2 * least(abs(u - 0.5), 0.5 - 1e-12))), 4) AS noisy_count
FROM n
"""


# q188: positional phrase search — postings self-join on (doc, pos+1).
def _phrase_sql(w1: str = "table", w2: str = "part") -> str:
    toks = _TOKS.format(col="lower(text)")
    return f"""
WITH d AS (SELECT doc_id, {toks} AS t FROM documents),
p AS (
  SELECT doc_id, unnest(t) AS tok,
         unnest(range(1, len(t) + 1)) - 1 AS pos
  FROM d
),
a AS (SELECT doc_id, pos FROM p WHERE tok = '{w1}'),
b AS (SELECT doc_id, pos - 1 AS pos FROM p WHERE tok = '{w2}')
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
  CAST(min(a.pos) AS INT) AS first_pos
FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos
GROUP BY a.doc_id
"""


ORACLES["q188_phrase_search"] = _phrase_sql()


# q189: the partitioned round-trip's audit straight off the raw table
# — a lossy write/read (dropped partition rows, re-typed value)
# diverges immediately.
ORACLES["q189_partition_prune"] = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
  CAST(count(*) AS BIGINT) AS n_purchases,
  round(sum(value), 4) AS total_value
FROM events WHERE event_type = 'purchase'
GROUP BY 1
"""


# q190: first-view → first-subsequent-purchase latency per user,
# global exact percentiles over the converter table (µs ordering).
ORACLES["q190_conversion_latency"] = """
WITH e AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events
),
fv AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view
  FROM e GROUP BY user_id
),
lat AS (
  SELECT p.user_id,
    (min(p.ts_us) - min(fv.first_view)) / 1000000.0 AS lat_s
  FROM e p JOIN fv ON fv.user_id = p.user_id
  WHERE p.event_type = 'purchase' AND p.ts_us > fv.first_view
  GROUP BY p.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_converters,
  round(quantile_cont(lat_s, 0.5), 4) AS p50_latency_s,
  round(quantile_cont(lat_s, 0.9), 4) AS p90_latency_s
FROM lat
"""


# ---------------------------------------------------------------- r9 block


def _logreg_sql() -> str:
    """q191 replay: the identical full-batch gradient-descent weight
    trajectory, UNROLLED one (sigmoid, gradient, weight) CTE triple per
    iteration. Exactness contract (ml.logreg_quality_classifier): per-
    row gradient terms round(x·(σ−y), G_ROUND) — DuckDB round(double,d)
    ≡ Spark portable_round_signed — summed as DECIMAL(28,8) (exact,
    order-independent), weights round(w − lr·(CAST(g AS DOUBLE)/n),
    W_ROUND) ≡ portable_round_scalar, features on the same 6dp
    floor-grid, label from the ROUNDED features. The eval AUC replays
    q114's distinct-score window on the floor-grid-quantized margin
    (floor form, matching roc_auc's portable_round quantizer — NOT
    DuckDB round, whose half-direction differs below zero). All
    constants single-sourced from operators.ml."""
    from .operators.ml import (
        LOGREG_AUC_ROUND,
        LOGREG_FEATURES,
        LOGREG_G_ROUND,
        LOGREG_ITERS,
        LOGREG_LR,
        LOGREG_W_ROUND,
    )

    d = len(LOGREG_FEATURES)
    js = list(range(d))
    toks = _TOKS.format(col="text")
    stop_hits = f"len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, lower(x))))"
    g6 = "floor(({e})*1e6+0.5)/1e6"  # non-negative feature grid
    zexpr = lambda w: " + ".join(f"{w}.w{j}*f.x{j}" for j in js)  # noqa: E731
    iters = []
    for k in range(1, LOGREG_ITERS + 1):
        p = f"w{k - 1}"
        gsel = ", ".join(
            f"sum(CAST(round(x{j}*(sg - y), {LOGREG_G_ROUND}) AS DECIMAL(28,8))) AS g{j}"
            for j in js
        )
        wsel = ", ".join(
            f"CASE WHEN nn.n = 0 THEN w.w{j} ELSE "
            f"round(w.w{j} - {LOGREG_LR!r} * (CAST(coalesce(g.g{j}, 0) AS DOUBLE) / nn.n), "
            f"{LOGREG_W_ROUND}) END AS w{j}"
            for j in js
        )
        iters.append(
            f"""s{k} AS MATERIALIZED (
  SELECT f.*, 1.0/(1.0 + exp(-({zexpr('w')}))) AS sg
  FROM feat f CROSS JOIN {p} w),
g{k} AS MATERIALIZED (SELECT {gsel} FROM s{k}),
w{k} AS MATERIALIZED (SELECT {wsel} FROM {p} w CROSS JOIN g{k} g CROSS JOIN nn)"""
        )
    last = f"w{LOGREG_ITERS}"
    w0sel = ", ".join(f"{_dbl(0.0)} AS w{j}" for j in js)
    wrows = "\nUNION ALL ".join(
        f"SELECT 'w{j}_{LOGREG_FEATURES[j]}' AS component, w{j} AS value FROM {last}"
        for j in js
    )
    return f"""
WITH toks AS (
  SELECT doc_id, text, {toks} AS t FROM documents
), raw AS (
  SELECT len(t) AS nt, coalesce(length(text), 0) AS nc,
    coalesce(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')), 0) AS punct,
    coalesce(length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')), 0) AS na,
    {stop_hits} AS sh
  FROM toks
), x AS (
  SELECT {_dbl(1.0)} AS x0,
    {g6.format(e="least(CAST(nt AS DOUBLE)/100.0, 1.0)")} AS x1,
    {g6.format(e="least((CASE WHEN nt > 0 THEN CAST(sh AS DOUBLE)/nt ELSE 0.0 END)*5, 1.0)")} AS x2,
    {g6.format(e="CASE WHEN nc > 0 THEN CAST(punct AS DOUBLE)/nc ELSE 0.0 END")} AS x3,
    {g6.format(e="CASE WHEN nc > 0 THEN CAST(na AS DOUBLE)/nc ELSE 0.0 END")} AS x4
  FROM raw
), feat AS MATERIALIZED (
  SELECT CASE WHEN x1 + x2 >= 0.8 THEN {_dbl(1.0)} ELSE {_dbl(0.0)} END AS y,
         x0, x1, x2, x3, x4
  FROM x
), nn AS MATERIALIZED (SELECT count(*) AS n, coalesce(sum(y), 0.0) AS np FROM feat),
w0 AS MATERIALIZED (SELECT {w0sel}),
{",".join(iters)},
m AS MATERIALIZED (SELECT f.y, ({zexpr('w')}) AS z FROM feat f CROSS JOIN {last} w),
acc AS (
  SELECT CASE WHEN nn.n = 0 THEN {_dbl(0.0)} ELSE
    floor((CAST(sum(CASE WHEN (z >= 0) = (y = 1.0) THEN 1 ELSE 0 END) AS DOUBLE)
           / nn.n)*1e6 + 0.5)/1e6 END AS a
  FROM m CROSS JOIN nn GROUP BY nn.n),
qs AS (SELECT floor(z*1e{LOGREG_AUC_ROUND} + 0.5)/1e{LOGREG_AUC_ROUND} AS score, y FROM m),
per AS (
  SELECT score,
    sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS p_s,
    sum(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS n_s
  FROM qs GROUP BY score),
ranked AS (
  SELECT *, coalesce(sum(n_s) OVER (
    ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg
  FROM per),
auc AS (
  SELECT round(CASE WHEN sum(p_s) > 0 AND sum(n_s) > 0
    THEN sum(p_s * (cum_neg + n_s / {_dbl(2.0)}))
         / (CAST(sum(p_s) AS DOUBLE) * sum(n_s))
    ELSE {_dbl(0.0)} END, 6) AS a
  FROM ranked)
{wrows}
UNION ALL SELECT 'train_accuracy', a FROM acc
UNION ALL SELECT 'train_auc', a FROM auc
UNION ALL SELECT 'n_pos', CAST(np AS DOUBLE) FROM nn
UNION ALL SELECT 'n_docs', CAST(n AS DOUBLE) FROM nn
"""


ORACLES["q191_quality_classifier"] = _logreg_sql()


def _url_host_dedup_sql(cap: int = 5) -> str:
    """q192 replay: the same synthetic messy URL per doc_id, the same
    RE2-safe canonicalization pipeline (fragment strip, authority
    lowercase + userinfo strip, default-port drop, www strip,
    '&'-prefixed tracking-param removal, trailing-slash strip), exact
    dedup on the canonical key (min doc_id), and cap_per_group's
    salted-hash election replayed through the shared md5-uniform
    (functions.hash_uniform ≡ the __u expression here)."""
    from .operators.curation import URL_TRACKING_PARAMS_RE

    return f"""
WITH urls AS (
  SELECT doc_id,
    concat(
      CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END,
      CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
      'Host', CAST(doc_id % 23 AS VARCHAR), '.Example.COM',
      CASE WHEN doc_id % 2 = 0 THEN ':443'
           WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END,
      '/articles/', CAST(doc_id % 7 AS VARCHAR),
      CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
      CASE WHEN doc_id % 4 = 0
           THEN concat('?utm_source=feed&id=', CAST(doc_id % 13 AS VARCHAR), '&utm_campaign=x')
           WHEN doc_id % 4 = 1
           THEN concat('?id=', CAST(doc_id % 13 AS VARCHAR)) ELSE '' END,
      CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END
    ) AS url
  FROM documents
), parts AS (
  SELECT doc_id, regexp_replace(url, '#.*$', '') AS no_frag FROM urls
), auth AS (
  SELECT doc_id, no_frag,
    lower(regexp_extract(no_frag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_replace(lower(regexp_extract(no_frag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^[^@]*@', '') AS authority,
    regexp_replace(no_frag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS rest
  FROM parts
), hp AS (
  SELECT doc_id, scheme, rest,
    CASE WHEN scheme = 'http' AND authority LIKE '%:80'
           THEN regexp_replace(authority, ':80$', '')
         WHEN scheme = 'https' AND authority LIKE '%:443'
           THEN regexp_replace(authority, ':443$', '')
         ELSE authority END AS hostport
  FROM auth
), canon AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(hostport, ':\\d+$', ''), '^www\\.', '') AS host,
    concat(
      scheme, '://', regexp_replace(hostport, '^www\\.', ''),
      regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', ''),
      CASE WHEN q2 <> '' THEN concat('?', q2) ELSE '' END
    ) AS canonical_url
  FROM (
    SELECT *, regexp_replace(
      regexp_replace(concat('&', regexp_extract(rest, '\\?(.*)$', 1)),
                     '&{URL_TRACKING_PARAMS_RE}=[^&]*', '', 'g'),
      '^&', '') AS q2
    FROM hp
  )
  WHERE scheme <> '' AND regexp_replace(regexp_replace(hostport, ':\\d+$', ''), '^www\\.', '') <> ''
), deduped AS (
  SELECT canonical_url, min(doc_id) AS doc_id, min(host) AS host
  FROM canon GROUP BY canonical_url
), u AS (
  SELECT *, CAST(CAST('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS __u
  FROM deduped
), kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY host ORDER BY __u ASC, doc_id ASC) AS rn
    FROM u) WHERE rn <= {cap}
), raw_ph AS (SELECT host, count(*) AS n_raw FROM canon GROUP BY host),
uniq_ph AS (
  SELECT host, count(*) AS n_canonical, min(canonical_url) AS sample_canonical
  FROM deduped GROUP BY host),
kept_ph AS (SELECT host, count(*) AS n_kept FROM kept GROUP BY host)
SELECT r.host, CAST(r.n_raw AS BIGINT) AS n_raw,
  CAST(u2.n_canonical AS BIGINT) AS n_canonical,
  CAST(k.n_kept AS BIGINT) AS n_kept, u2.sample_canonical
FROM raw_ph r JOIN uniq_ph u2 ON r.host = u2.host JOIN kept_ph k ON r.host = k.host
"""


ORACLES["q192_url_host_dedup"] = _url_host_dedup_sql()


# TPC-H completion block (q193–q200): the eight remaining classic
# shapes, adapted where the testdata schema lacks columns (no
# partsupp / shipmode / commitdate / phone — each adaptation documented
# on the query). Money rounds 2dp, counts cast BIGINT (q01 convention).

ORACLES["q193_forecast_revenue"] = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
  CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""

ORACLES["q194_profit_by_nation_year"] = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
  round(sum(l_extendedprice * (1 - l_discount)
            - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""

ORACLES["q195_late_priority_audit"] = """
SELECT l_returnflag AS returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
ORDER BY returnflag
"""

ORACLES["q196_customer_order_distribution"] = """
WITH per AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '5-LOW') o
    ON c_custkey = o.o_custkey
  GROUP BY c_custkey)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

ORACLES["q197_small_qty_revenue"] = """
WITH avg_qty AS (
  SELECT l_partkey AS pk, sum(l_quantity) / count(*) AS aq
  FROM lineitem GROUP BY l_partkey)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
  CAST(count(*) AS BIGINT) AS n_small_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_qty ON l_partkey = pk
WHERE p_brand = 'Brand#17' AND l_quantity < 0.2 * aq
"""

ORACLES["q198_min_cost_supplier"] = """
WITH sup_in_region AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'),
price_list AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
    sum(l_extendedprice) / count(*) AS avg_price
  FROM lineitem
  JOIN (SELECT p_partkey FROM part WHERE p_size = 15) p ON l_partkey = p_partkey
  JOIN sup_in_region ON l_suppkey = s_suppkey
  GROUP BY p_partkey, s_suppkey, s_name, s_acctbal, n_name),
min_price AS (
  SELECT p_partkey AS pk, min(avg_price) AS mp
  FROM price_list GROUP BY p_partkey)
SELECT p_partkey, s_suppkey, s_name,
  round(s_acctbal, 2) AS s_acctbal, n_name AS nation,
  round(avg_price, 2) AS min_avg_price
FROM price_list
JOIN min_price ON p_partkey = pk AND avg_price = mp
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
"""

ORACLES["q199_supplier_part_promotion"] = """
WITH flow AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem
  JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%') p
    ON l_partkey = p_partkey),
per_ps AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
  FROM flow GROUP BY l_partkey, l_suppkey),
per_p AS (
  SELECT l_partkey AS pk, sum(l_quantity) AS tq FROM flow GROUP BY l_partkey),
dominant AS (
  SELECT DISTINCT l_suppkey AS sk
  FROM per_ps JOIN per_p ON l_partkey = pk
  WHERE sq * 5 > tq)
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT sk FROM dominant)
ORDER BY s_name
"""

ORACLES["q200_sales_opportunity"] = """
WITH avg_bal AS (
  SELECT sum(c_acctbal) / count(*) AS ab FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment AS segment,
  CAST(count(*) AS BIGINT) AS numcust,
  round(sum(c_acctbal), 2) AS totacctbal
FROM customer CROSS JOIN avg_bal
WHERE c_acctbal > ab
  AND c_custkey NOT IN
    (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY segment
"""


# ---------------------------------------------------------------- r9 batch 3


def _knn_label_metrics_sql() -> str:
    """q201 replay: batch exact-cosine ranking via the q19 unnest-join
    (queries = every KNN_METRICS_EVERY-th vector), binary same-label
    gains, DCG/IDCG from the SAME literal decimal discount tables the
    engine ships (similarity._dcg_tables — no engine-side log2), and
    per-label metric means through the portable floor-half-up round
    over exact 12dp decimal sums."""
    from .operators.similarity import (
        KNN_METRICS_EVERY,
        KNN_METRICS_K,
        KNN_METRICS_MAX_QUERIES,
        _dcg_tables,
    )

    k = KNN_METRICS_K
    disc, pref = _dcg_tables(k)
    disc_case = " ".join(
        f"WHEN {r + 1} THEN CAST('{disc[r]}' AS DECIMAL(14,12))"
        for r in range(k)
    )
    idcg_case = " ".join(
        f"WHEN {m + 1} THEN CAST('{pref[m]}' AS DECIMAL(16,12))"
        for m in range(k)
    )
    pr12 = "floor({x} * 1e12 + 0.5) / 1e12"
    return f"""
WITH base AS (
  SELECT vec_id AS id, label, embedding AS v FROM embeddings),
ex AS (
  SELECT id, label, CAST(unnest(v) AS DOUBLE) AS x,
         generate_subscripts(v, 1) AS i FROM base),
q AS (
  SELECT id AS qid, label AS qlabel, x AS qx, i
  FROM ex WHERE id % {KNN_METRICS_EVERY} = 0
    AND id < {KNN_METRICS_EVERY * KNN_METRICS_MAX_QUERIES}),
s AS (
  SELECT e.id, e.label, q.qid, q.qlabel,
    sum(e.x * q.qx) AS dp,
    sqrt(sum(e.x * e.x)) AS ne,
    sqrt(sum(q.qx * q.qx)) AS nq
  FROM ex e JOIN q ON e.i = q.i AND e.id <> q.qid
  GROUP BY e.id, e.label, q.qid, q.qlabel),
ranked AS (
  SELECT qid, qlabel, id, label,
    row_number() OVER (PARTITION BY qid
                       ORDER BY dp / (ne * nq) DESC, id) AS rnk
  FROM s WHERE ne > 0 AND nq > 0),
ln_tot AS (SELECT label, count(*) AS n FROM base GROUP BY label),
per_q AS (
  SELECT qid, qlabel,
    sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS rel_k,
    min(CASE WHEN label = qlabel THEN rnk END) AS first_rel,
    sum(CASE WHEN label = qlabel
        THEN CASE rnk {disc_case} END
        ELSE CAST(0 AS DECIMAL(14,12)) END) AS dcg
  FROM ranked WHERE rnk <= {k} GROUP BY qid, qlabel),
m AS (
  SELECT qid, qlabel,
    CASE WHEN (n - 1) > 0 THEN
      CAST(dcg AS DOUBLE) /
      CAST(CASE least(n - 1, {k}) {idcg_case} END AS DOUBLE)
    ELSE 0.0 END AS ndcg,
    CASE WHEN first_rel IS NOT NULL THEN 1.0 / first_rel ELSE 0.0 END AS mrr,
    CAST(rel_k AS DOUBLE) / {k}.0 AS p,
    CASE WHEN (n - 1) > 0 THEN CAST(rel_k AS DOUBLE) / (n - 1)
    ELSE 0.0 END AS recall
  FROM per_q JOIN ln_tot ON per_q.qlabel = ln_tot.label)
SELECT qlabel AS label, CAST(count(*) AS BIGINT) AS n_queries,
  floor(CAST(sum(CAST({pr12.format(x='ndcg')} AS DECIMAL(20,12))) AS DOUBLE)
        / count(*) * 1e6 + 0.5) / 1e6 AS mean_ndcg,
  floor(CAST(sum(CAST({pr12.format(x='mrr')} AS DECIMAL(20,12))) AS DOUBLE)
        / count(*) * 1e6 + 0.5) / 1e6 AS mean_mrr,
  floor(CAST(sum(CAST({pr12.format(x='p')} AS DECIMAL(20,12))) AS DOUBLE)
        / count(*) * 1e6 + 0.5) / 1e6 AS mean_precision,
  floor(CAST(sum(CAST({pr12.format(x='recall')} AS DECIMAL(20,12))) AS DOUBLE)
        / count(*) * 1e6 + 0.5) / 1e6 AS mean_recall
FROM m GROUP BY qlabel
"""


ORACLES["q201_knn_label_metrics"] = _knn_label_metrics_sql()


def _link_prediction_sql() -> str:
    """q202 replay: support>=2 co-purchase edges, hub-capped wedge
    self-join, AA terms as floor-half-up 9dp decimals (exact sum),
    LEFT-JOIN-null anti against the edge set, endpoint-degree
    Jaccard, top-30 by the exact decimal score. Constants
    single-sourced from plans.graph."""
    from .plans.graph import LP_HUB_CAP, LP_TOPK

    return f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
d AS (SELECT u, count(*) AS deg FROM und GROUP BY u),
legs AS (
  SELECT und.u AS z, und.v AS a,
    CAST(floor(1.0 / ln(d.deg) * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9)) AS term
  FROM und JOIN d ON und.u = d.u
  WHERE d.deg <= {LP_HUB_CAP} AND d.deg >= 2),
w AS (
  SELECT x.a AS a, y.a AS b, count(*) AS n_common, sum(x.term) AS aa
  FROM legs x JOIN legs y ON x.z = y.z AND x.a < y.a
  GROUP BY 1, 2),
cand AS (
  SELECT w.* FROM w LEFT JOIN e ON w.a = e.u AND w.b = e.v
  WHERE e.u IS NULL)
SELECT a AS node_a, b AS node_b, CAST(n_common AS BIGINT) AS n_common,
  round(CAST(aa AS DOUBLE), 6) AS adamic_adar,
  round(CAST(n_common AS DOUBLE) / (da.deg + db.deg - n_common), 6) AS jaccard
FROM cand JOIN d da ON cand.a = da.u JOIN d db ON cand.b = db.u
ORDER BY aa DESC, node_a, node_b LIMIT {LP_TOPK}
"""


ORACLES["q202_link_prediction"] = _link_prediction_sql()


def _backoff_lm_sql() -> str:
    """q203 replay: even-id train counts, odd-id held-out scoring,
    CASE on seen-bigram vs alpha*unigram backoff, per-term portable
    12dp round into exact decimal sums; T and alpha single-sourced
    from operators.ml."""
    from .operators.ml import SB_ALPHA

    toks = _TOKS.format(col="lower(text)")
    return f"""
WITH d AS (SELECT doc_id, {toks} AS t FROM documents),
train AS (SELECT * FROM d WHERE doc_id % 2 = 0),
test AS (SELECT * FROM d WHERE doc_id % 2 <> 0),
tp AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM train, unnest(range(1, len(t))) AS r(i)),
bi AS (SELECT w1, w2, count(*) AS c12 FROM tp GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM bi GROUP BY 1),
uni AS (
  SELECT w2, count(*) AS cw
  FROM (SELECT unnest(t) AS w2 FROM train) GROUP BY 1),
tt AS (SELECT CAST(greatest(coalesce(sum(len(t)), 0), 1) AS DOUBLE) AS T
       FROM train),
tep AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM test, unnest(range(1, len(t))) AS r(i)),
tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM tep GROUP BY 1, 2, 3),
sc AS (
  SELECT tf.doc_id,
    sum(tf.tf) AS nb,
    sum(CASE WHEN bi.c12 IS NULL THEN tf.tf ELSE 0 END) AS nback,
    sum(CAST(floor((CASE WHEN bi.c12 IS NOT NULL
            THEN CAST(bi.c12 AS DOUBLE) / ctx.c1
            ELSE {_dbl(SB_ALPHA)} * CAST(coalesce(uni.cw, 0) AS DOUBLE) / tt.T
          END) * 1e12 + 0.5) / 1e12 AS DECIMAL(20,12)) * tf.tf) AS ssum
  FROM tf LEFT JOIN bi USING (w1, w2) LEFT JOIN ctx USING (w1)
  LEFT JOIN uni ON tf.w2 = uni.w2 CROSS JOIN tt
  GROUP BY tf.doc_id)
SELECT test.doc_id,
  CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
  CAST(coalesce(nback, 0) AS BIGINT) AS n_backoff,
  coalesce(floor(CAST(ssum AS DOUBLE) / nb * 1e6 + 0.5) / 1e6, 0.0) AS sb_score
FROM test LEFT JOIN sc USING (doc_id)
"""


ORACLES["q203_backoff_lm"] = _backoff_lm_sql()


def _survival_retention_sql() -> str:
    """q204 replay: per-user lifetime days (floor of the double
    quotient — Spark's cast-to-bigint truncation on a non-negative
    value), churn flag vs the broadcast horizon, reversed cumulative
    at-risk window, and the survival product via list_reduce over the
    day-ascending factor list — the same left-to-right IEEE fold the
    engine runs (1.0-seeded fold == unseeded fold on doubles).
    Gap constant single-sourced from operators.temporal."""
    from .operators.temporal import KM_CHURN_GAP_US

    return f"""
WITH pu AS (
  SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
  FROM events GROUP BY user_id),
h AS (SELECT max(l) AS hz FROM pu),
lt AS (
  SELECT CAST(floor((l - f) / 86400000000) AS BIGINT) AS dur,
         (hz - l) > {KM_CHURN_GAP_US} AS dead
  FROM pu CROSS JOIN h),
days AS (
  SELECT dur,
    sum(CASE WHEN dead THEN 1 ELSE 0 END) AS deaths,
    sum(CASE WHEN dead THEN 0 ELSE 1 END) AS censored
  FROM lt GROUP BY dur),
risk AS (
  SELECT dur, deaths, censored,
    sum(deaths + censored) OVER (
      ORDER BY dur ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      AS at_risk
  FROM days),
fac AS (
  SELECT dur, deaths, censored, at_risk,
    1.0 - CAST(deaths AS DOUBLE) / at_risk AS factor,
    row_number() OVER (ORDER BY dur) AS rn
  FROM risk),
lst AS (SELECT list(factor ORDER BY dur) AS fl FROM fac)
SELECT dur AS day,
  CAST(at_risk AS BIGINT) AS at_risk,
  CAST(deaths AS BIGINT) AS deaths,
  CAST(censored AS BIGINT) AS censored,
  floor(list_reduce(list_slice(fl, 1, rn), (a, b) -> a * b) * 1e6 + 0.5)
    / 1e6 AS survival
FROM fac CROSS JOIN lst
"""


ORACLES["q204_survival_retention"] = _survival_retention_sql()


def _stream_sessions_sql() -> str:
    """q205 replay: the session gate's final emitted set in closed
    form — same md5 row derivation as q164's oracle, skey/ts exactly
    the gate's projection (user %% SESSION_KEYS, ts = id seconds),
    gaps-and-islands with a break at diff > gap — STRICT: Spark's
    session merge is boundary-INCLUSIVE (MergingSessionsIterator
    starts a new session only when currentEnd < nextStart, so an
    event landing exactly at prev_ts + gap still merges), end =
    last + gap. Batch
    structure never appears: the emitted union over legs equals the
    full sessionization of the id range."""
    from .streaming.gate import (
        SESSION_FLUSH_ID,
        SESSION_GAP_S,
        SESSION_KEYS,
    )

    return f"""
WITH ids AS (SELECT unnest(range(0, {SESSION_FLUSH_ID})) AS event_id),
h AS (SELECT event_id,
        md5('ev:' || CAST(event_id AS VARCHAR)) AS hx FROM ids),
e AS (
  SELECT event_id,
    (CAST(('0x' || substr(hx, 1, 4)) AS BIGINT) % 500) % {SESSION_KEYS}
      AS skey,
    event_id AS t,
    CAST(CAST(('0x' || substr(hx, 7, 4)) AS BIGINT) % 50000 AS DOUBLE)
      / 100.0 AS value
  FROM h),
g AS (
  SELECT *, CASE WHEN lag(t) OVER (PARTITION BY skey ORDER BY t) IS NULL
                   OR t - lag(t) OVER (PARTITION BY skey ORDER BY t)
                      > {SESSION_GAP_S}
            THEN 1 ELSE 0 END AS brk
  FROM e),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY skey ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM g)
SELECT CAST(skey AS BIGINT) AS skey,
  CAST(min(t) AS BIGINT) AS session_start_s,
  CAST(max(t) + {SESSION_GAP_S} AS BIGINT) AS session_end_s,
  CAST(count(*) AS BIGINT) AS n_events,
  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
FROM s GROUP BY skey, sess
"""


ORACLES["q205_stream_sessions"] = _stream_sessions_sql()


ORACLES["q206_pit_enrichment"] = """
WITH p AS (
  SELECT user_id, ts, event_id,
    count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS cum
  FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT user_id, ts, event_id,
    CASE WHEN cum >= 6 THEN 'gold'
         WHEN cum >= 3 THEN 'silver' ELSE 'bronze' END AS tier
  FROM p),
-- equal-ts duplicates: only the greatest event_id at each (user, ts)
-- ever had a nonzero validity interval (scd2_history semantics)
t1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) AS rn
    FROM t) WHERE rn = 1),
-- collapse no-op transitions
hist AS (
  SELECT * FROM (
    SELECT user_id, ts, event_id, tier,
      lag(tier) OVER (PARTITION BY user_id ORDER BY ts) AS prev_tier
    FROM t1)
  WHERE prev_tier IS NULL OR prev_tier <> tier),
versions AS (
  SELECT tier, CAST(count(*) AS BIGINT) AS n_versions FROM hist GROUP BY tier),
clicks AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'click'),
enriched AS (
  SELECT c.*, coalesce(
    (SELECT h.tier FROM hist h
      WHERE h.user_id = c.user_id AND h.ts <= c.ts
      ORDER BY h.ts DESC, h.event_id DESC LIMIT 1), 'none') AS tier
  FROM clicks c),
by_tier AS (
  SELECT tier, CAST(count(*) AS BIGINT) AS n_clicks,
    round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
      AS sum_click_value
  FROM enriched GROUP BY tier)
SELECT b.tier, coalesce(v.n_versions, 0) AS n_versions,
  b.n_clicks, b.sum_click_value
FROM by_tier b LEFT JOIN versions v ON b.tier = v.tier
"""

ORACLES["q207_assoc_rules"] = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nb AS (SELECT count(DISTINCT l_orderkey) AS n FROM items),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
supp AS (SELECT l_partkey, count(*) AS s FROM items GROUP BY 1),
scored AS (
  SELECT pa AS antecedent, pb AS consequent, support,
    CAST(support AS DOUBLE) / sa.s AS conf,
    CAST(support AS DOUBLE) / sa.s * nb.n / sb.s AS lift
  FROM pairs JOIN supp sa ON pairs.pa = sa.l_partkey
             JOIN supp sb ON pairs.pb = sb.l_partkey
             CROSS JOIN nb)
SELECT antecedent, consequent, CAST(support AS BIGINT) AS support,
  round(conf, 6) AS confidence, round(lift, 6) AS lift
FROM scored
ORDER BY lift DESC, conf DESC, antecedent, consequent LIMIT 20
"""

ORACLES["q208_skyline"] = """
WITH daily AS (
  SELECT o_orderdate, max(o_totalprice) AS dmax
  FROM orders GROUP BY o_orderdate),
run AS (
  SELECT o_orderdate, dmax,
    max(dmax) OVER (ORDER BY o_orderdate
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS prev_max
  FROM daily),
frontier AS (
  SELECT o_orderdate, dmax FROM run
  WHERE prev_max IS NULL OR dmax > prev_max)
SELECT o.o_orderkey,
  CAST(epoch_us(o.o_orderdate) / 1000000 AS BIGINT) AS order_date_s,
  round(o.o_totalprice, 2) AS o_totalprice
FROM orders o JOIN frontier f
  ON o.o_orderdate = f.o_orderdate AND o.o_totalprice = f.dmax
"""


def _preference_pairs_sql() -> str:
    """q209 replay: the quality CTE, dual rank windows (desc/asc with
    opposite id tie-breaks), i-th-best ⋈ i-th-worst on rank within
    (source, length-bucket), margin floor. Constants single-sourced
    from operators.curation."""
    from .operators.curation import PREF_LEN_SPLIT, PREF_MIN_MARGIN

    return (
        _quality_features_cte()
        + f""",
strata AS (
  SELECT doc_id, source,
    CASE WHEN n_tokens <= {PREF_LEN_SPLIT} THEN 'short' ELSE 'long' END
      AS len_bucket,
    quality_score AS qs
  FROM q),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY source, len_bucket
                       ORDER BY qs DESC, doc_id ASC) AS rb,
    row_number() OVER (PARTITION BY source, len_bucket
                       ORDER BY qs ASC, doc_id DESC) AS rw,
    count(*) OVER (PARTITION BY source, len_bucket) AS n
  FROM strata)
SELECT b.source, b.len_bucket,
  b.doc_id AS chosen_id, w.doc_id AS rejected_id,
  round(b.qs - w.qs, 6) AS margin
FROM ranked b JOIN ranked w
  ON b.source = w.source AND b.len_bucket = w.len_bucket
 AND b.rb = w.rw AND b.rb <= b.n / 2 AND w.rw <= w.n / 2
WHERE round(b.qs - w.qs, 6) >= {PREF_MIN_MARGIN}
"""
    )


ORACLES["q209_preference_pairs"] = _preference_pairs_sql()


def _walk_pairs_sql() -> str:
    """q210 replay: ranked sorted adjacency over the support>=2
    co-purchase graph, per-step next-hop election by the same
    portable md5 hop hash, chained hop joins, window-2 skip-gram
    pairs, top-30. Constants single-sourced from plans.graph."""
    from .plans.graph import WALK_STEPS, WALK_TOPK

    hop_joins = []
    for s in range(1, WALK_STEPS + 1):
        hop_joins.append(
            f"""nx{s} AS (
  SELECT u, v FROM adj
  WHERE rn = CAST(('0x' || substr(md5('walk:' || CAST(u AS VARCHAR)
                 || ':{s}'), 1, 15)) AS BIGINT) % deg)"""
        )
    chain = "w0 AS (SELECT DISTINCT u AS n0 FROM adj)"
    prev = "w0"
    for s in range(1, WALK_STEPS + 1):
        chain += f""",
w{s} AS (
  SELECT {prev}.*, nx{s}.v AS n{s}
  FROM {prev} JOIN nx{s} ON n{s - 1} = nx{s}.u)"""
        prev = f"w{s}"
    cols = [f"n{i}" for i in range(WALK_STEPS + 1)]
    legs = []
    for i in range(len(cols)):
        for jj in range(i + 1, min(i + 3, len(cols))):
            legs.append(
                f"SELECT least({cols[i]}, {cols[jj]}) AS node_a, "
                f"greatest({cols[i]}, {cols[jj]}) AS node_b FROM {prev}"
            )
    union = "\n  UNION ALL\n  ".join(legs)
    hops_sql = ",\n".join(hop_joins)
    return f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
adj AS (
  SELECT u, v,
    row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS rn,
    count(*) OVER (PARTITION BY u) AS deg
  FROM und),
{hops_sql},
{chain},
pairs AS (
  {union}),
counts AS (
  SELECT node_a, node_b, count(*) AS n_cooc FROM pairs
  WHERE node_a <> node_b GROUP BY 1, 2)
SELECT node_a, node_b, CAST(n_cooc AS BIGINT) AS n_cooc
FROM counts ORDER BY n_cooc DESC, node_a, node_b LIMIT {WALK_TOPK}
"""


ORACLES["q210_walk_pairs"] = _walk_pairs_sql()


def _lsh_tuning_sql() -> str:
    """q211 replay: the q18 consecutive-pair 6dp Jaccard feeding the
    identical left-fold multiply chains per (bands, rows) config;
    per-pair P on the portable 12dp grid into exact decimal sums.
    Configs single-sourced from operators.dedup."""
    from .operators.dedup import LSH_TUNE_CONFIGS

    def chain(expr: str, n: int) -> str:
        out = expr
        for _ in range(n - 1):
            out = f"({out} * {expr})"
        return out

    legs = []
    for b, r in LSH_TUNE_CONFIGS:
        sr = chain("s", r)
        p = f"({_dbl(1.0)} - {chain(f'({_dbl(1.0)} - {sr})', b)})"
        legs.append(
            f"SELECT {b} AS bands, {r} AS rows_per_band, "
            f"CAST(floor({p} * 1e12 + 0.5) / 1e12 AS DECIMAL(20,12)) AS p, "
            f"CASE WHEN {p} >= 0.5 THEN 1 ELSE 0 END AS likely FROM sims"
        )
    union = "\n  UNION ALL\n  ".join(legs)
    toks = _TOKS.format(col="text")
    return f"""
WITH tk AS (SELECT doc_id, {toks} AS t FROM documents),
sh AS (SELECT doc_id, {_SHINGLES} AS s FROM tk),
sims AS (
  SELECT round(CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
               THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
               ELSE 0.0 END, 6) AS s
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1),
legs AS (
  {union})
SELECT bands, rows_per_band,
  CAST(count(*) AS BIGINT) AS n_pairs,
  round(CAST(sum(p) AS DOUBLE), 4) AS expected_caught,
  floor(CAST(sum(p) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
    AS expected_recall,
  CAST(sum(likely) AS BIGINT) AS n_likely
FROM legs GROUP BY bands, rows_per_band
"""


ORACLES["q211_lsh_tuning"] = _lsh_tuning_sql()


def _seq_patterns_sql() -> str:
    """q212 replay: (ts, event_id)-ranked positions, the same three
    aggregates (first per type, last per type, min-b-after-first-a)
    and the M < L support join; top-20. Constant single-sourced from
    operators.temporal."""
    from .operators.temporal import SEQ_PATTERN_TOPK

    return f"""
WITH pos AS (
  SELECT user_id, event_type AS t,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
  FROM events),
f AS (SELECT user_id, t AS a, min(p) AS fp FROM pos GROUP BY 1, 2),
l AS (SELECT user_id, t AS c, max(p) AS lp FROM pos GROUP BY 1, 2),
m AS (
  SELECT pos.user_id, f.a, pos.t AS b, min(pos.p) AS mp
  FROM pos JOIN f ON pos.user_id = f.user_id AND pos.p > f.fp
  GROUP BY 1, 2, 3),
s AS (
  SELECT m.a AS step1, m.b AS step2, l.c AS step3, count(*) AS support
  FROM m JOIN l ON m.user_id = l.user_id AND m.mp < l.lp
  GROUP BY 1, 2, 3)
SELECT step1, step2, step3, CAST(support AS BIGINT) AS support
FROM s ORDER BY support DESC, step1, step2, step3
LIMIT {SEQ_PATTERN_TOPK}
"""


ORACLES["q212_seq_patterns"] = _seq_patterns_sql()


def _stream_dedup_sql() -> str:
    """q213 replay: the deduped stream in closed form — first
    occurrence of key k is event_id k (ids ascend in offset order and
    the duplicate k + KEYS arrives a whole batch later), so the rollup
    is exactly the md5 derivation over [0, KEYS). Constants
    single-sourced from streaming.gate."""
    from .streaming.gate import DEDUP_GATE_KEYS

    return f"""
WITH ids AS (SELECT unnest(range(0, {DEDUP_GATE_KEYS})) AS event_id),
h AS (SELECT event_id,
        md5('ev:' || CAST(event_id AS VARCHAR)) AS hx FROM ids),
e AS (
  SELECT event_id AS dup_key,
    ['view','click','purchase','signup','error'][
      (CAST(('0x' || substr(hx, 5, 2)) AS BIGINT) % 5) + 1] AS event_type,
    CAST(CAST(('0x' || substr(hx, 7, 4)) AS BIGINT) % 50000 AS DOUBLE)
      / 100.0 AS value
  FROM h)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value,
  CAST(min(dup_key) AS BIGINT) AS min_key,
  CAST(max(dup_key) AS BIGINT) AS max_key
FROM e GROUP BY event_type
"""


ORACLES["q213_stream_dedup"] = _stream_dedup_sql()
