"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — a single scan + TakeOrderedAndProject,
embarrassingly parallel, the right answer up to ~10^9 vectors per query
batch. Scale path: sign-LSH bucketing cuts candidates by 2^planes per
probe; both share the same JVM-side cosine expression (functions.cosine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cosine, dot, l2_norm, spread_small_input


def cosine_topk(
    df: DataFrame,
    query: Column | list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against one query vector.

    Compiles to scan → project (codegen'd double math) → per-partition
    top-k heap → driver merge of k·partitions rows; no shuffle."""
    q = query if isinstance(query, Column) else F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    # cosine() is NULL for zero-magnitude vectors — undefined similarity
    # can never be a neighbor, so drop it rather than padding the tail
    # of a short result (keeps the SQL oracles' norm>0 guards exact).
    return (
        scored.filter(F.col("cos_sim").isNotNull())
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def _plane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d of plane p is
    ±1 by parity of xxhash64(p, d). Dot-sign = one LSH bit."""
    signed = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, i: x.cast("double")
            * F.when(F.pmod(F.xxhash64(F.lit(plane), i), 2) == 0, 1.0).otherwise(-1.0),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(signed >= 0, F.lit(1)).otherwise(F.lit(0))


def plane_matrix(planes: int, dim: int, seed: int = 0) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix computed driver-side (pure
    Python md5 — engine-independent). The matrix is data-independent
    and tiny (planes×dim ints), so shipping it as literals costs
    nothing and makes the bucketing replayable in any SQL engine."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[0] % 2 == 0 else -1
            for d in range(dim)
        ]
        for p in range(planes)
    ]


# Corpus-derived LSH capacity dial (r7-verdict lead item): a FIXED
# plane count makes the bucket-join candidate volume Σ|bucket|² ≈
# n²/2^planes — quadratic in the corpus. Deriving planes from the
# corpus size pins expected bucket occupancy at TARGET_BUCKET_ROWS,
# so candidate volume is ≈ n·target — linear. The formula is pure
# integer (no float log2) so the DuckDB oracle replays it exactly:
# planes = clamp(smallest p with 2^p ≥ ceil(n/target), min, max).
AUTO_TARGET_BUCKET_ROWS = 1024
AUTO_MIN_PLANES = 1
# 2^20 buckets × 1024 rows ≈ 10^9 vectors before occupancy grows
# again; raise for a larger corpus (each +1 plane is one more
# 64-mult dot per row — linear, cheap).
AUTO_MAX_PLANES = 20


def auto_planes(
    n_rows: int,
    target_bucket_rows: int = AUTO_TARGET_BUCKET_ROWS,
    min_planes: int = AUTO_MIN_PLANES,
    max_planes: int = AUTO_MAX_PLANES,
) -> int:
    """Driver-side twin of the in-plan mask derivation: smallest p
    with 2^p ≥ ceil(n/target), clamped. Integer-exact, so any engine
    (or test) computing it from the same count gets the same p."""
    if n_rows <= 0:
        return min_planes
    m = -(-n_rows // target_bucket_rows)  # ceil div
    p = (m - 1).bit_length()
    return max(min_planes, min(max_planes, p))


def _auto_mask_column(
    n: Column,
    target_bucket_rows: int = AUTO_TARGET_BUCKET_ROWS,
    min_planes: int = AUTO_MIN_PLANES,
    max_planes: int = AUTO_MAX_PLANES,
) -> Column:
    """Bucket MASK (2^planes − 1) as a when-chain over the row count —
    the same ladder the oracle emits as a SQL CASE, so the derived
    plane count is identical in both engines by construction.
    n ≤ target·2^p  ⇔  ceil(n/target) ≤ 2^p, first true branch wins
    ⇒ smallest such p, clamped to [min_planes, max_planes]."""
    mask = F.when(
        n <= F.lit(target_bucket_rows << min_planes), F.lit((1 << min_planes) - 1)
    )
    for p in range(min_planes + 1, max_planes + 1):
        mask = mask.when(
            n <= F.lit(target_bucket_rows << p), F.lit((1 << p) - 1)
        )
    return mask.otherwise(F.lit((1 << max_planes) - 1))


def lsh_bucket_auto(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    matrix: list[list[int]] | None = None,
    target_bucket_rows: int = AUTO_TARGET_BUCKET_ROWS,
    min_planes: int = AUTO_MIN_PLANES,
    max_planes: int = AUTO_MAX_PLANES,
) -> DataFrame:
    """Sign-LSH bucketing with a CORPUS-DERIVED plane count, fully
    inside the plan (zero driver-side jobs): all ``max_planes`` bits
    are computed per row, the row count arrives as a broadcast
    one-row aggregate (the keyless-agg BNLJ pattern the plan lint
    allowlists as bounded), and the bucket id is masked down to the
    derived plane count. Masking ≡ using only the first p matrix
    rows, and ``plane_matrix`` rows depend only on their index — so
    a DuckDB oracle emitting the same ladder over count(*) of the
    (identically guarded) table buckets identically.

    Cost note: computing max_planes bits instead of p is max_planes
    64-mult dots per row — linear and dwarfed by the ~target-row
    candidate scoring each probe does downstream."""
    m = matrix if matrix is not None else plane_matrix(max_planes, dim)
    if len(m) < max_planes:
        raise ValueError(
            f"matrix has {len(m)} rows; lsh_bucket_auto needs max_planes={max_planes}"
        )
    # The '0'/'1' bit-string encoding below can only carry ±1 signs —
    # a caller passing an arbitrary-float matrix (which lsh_bucket
    # supports) would get silently different buckets instead of an
    # error (r9 ADVICE). Validate before encoding.
    for p, row in enumerate(m[:max_planes]):
        for d, s in enumerate(row):
            if s not in (1, -1):
                raise ValueError(
                    f"lsh_bucket_auto requires a ±1 plane matrix; "
                    f"matrix[{p}][{d}] = {s!r} (use lsh_bucket for "
                    f"arbitrary float planes)"
                )
    # The plane matrix travels as DATA on the same broadcast one-row
    # frame as the row count, not as unrolled literal expressions: a
    # 20-plane × 64-dim literal matrix is ~1280 literal nodes per
    # bucketing, and a banded caller builds several bucketings whose
    # subtrees the candidate self-join then duplicates — measured
    # ~11 s of plan construction/analysis plus a codegen'd expression
    # too large to compile quickly (q165: 19.7 s warm, of which <3 s
    # was execution). The fold below runs the IDENTICAL arithmetic
    # (per plane: left-fold sum of x·s in element order, sign at
    # >= 0.0, bit OR'ed at position p) with a plan whose size is
    # constant in planes×dim — the assign_clusters convention.
    # Delivery detail: the matrix rides the count aggregate's one-row
    # frame as ONE '0'/'1' string literal decoded by a (foldable,
    # evaluated-once) projection — not as a separate local-relation
    # crossJoin, which would add a second BNLJ per bucketing whose
    # bound the plan lint cannot prove (the build side here stays a
    # keyless-aggregate chain the lint auto-blesses).
    bits_str = "".join(
        "1" if s == 1 else "0" for row in m[:max_planes] for s in row
    )
    decode = F.expr(
        f"""transform(sequence(0, {max_planes - 1}), p ->
              transform(sequence(0, {dim - 1}), d ->
                CASE WHEN substring('{bits_str}', p * {dim} + d + 1, 1) = '1'
                     THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END))"""
    )
    meta = (
        df.select(F.lit(1).alias("__one"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .select("__n", decode.alias("__pm"))
    )
    bits = F.expr(
        f"""aggregate(
              sequence(0, {max_planes - 1}),
              CAST(0 AS BIGINT),
              (acc, p) -> acc | shiftleft(
                  CAST(CASE WHEN aggregate(
                        zip_with(`{vec_col}`, element_at(`__pm`, p + 1),
                                 (x, s) -> CAST(x AS DOUBLE) * s),
                        CAST(0.0 AS DOUBLE),
                        (a, v) -> a + v) >= CAST(0.0 AS DOUBLE)
                       THEN 1 ELSE 0 END AS BIGINT),
                  p))"""
    )
    mask = _auto_mask_column(
        F.col("__n"), target_bucket_rows, min_planes, max_planes
    )
    return (
        df.crossJoin(F.broadcast(meta))
        .withColumn("lsh_bucket", bits.bitwiseAND(mask))
        .drop("__n", "__pm")
    )


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
    matrix: list[list[int]] | None = None,
) -> DataFrame:
    """Append a sign-LSH bucket id (int in [0, 2^planes)).

    Default planes come from xxhash64 parity (fastest, JVM-native);
    pass a ``plane_matrix`` to use literal ±1 rows instead — identical
    plan shape, but cross-engine replayable (the q28 oracle path)."""
    bits = None
    for p in range(planes):
        if matrix is None:
            sign = _plane_sign(F.col(vec_col), p, dim)
        else:
            row = F.array(*[F.lit(float(s)) for s in matrix[p]])
            signed = F.aggregate(
                F.zip_with(F.col(vec_col), row, lambda x, s: x.cast("double") * s),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            sign = F.when(signed >= 0, F.lit(1)).otherwise(F.lit(0))
        term = F.shiftleft(sign.cast("long"), p)
        bits = term if bits is None else bits.bitwiseOR(term)
    return df.withColumn("lsh_bucket", bits)


def lsh_topk(
    buckets: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    matrix: list[list[int]] | None = None,
) -> DataFrame:
    """ANN: score only vectors in the query's bucket (single partition-
    pruned scan when `buckets` is written partitioned by lsh_bucket).
    Pass the same ``matrix`` used to build the buckets, if any."""
    dim = len(query)
    qdf = buckets.sparkSession.createDataFrame([(query,)], f"q: array<double>")
    qrow = lsh_bucket(qdf, "q", planes, dim, matrix).collect()[0]
    qbucket = qrow["lsh_bucket"]
    cand = buckets.filter(F.col("lsh_bucket") == qbucket)
    return cosine_topk(cand, query, k, id_col, vec_col)


def batch_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bucket_col: str = "lsh_bucket",
    broadcast_queries: bool = True,
    exclude_self: bool = True,
    spread: bool = True,
) -> DataFrame:
    """Many-query ANN retrieval in ONE join — the batch shape real
    retrieval workloads have (N query vectors at once), vs the
    single-vector probe of ``lsh_topk``.

    Both inputs must already carry ``bucket_col`` (from ``lsh_bucket``
    with the SAME plane matrix). Plan: queries ⋈ corpus equi-joined on
    the bucket, cosine scored inside the bucket only, then one window
    per query for the top-k. With ``broadcast_queries`` (the default)
    the query side is broadcast and the corpus is never shuffled —
    correct ONLY for a bounded batch (a fixed request set, KBs–MBs);
    for a corpus-proportional query set (e.g. "every Nth vector"),
    pass False so the join shuffles both sides on the bucket instead
    of collecting a corpus-sized batch to the driver. The window's
    partition count equals the query count, so the rank step shuffles
    candidate rows (Σ per-query bucket occupancy), never the corpus.
    Zero-magnitude vectors on either side are dropped (cosine
    undefined). ``exclude_self`` (default True) drops the corpus row
    whose id EQUALS the query's id — correct when queries are drawn
    from the corpus id space (the usual "every Nth vector" shape).
    For an EXTERNAL query batch whose ids are unrelated to corpus
    ids, pass False: an accidental id collision would otherwise
    silently discard a legitimate neighbor.

    Returns (query_id, vec_id, cos_sim, rank), rank 1..k per query.
    """

    # The corpus side streams through the bucket join and then scores
    # every joined candidate IN THE SAME STAGE — a single-split scan
    # (one parquet file at toy scale) would run the whole Σ|bucket|²
    # candidate-scoring serially on one core. Round-robin-spread it
    # first (guarded no-op at real scale, guide §2.5: file splits
    # provide the parallelism there); result-identical because every
    # downstream cut is keyed/salted layout-independently. Callers
    # that already spread the corpus upstream (mutual_knn_pairs /
    # banded_mutual_knn) pass spread=False to avoid a second exchange.
    c = (
        (spread_small_input(corpus) if spread else corpus)
        .select(
            F.col(bucket_col),
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        )
        .withColumn("__cn", l2_norm(F.col("__cv")))
        .filter(F.col("__cn") > 0)
    )
    q = (
        queries.select(
            F.col(bucket_col),
            F.col(query_id_col),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        )
        .withColumn("__qn", l2_norm(F.col("__qv")))
        .filter(F.col("__qn") > 0)
    )
    joined = c.join(F.broadcast(q) if broadcast_queries else q, on=bucket_col)
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    scored = (
        joined
        .select(
            query_id_col,
            id_col,
            (dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def write_lsh_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
) -> None:
    """Materialize the scale path: bucket + write partitioned by
    lsh_bucket, so a probe's bucket filter becomes directory pruning
    (PartitionFilters) and reads ~1/2^planes of the data."""
    from ..sources.layout import write_partitioned

    write_partitioned(lsh_bucket(df, vec_col, planes, dim), path, ["lsh_bucket"])


def read_lsh_index(spark, path: str) -> DataFrame:
    """Scan of a write_lsh_index layout; feed straight into lsh_topk —
    its bucket equality filter prunes partitions at planning time."""
    return spark.read.parquet(path)


def auto_n_lists(n_rows: int, min_lists: int = 16, max_lists: int = 65536) -> int:
    """Corpus-derived IVF list count — the clustering twin of
    ``auto_planes``: n_lists ≈ √n (the standard IVF sizing — per-list
    occupancy and centroid-scan cost both ≈ √n, so within-list
    pairwise work Σ|list|² ≈ n^1.5, never n²). Clamped; callers that
    need ORACLE-replayable clustering pin an explicit constant instead
    (a data-dependent k changes the Lloyd CTE structure, so the gate
    entries q30/q104/q147 keep pinned dials with the scaling rule in
    their docstrings)."""
    if n_rows <= 0:
        return min_lists
    return max(min_lists, min(max_lists, int(round(n_rows ** 0.5))))


def ivf_index(
    df: DataFrame,
    n_lists: int | str = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: MLlib k-means over the embeddings; returns
    (df + `ivf_list` column, centroid list). At scale the indexed table
    is written partitioned by ivf_list so a probe reads only nprobe/n
    of the data (partition pruning on the scan). Pass
    ``n_lists="auto"`` to derive √n lists from a corpus count
    (one job — index BUILD time, not query time)."""
    if n_lists == "auto":
        n_lists = auto_n_lists(df.count())
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = df.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(
        k=n_lists, seed=seed, maxIter=20, featuresCol="__v", predictionCol="ivf_list"
    ).fit(vecs)
    indexed = model.transform(vecs).drop("__v")
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    return indexed, centroids


def write_ivf_index(indexed: DataFrame, path: str) -> None:
    """Materialize the IVF lists partitioned by ivf_list: an nprobe
    probe then reads only nprobe/n_lists directories."""
    from ..sources.layout import write_partitioned

    write_partitioned(indexed, path, ["ivf_list"])


def read_ivf_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ivf_topk(
    indexed: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN probe: rank centroids by cosine to the query driver-side
    (n_lists floats — trivially small), scan only the nprobe nearest
    inverted lists, brute-force cosine inside them."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dp = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return dp / (na * nb)

    ranked = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], query))
    probe = ranked[: max(nprobe, 1)]
    cand = indexed.filter(F.col("ivf_list").isin(probe))
    return cosine_topk(cand, query, k, id_col, vec_col)


def pairwise_cosine_within(
    df: DataFrame,
    key_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key (e.g. an
    LSH bucket): the all-pairs join is confined to each key's bucket."""

    # Precompute each vector's norm ONCE before the pair join: the per-
    # pair expression is then a single dot product instead of dot + two
    # norms (3x less higher-order-function work on the exploded pairs).
    # Spread a single-split input before the pair join: the join's
    # streaming side otherwise emits (and scores) every in-bucket pair
    # on one core (guarded no-op at real scale — guide §2.5).
    withn = (
        spread_small_input(df)
        .select(
            F.col(key_col),
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .withColumn("__n", l2_norm(F.col("__v")))
        # Zero-magnitude vectors have no defined cosine to anything:
        # drop them BEFORE the self-join (also keeps the per-pair
        # division from raising DIVIDE_BY_ZERO under default ANSI).
        .filter(F.col("__n") > 0)
    )
    a = withn.select(
        F.col(key_col),
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = withn.select(
        F.col(key_col),
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    return (
        a.join(b, on=key_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector integer quantization (int8 by default) —
    the 4× compression step before shipping an embedding corpus into an
    ANN index or training shard.

    scale = max|v| / (2^(bits-1) - 1); q_i = floor(v_i/scale + 0.5)
    (explicit half-up so any SQL engine replays it bit-for-bit — both
    Spark and DuckDB `round` have engine-specific .5 behavior);
    dequant = q_i·scale. Zero vectors quantize to zeros with scale 0.

    Pure array codegen, zero shuffles. Returns (id_col, scale, qvec
    array<int>, plus reconstruction metrics max_abs_err and
    cos_recon — the quantization-quality dashboard columns)."""
    qmax = float(2 ** (bits - 1) - 1)
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / qmax).otherwise(F.lit(0.0))
    # per-element array lambdas are interpreted — spread a single-split
    # input across cores first (no-op at real scale)
    base = spread_small_input(df).select(
        F.col(id_col), v.alias("__v"), scale.alias("scale")
    )
    qvec = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col("__v"),
            lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int"),
        ),
    ).otherwise(F.transform(F.col("__v"), lambda x: F.lit(0)))
    quantized = base.withColumn("qvec", qvec).withColumn(
        "__dq", F.transform(F.col("qvec"), lambda q: q.cast("double") * F.col("scale"))
    )
    err = F.array_max(
        F.zip_with(F.col("__v"), F.col("__dq"), lambda a, b: F.abs(a - b))
    )
    return quantized.select(
        id_col,
        F.col("scale"),
        "qvec",
        err.alias("max_abs_err"),
        # zero vectors have no direction: cosine is undefined (NULL),
        # and the guard keeps ANSI mode from raising DIVIDE_BY_ZERO
        F.when(
            F.col("scale") > 0, cosine(F.col("__v"), F.col("__dq"))
        ).alias("cos_recon"),
    )


# Product-quantization shape — single-sourced with the q135/q141
# oracles. QUERIES/TOPK bound the q141 ADC scan's batch dimensions.
PQ_CONFIG = {"m": 4, "k": 8, "iters": 3, "sample_n": 4096}
PQ_SEARCH_QUERIES = 5
PQ_SEARCH_TOPK = 5
# Salt fan-out for the two-phase distributed top-k below. At this SF a
# handful of buckets suffices; on a real cluster set ≈ the corpus scan's
# partition count so phase 1 runs one local top-k heap per input split.
PQ_RANK_SALTS = 8


def _salted_topk(
    scored: DataFrame,
    part_cols: list[str],
    order_cols: list,
    k: int,
    id_col: str,
    n_salts: int = PQ_RANK_SALTS,
    rank_col: str | None = None,
) -> DataFrame:
    """EXACT distributed top-k per partition-key group — the salted
    two-phase cut that replaces `Window.partitionBy(query).orderBy(d)`
    over corpus-scale rows (the r6-verdict scale finding: row_number
    has no partial top-k pushdown, so n_queries reducers would each
    receive and fully sort |corpus| rows).

    Phase 1 shards each group's rows across ``n_salts`` buckets by a
    hash of ``id_col`` (layout-independent, so the survivor set — and
    therefore the result — never depends on physical partitioning) and
    takes the per-(group, salt) top-k: group-count × n_salts window
    partitions of |corpus|/n_salts rows each. Phase 2 ranks only the
    ≤ k·n_salts survivors per group. Exactness: the order
    (``order_cols`` must end in a unique tiebreak, e.g. id) is total,
    each bucket forwards its complete local top-k, and the global
    top-k can draw at most k rows from any one bucket — so every
    global winner survives phase 1. Same answer, no corpus-sized sort
    on any single reducer.

    ``rank_col=None`` drops the rank from the output; otherwise the
    phase-2 row_number is kept under that name (identical to the
    single-window rank because the order is total)."""
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    w1 = Window.partitionBy(*part_cols, "__rank_salt").orderBy(*order_cols)
    survivors = (
        scored.withColumn("__rank_salt", salt)
        .withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1", "__rank_salt")
    )
    w2 = Window.partitionBy(*part_cols).orderBy(*order_cols)
    out = survivors.withColumn(rank_col or "__rn2", F.row_number().over(w2)).filter(
        F.col(rank_col or "__rn2") <= k
    )
    return out if rank_col else out.drop("__rn2")


def _pq_base(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).filter(F.col("v").isNotNull())


def _pq_fit(
    base: DataFrame, m: int, k: int, iters: int, sample_n: int
) -> tuple[int, int, list]:
    """Modal-dim election + per-subspace Lloyd fit on the bounded
    smallest-id sample (shared by pq_codebook_stats / pq_encode /
    pq_search — ONE definition of the codebook recurrence). Returns
    (dim, subdim, codebooks as an m×k×subdim nested list)."""
    from ..plans.kmeans import lloyd_numpy

    # MODAL dim, not max: one corrupt oversized vector must not abort
    # the fit (indivisible dim) or — worse — silently become the
    # space every valid vector is filtered out of. Ties break to the
    # smaller dim, deterministically.
    mode = (
        base.groupBy(F.size("v").alias("__d"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), F.asc("__d"))
        .first()
    )
    dim = mode["__d"] if mode else 0
    if dim == 0:
        raise ValueError("pq fit: no non-null vectors")
    if dim % m != 0:
        raise ValueError(f"pq fit: dim {dim} not divisible by m={m}")
    sub = dim // m

    import numpy as np

    rows = (
        base.filter(F.size("v") == dim).select("id", "v").orderBy("id").limit(sample_n).collect()
    )
    if not rows:
        raise ValueError("pq fit: empty training sample")
    pts = np.array([r["v"] for r in rows], dtype=np.float64)
    codebooks = [
        lloyd_numpy(pts[:, mi * sub : (mi + 1) * sub].copy(), k, iters)
        for mi in range(m)
    ]
    return dim, sub, codebooks


def _sqdist(vec, cen):
    """Pure-codegen squared euclidean distance between two arrays —
    the exact left-to-right fold the q135/q141 oracles replay with
    list_sum(list_transform(list_zip(...)))."""
    return F.aggregate(
        F.zip_with(vec, cen, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dist_to(sl):
    # closure factory, NOT a default-arg lambda: F.transform hands
    # a two-arg lambda (element, INDEX) — the repo-wide gotcha
    return lambda cen: _sqdist(sl, cen)


def pq_codebook_stats(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_CONFIG["m"],
    k: int = PQ_CONFIG["k"],
    iters: int = PQ_CONFIG["iters"],
    sample_n: int = PQ_CONFIG["sample_n"],
) -> DataFrame:
    """Product-quantization codebook audit: split the embedding into
    ``m`` contiguous subspaces, train a ``k``-code Lloyd codebook per
    subspace, assign every vector its per-subspace codes, and report
    per-(subspace, code) occupancy and mean squared distortion — the
    compress-the-embedding-store decision table (PQ turns dim·4 bytes
    into m bytes per vector; the distortion column is what you trade).

    Scale shape (the q30 FAISS discipline, ×m): codebook FIT runs
    driver-side on ONE bounded deterministic sample (the sample_n
    smallest-id rows, collected once and sliced per subspace —
    plans.kmeans.lloyd_numpy, the exact lloyd_kmeans recurrence);
    ASSIGNMENT of the full corpus is map-only against the broadcast
    m×k×subdim codebook tensor (codebooks travel as DATA, the
    assign_clusters codegen-stability trick) — all m argmins ride one
    projection, ONE corpus pass, zero joins; the STATS collapse to an
    m·k-key hash aggregate with map-side combine. The corpus never
    moves.

    Vectors whose length differs from the modal dim are excluded (not
    points in the space — the q117 rule); the modal dim must divide
    into m equal subspaces. Returns (subspace, code, n_vecs,
    mean_sqdist 6dp) ordered by (subspace, code) — up to m·k rows
    (a code no vector maps to emits none).
    """
    base = _pq_base(df, id_col, vec_col)
    dim, sub, codebooks = _pq_fit(base, m, k, iters, sample_n)
    base = base.filter(F.size("v") == dim)

    spark = df.sparkSession
    cm = spark.createDataFrame([(codebooks,)], "__cm array<array<array<double>>>")
    joined = base.crossJoin(F.broadcast(cm))

    structs = []
    for mi in range(m):
        sl = F.slice(F.col("v"), mi * sub + 1, sub)
        dists = F.transform(F.col("__cm")[mi], _dist_to(sl))
        structs.append(
            F.struct(
                F.lit(mi).alias("subspace"),
                (F.array_position(dists, F.array_min(dists)) - 1)
                .cast("int")
                .alias("code"),
                F.array_min(dists).alias("sq"),
            )
        )
    exploded = joined.select(F.explode(F.array(*structs)).alias("s")).select(
        F.col("s.subspace").alias("subspace"),
        F.col("s.code").alias("code"),
        F.col("s.sq").alias("sq"),
    )
    return (
        exploded.groupBy("subspace", "code")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.sum("sq") / F.count(F.lit(1)), 6).alias("mean_sqdist"),
        )
        .orderBy("subspace", "code")
    )


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_CONFIG["m"],
    k: int = PQ_CONFIG["k"],
    iters: int = PQ_CONFIG["iters"],
    sample_n: int = PQ_CONFIG["sample_n"],
) -> tuple[DataFrame, int, int, list]:
    """Encode the corpus to product-quantization codes — the compressed
    vector store q135 audits: each vector becomes ``m`` small ints
    (one byte each at k<=256), i.e. dim·4 bytes shrink to m bytes.

    Same fit discipline as pq_codebook_stats (bounded smallest-id
    sample, modal-dim election); encoding is ONE map-only corpus pass
    against the broadcast m×k×subdim codebook tensor — all m argmins
    ride one projection, zero joins, the corpus never shuffles.

    Returns (codes DataFrame (id_col, codes array<int>), dim, subdim,
    codebooks) so a caller (pq_search) can reuse the fitted tensor.
    """
    base = _pq_base(df, id_col, vec_col)
    dim, sub, codebooks = _pq_fit(base, m, k, iters, sample_n)
    base = base.filter(F.size("v") == dim)
    spark = df.sparkSession
    cm = spark.createDataFrame([(codebooks,)], "__cm array<array<array<double>>>")
    codes = []
    for mi in range(m):
        sl = F.slice(F.col("v"), mi * sub + 1, sub)
        dists = F.transform(F.col("__cm")[mi], _dist_to(sl))
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    encoded = base.crossJoin(F.broadcast(cm)).select(
        F.col("id").alias(id_col), F.array(*codes).alias("codes")
    )
    return encoded, dim, sub, codebooks


def pq_search(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = PQ_SEARCH_QUERIES,
    topk: int = PQ_SEARCH_TOPK,
    m: int = PQ_CONFIG["m"],
    k: int = PQ_CONFIG["k"],
    iters: int = PQ_CONFIG["iters"],
    sample_n: int = PQ_CONFIG["sample_n"],
) -> DataFrame:
    """ADC (asymmetric distance computation) search over the PQ-encoded
    corpus — the retrieval half that closes the q135 compression loop,
    the way batch_ann closes the LSH loop: queries keep their EXACT
    vectors, the corpus is represented ONLY by its m-byte codes, and
    distance(q, v) = Σ_mi sqdist(q_slice_mi, centroid[code_v[mi]]).

    Query batch = the ``n_queries`` smallest-id valid vectors (bounded
    by construction, broadcast into the scan). Plan: pq_encode's
    map-only pass produces the code table, then ONE projection over it
    computes all m ADC terms per (query, vector) against the broadcast
    query batch + codebook tensor (the per-query m×k lookup tables are
    exactly these terms — with bounded m·k they inline as expressions
    instead of materializing), and the salted two-phase cut
    (``_salted_topk``) takes the exact top-k: per-(query, salt) local
    top-k first, then rank over the ≤ k·n_salts survivors — no single
    reducer ever sorts corpus-scale rows (the r6-verdict fix; the old
    shape was one |corpus|-row sort per query). The corpus never
    shuffles for scoring; at even larger scale, additionally pre-prune
    with an IVF routing stage (q30) so each query scores one probe
    list, not the corpus.

    The ADC sum is a FIXED left-to-right m-term expression (not an
    aggregate) so the oracle replays bit-identical IEEE addition;
    ranking orders by the 6dp-ROUNDED distance then id (engine-stable
    ties). Self-matches (query id = corpus id) are excluded. Returns
    (query_id, vec_id, adc_dist 6dp, rank 1..topk).
    """
    encoded, dim, sub, codebooks = pq_encode(
        df, id_col, vec_col, m=m, k=k, iters=iters, sample_n=sample_n
    )
    queries = (
        _pq_base(df, id_col, vec_col)
        .filter(F.size("v") == dim)
        .orderBy("id")
        .limit(n_queries)
        .select(F.col("id").alias("query_id"), F.col("v").alias("__qv"))
    )
    spark = df.sparkSession
    cm = spark.createDataFrame([(codebooks,)], "__cm array<array<array<double>>>")
    joined = (
        encoded.crossJoin(F.broadcast(queries))
        .crossJoin(F.broadcast(cm))
        .filter(F.col(id_col) != F.col("query_id"))
    )
    dist = None
    for mi in range(m):
        qsl = F.slice(F.col("__qv"), mi * sub + 1, sub)
        cen = F.element_at(F.col("__cm")[mi], F.col("codes")[mi] + 1)
        term = _sqdist(qsl, cen)
        dist = term if dist is None else dist + term
    scored = joined.select(
        "query_id", id_col, F.round(dist, 6).alias("adc_dist")
    )
    return _salted_topk(
        scored,
        ["query_id"],
        [F.asc("adc_dist"), F.asc(id_col)],
        topk,
        id_col,
        rank_col="rank",
    )


def pq_recall_audit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = PQ_SEARCH_QUERIES,
    topk: int = PQ_SEARCH_TOPK,
    m: int = PQ_CONFIG["m"],
    k: int = PQ_CONFIG["k"],
    iters: int = PQ_CONFIG["iters"],
    sample_n: int = PQ_CONFIG["sample_n"],
) -> DataFrame:
    """Recall@k of PQ ADC search against the EXACT squared-euclidean
    top-k — the quality dial that closes the compression loop: q135
    reports what PQ costs in distortion, q141 runs the compressed
    search, this op says what the m-byte representation costs in
    retrieval quality (the compress-or-don't decision number).

    Same query batch / exclusion / tie rules as pq_search; exact truth
    is one brute-force scored pass over the same valid corpus (the
    cosine_topk discipline, euclidean because that is what ADC
    approximates), ranked by the 6dp-rounded distance then id. Output:
    (query_id, n_matched, recall 6dp) — one row per query, recall =
    |ADC top-k ∩ exact top-k| / k. Plan: two corpus-streaming scored
    passes, each cut with the salted two-phase top-k (``_salted_topk``
    — no corpus-sized window partition), + one candidate-bounded
    (n_queries·topk rows) join; nothing corpus² anywhere."""
    adc = pq_search(
        df, id_col, vec_col, n_queries=n_queries, topk=topk,
        m=m, k=k, iters=iters, sample_n=sample_n,
    ).select(F.col("query_id"), F.col(id_col))
    base = _pq_base(df, id_col, vec_col)
    # same modal-dim election as the fit (one tiny job; keeps this op
    # independently callable without re-fitting codebooks)
    mode = (
        base.groupBy(F.size("v").alias("__d"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), F.asc("__d"))
        .first()
    )
    dim = mode["__d"] if mode else 0
    valid = base.filter(F.size("v") == dim)
    queries = (
        valid.orderBy("id")
        .limit(n_queries)
        .select(F.col("id").alias("query_id"), F.col("v").alias("__qv"))
    )
    exact_scored = (
        valid.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias(id_col),
            F.round(_sqdist(F.col("__qv"), F.col("v")), 6).alias("__d"),
        )
    )
    exact = _salted_topk(
        exact_scored,
        ["query_id"],
        [F.asc("__d"), F.asc(id_col)],
        topk,
        id_col,
    ).select("query_id", id_col)
    matched = (
        adc.join(exact, ["query_id", id_col])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    return (
        queries.select("query_id")
        .join(matched, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("__m", F.lit(0)).alias("n_matched"),
            F.round(
                F.coalesce("__m", F.lit(0)).cast("double") / F.lit(float(topk)), 6
            ).alias("recall"),
        )
    )


# Matryoshka-style prefix-truncation audit dims — single-sourced with
# the q143 oracle. The FULL dim (ground truth) is the modal corpus dim.
MATRYOSHKA_PREFIXES = [8, 16, 32]
MATRYOSHKA_QUERIES = 5
MATRYOSHKA_TOPK = 5


def matryoshka_recall(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefixes: list[int] = None,
    n_queries: int = MATRYOSHKA_QUERIES,
    topk: int = MATRYOSHKA_TOPK,
) -> DataFrame:
    """Matryoshka-style truncation audit (Kusupati et al. 2022): for
    each prefix length d, recall@k of cosine top-k computed on the
    FIRST d embedding components against full-dim cosine top-k — the
    how-short-can-my-vectors-get table (prefix truncation cuts the
    vector store and every distance by dim/d with zero re-encoding IF
    the embedder was matryoshka-trained; this measures the IF).

    Query batch = the n_queries smallest-id valid vectors (broadcast).
    ONE corpus-streaming pass scores every prefix AND the full dim in
    a single projection (the slices share the array; no per-prefix
    scan), explodes to (prefix, query, id, cos) candidate rows, cuts
    each (prefix, query) group with the salted two-phase top-k
    (``_salted_topk`` — no corpus-sized window partition; the r6
    verdict's scale fix) and joins prefix top-k against full top-k
    (prefix is the only fan-out; candidate table is
    |corpus|·(|prefixes|+1) narrow rows).
    Zero-magnitude slices drop for THAT prefix only (cosine undefined
    there, well-defined elsewhere). Ties: 6dp-rounded cosine desc,
    then id. Returns (prefix_dim, query_id, n_matched, recall 6dp)."""
    if prefixes is None:
        prefixes = MATRYOSHKA_PREFIXES
    base = _pq_base(df, id_col, vec_col)
    mode = (
        base.groupBy(F.size("v").alias("__d"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), F.asc("__d"))
        .first()
    )
    dim = mode["__d"] if mode else 0
    if dim == 0:
        raise ValueError("matryoshka_recall: no non-null vectors")
    # a prefix >= the modal dim is not a truncation — drop it rather
    # than report a vacuous (or slice-clamped) recall of 1.0. When NO
    # configured prefix qualifies (degenerate corpus: modal dim at or
    # below the smallest prefix) return an EMPTY result with the output
    # schema instead of raising — the q143 oracle returns empty there,
    # so both engines agree (the round-6 advisor note).
    prefixes = [d for d in prefixes if d < dim]
    if not prefixes:
        return df.sparkSession.createDataFrame(
            [],
            "prefix_dim int, query_id long, n_matched bigint, recall double",
        )
    valid = base.filter(F.size("v") == dim)
    queries = (
        valid.orderBy("id")
        .limit(n_queries)
        .select(F.col("id").alias("query_id"), F.col("v").alias("__qv"))
    )
    joined = valid.crossJoin(F.broadcast(queries)).filter(
        F.col("id") != F.col("query_id")
    )

    def cos_at(d: int):
        qs, vs = F.slice("__qv", 1, d), F.slice("v", 1, d)
        num = F.aggregate(
            F.zip_with(qs, vs, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
        qn = F.sqrt(
            F.aggregate(
                F.transform(qs, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x
            )
        )
        vn = F.sqrt(
            F.aggregate(
                F.transform(vs, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x
            )
        )
        # NULL when either slice has zero magnitude — dropped below
        return F.when((qn > 0) & (vn > 0), F.round(num / (qn * vn), 6))

    dims = [*prefixes, dim]
    cand = joined.select(
        "query_id",
        F.col("id").alias(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("prefix_dim"), cos_at(d).alias("cos"))
                    for d in dims
                ]
            )
        ).alias("s"),
    ).select(
        "query_id", id_col, F.col("s.prefix_dim").alias("prefix_dim"), F.col("s.cos").alias("cos")
    ).filter(F.col("cos").isNotNull())
    ranked = _salted_topk(
        cand,
        ["prefix_dim", "query_id"],
        [F.desc("cos"), F.asc(id_col)],
        topk,
        id_col,
    ).select("prefix_dim", "query_id", id_col)
    truth = ranked.filter(F.col("prefix_dim") == dim).select("query_id", id_col)
    pref = ranked.filter(F.col("prefix_dim") != dim)
    matched = (
        pref.join(truth, ["query_id", id_col])
        .groupBy("prefix_dim", "query_id")
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    spine = queries.select("query_id").crossJoin(
        F.broadcast(
            queries.sparkSession.createDataFrame(
                [(d,) for d in prefixes], "prefix_dim int"
            )
        )
    )
    return spine.join(matched, ["prefix_dim", "query_id"], "left").select(
        "prefix_dim",
        "query_id",
        F.coalesce("__m", F.lit(0)).alias("n_matched"),
        F.round(
            F.coalesce("__m", F.lit(0)).cast("double") / F.lit(float(topk)), 6
        ).alias("recall"),
    )


# Probe count for the IVF-routed ADC search — shared with the q147
# oracle (never restate there).
IVF_PQ_NPROBE = 4


def ivf_pq_search(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = PQ_SEARCH_QUERIES,
    topk: int = PQ_SEARCH_TOPK,
    nprobe: int = IVF_PQ_NPROBE,
    m: int = PQ_CONFIG["m"],
    k: int = PQ_CONFIG["k"],
    iters: int = PQ_CONFIG["iters"],
    sample_n: int = PQ_CONFIG["sample_n"],
    ivf: dict | None = None,
) -> DataFrame:
    """IVF-routed ADC search — the FAISS IVF-PQ composition and the
    r6-verdict's option (a) for the PQ family's scale path: a coarse
    quantizer routes each query to its ``nprobe`` nearest inverted
    lists, and ADC distance is computed ONLY for vectors in probed
    lists — each query scores ~|corpus|·nprobe/k_lists candidates
    instead of the corpus (pq_search's salted cut bounds the REDUCE
    side; this bounds the MAP side too).

    Plan: ONE corpus pass computes both the PQ codes (m argmins vs the
    broadcast codebook tensor) and the IVF list (argmin vs the
    broadcast centroid matrix) in the same projection — the corpus
    never shuffles. The quantizer trains driver-side on the bounded
    smallest-id sample (plans.kmeans.lloyd_kmeans_sample, the q30
    discipline), so fit + routing replay exactly in SQL. The query
    batch ranks centroids in its own bounded projection (array_sort
    of (dist, cluster) structs — ties to the lowest cluster, the
    oracle's rule), explodes to (query, probe-list) pairs, and the
    candidate join is a BROADCAST hash equi-join on the list id (the
    n_queries·nprobe build side); the final cut is the salted
    two-phase top-k. Self-matches excluded. Returns
    (query_id, vec_id, adc_dist 6dp, rank 1..topk); a query whose
    probed lists hold fewer than topk candidates returns fewer rows
    (routing loss — exactly what pq_recall_audit-style auditing
    measures against this op).

    Reference semantics anchor: composition of q135/q141's PQ
    recurrence with q30's quantizer contract (plans/kmeans.py:
    IVF_QUANTIZER) — both already driver-gate-green individually."""
    from ..plans.kmeans import IVF_QUANTIZER, lloyd_kmeans_sample

    ivf_cfg = dict(IVF_QUANTIZER if ivf is None else ivf)
    base = _pq_base(df, id_col, vec_col)
    dim, sub, codebooks = _pq_fit(base, m, k, iters, sample_n)
    base = base.filter(F.size("v") == dim)
    centroids = lloyd_kmeans_sample(base, "id", "v", **ivf_cfg)
    spark = df.sparkSession
    tensors = spark.createDataFrame(
        [(codebooks, centroids)],
        "__cm array<array<array<double>>>, __ivf array<array<double>>",
    )
    # one corpus pass: PQ codes + IVF list in the same projection
    ivf_dists = F.transform(F.col("__ivf"), _dist_to(F.col("v")))
    lst = (F.array_position(ivf_dists, F.array_min(ivf_dists)) - 1).cast("int")
    codes = []
    for mi in range(m):
        sl = F.slice(F.col("v"), mi * sub + 1, sub)
        dl = F.transform(F.col("__cm")[mi], _dist_to(sl))
        codes.append((F.array_position(dl, F.array_min(dl)) - 1).cast("int"))
    corpus = base.crossJoin(F.broadcast(tensors)).select(
        F.col("id").alias(id_col),
        lst.alias("__list"),
        F.array(*codes).alias("codes"),
    )
    # bounded query batch → (query, probe-list) pairs, broadcast
    k_lists = ivf_cfg["k"]
    probe_structs = F.zip_with(
        F.col("__ivf"),
        F.sequence(F.lit(0), F.lit(k_lists - 1)),
        lambda cen, i: F.struct(
            _sqdist(F.col("__qv"), cen).alias("d"), i.cast("int").alias("cluster")
        ),
    )
    qprobes = (
        base.orderBy("id")
        .limit(n_queries)
        .select(F.col("id").alias("query_id"), F.col("v").alias("__qv"))
        .crossJoin(F.broadcast(tensors.select("__ivf")))
        .select(
            "query_id",
            "__qv",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(probe_structs), 1, nprobe),
                    lambda s: s["cluster"],
                )
            ).alias("__list"),
        )
    )
    cand = (
        corpus.join(F.broadcast(qprobes), "__list")
        .filter(F.col(id_col) != F.col("query_id"))
        .crossJoin(F.broadcast(tensors.select("__cm")))
    )
    dist = None
    for mi in range(m):
        qsl = F.slice(F.col("__qv"), mi * sub + 1, sub)
        cen = F.element_at(F.col("__cm")[mi], F.col("codes")[mi] + 1)
        term = _sqdist(qsl, cen)
        dist = term if dist is None else dist + term
    scored = cand.select("query_id", id_col, F.round(dist, 6).alias("adc_dist"))
    return _salted_topk(
        scored,
        ["query_id"],
        [F.asc("adc_dist"), F.asc(id_col)],
        topk,
        id_col,
        rank_col="rank",
    )


def ivf_pq_recall_audit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = PQ_SEARCH_QUERIES,
    topk: int = PQ_SEARCH_TOPK,
    nprobe: int = IVF_PQ_NPROBE,
    m: int = PQ_CONFIG["m"],
    k: int = PQ_CONFIG["k"],
    iters: int = PQ_CONFIG["iters"],
    sample_n: int = PQ_CONFIG["sample_n"],
    ivf: dict | None = None,
) -> DataFrame:
    """Recall@k of IVF-routed ADC search (q147) against the exact
    squared-euclidean top-k — the ROUTING-LOSS dial: q142 reports what
    the m-byte PQ representation costs in retrieval quality; the gap
    between q142's recall and this one is what nprobe routing costs on
    top (the knob a real deployment turns: raise nprobe until this
    matches q142, then stop paying for more lists).

    Same query batch / exclusion / tie rules as pq_search/q142; the
    exact pass is one corpus-streaming scored scan cut with the salted
    two-phase top-k, the routed pass is ivf_pq_search, the
    intersection join is candidate-bounded. Returns
    (query_id, n_matched, recall 6dp) — one row per query."""
    routed = ivf_pq_search(
        df, id_col, vec_col, n_queries=n_queries, topk=topk, nprobe=nprobe,
        m=m, k=k, iters=iters, sample_n=sample_n, ivf=ivf,
    ).select(F.col("query_id"), F.col(id_col))
    base = _pq_base(df, id_col, vec_col)
    mode = (
        base.groupBy(F.size("v").alias("__d"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), F.asc("__d"))
        .first()
    )
    dim = mode["__d"] if mode else 0
    valid = base.filter(F.size("v") == dim)
    queries = (
        valid.orderBy("id")
        .limit(n_queries)
        .select(F.col("id").alias("query_id"), F.col("v").alias("__qv"))
    )
    exact_scored = (
        valid.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias(id_col),
            F.round(_sqdist(F.col("__qv"), F.col("v")), 6).alias("__d"),
        )
    )
    exact = _salted_topk(
        exact_scored,
        ["query_id"],
        [F.asc("__d"), F.asc(id_col)],
        topk,
        id_col,
    ).select("query_id", id_col)
    matched = (
        routed.join(exact, ["query_id", id_col])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    return (
        queries.select("query_id")
        .join(matched, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("__m", F.lit(0)).alias("n_matched"),
            F.round(
                F.coalesce("__m", F.lit(0)).cast("double") / F.lit(float(topk)), 6
            ).alias("recall"),
        )
    )


def anisotropy_audit(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-space anisotropy audit (Ethayarajh 2019's diagnostic,
    computed the closed-form way): for unit-normalized vectors û, the
    EXPECTED pairwise cosine over all pairs equals ||mean(û)||² — so
    the n² pairwise average collapses to one per-dimension mean pass
    plus a d-term sum. An isotropic (well-spread) embedding space
    scores ≈ 0; a cone-collapsed one → 1 — the "are my embeddings
    degenerate before I build an index on them" dial.

    Plan: one scan normalizes + posexplodes to (pos, x̂) pairs, a
    map-side-combining aggregate keyed by the d-sized dictionary takes
    per-dim means of û and of the raw norms' first moments, and a
    d-row reduction yields the scalars. Zero-magnitude vectors are
    dropped (no direction). Returns ONE row:
    (n_vecs, mean_norm 6dp, anisotropy 6dp)."""

    base = (
        df.select(F.col(vec_col).cast("array<double>").alias("__v"))
        .withColumn("__n", l2_norm(F.col("__v")))
        .filter(F.col("__n") > 0)
    )
    exploded = base.select(
        "__n", F.posexplode(F.transform("__v", lambda x: x / F.col("__n"))).alias("__pos", "__u")
    )
    per_dim = exploded.groupBy("__pos").agg(
        F.avg("__u").alias("__mu"),
        F.count(F.lit(1)).alias("__c"),
        F.sum("__n").alias("__sn"),
    )
    return per_dim.agg(
        F.max("__c").alias("n_vecs"),
        F.round(F.max(F.col("__sn") / F.col("__c")), 6).alias("mean_norm"),
        F.round(F.sum(F.col("__mu") * F.col("__mu")), 6).alias("anisotropy"),
    )


def standardization_audit(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Would per-dimension standardization (whitening-lite: subtract
    the dim mean, divide by the dim std) fix an anisotropic embedding
    space? Answer in ONE result row: anisotropy (expected pairwise
    cosine, ‖mean û‖² closed form — see anisotropy_audit) of the raw
    space next to the anisotropy of the standardized space.

    Everything stays relational and exploded — no per-vector array
    rebuild, no driver-side stats: (id, pos, x) rows join a broadcast
    d-row dim-stats dictionary, per-vector norms are a doc-bounded
    window (partition = vector id, d rows each), and both anisotropies
    reduce through d-row per-dim means. The static plan re-explodes
    per consumer — three column-pruned scans of the ONE vector column
    (dim-stats pass, raw-side reduction, standardized-side reduction)
    plus the d-row modal-dim probe; persisting the d×-corpus exploded
    stream instead would trade executor memory for narrow scans at no
    win. Zero corpus-scale sorts.

    Population: vectors of the MODAL dimension only (the engine-wide
    rule for cross-vector dim math); zero-norm vectors drop from the
    respective anisotropy whose norm is zero (a constant-dim vector
    can be zero AFTER standardization — n_vecs_raw / n_vecs_std carry
    both denominators). std=0 dims standardize to 0.
    """
    base = (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .withColumn("__d", F.size("__v"))
    )
    mode = (
        base.groupBy("__d").count().orderBy(F.col("count").desc(), F.col("__d").asc()).first()
    )
    if mode is None:
        # Degenerate corpus (no non-null vectors): EMPTY result with the
        # output schema, matching the oracle's empty-on-degenerate guard
        # — the gate must compare results, not crash (the r6 advisor's
        # matryoshka rule applied here).
        return df.sparkSession.createDataFrame(
            [],
            "dim int, n_vecs_raw long, aniso_raw double, "
            "n_vecs_std long, aniso_std double",
        )
    dim = int(mode["__d"])
    vecs = base.filter(F.col("__d") == dim)
    e = vecs.select("__id", F.posexplode("__v").alias("__pos", "__x"))
    dims = e.groupBy("__pos").agg(
        F.avg("__x").alias("__mu"), F.sqrt(F.var_pop("__x")).alias("__sd")
    )
    es = e.join(F.broadcast(dims), "__pos").select(
        "__id",
        "__pos",
        "__x",
        F.when(F.col("__sd") > 0, (F.col("__x") - F.col("__mu")) / F.col("__sd"))
        .otherwise(F.lit(0.0))
        .alias("__xs"),
    )
    wv = Window.partitionBy("__id")
    withn = es.select(
        "__id",
        "__pos",
        "__x",
        "__xs",
        F.sqrt(F.sum(F.col("__x") * F.col("__x")).over(wv)).alias("__nr"),
        F.sqrt(F.sum(F.col("__xs") * F.col("__xs")).over(wv)).alias("__ns"),
    )
    raw_dim = (
        withn.filter(F.col("__nr") > 0)
        .groupBy("__pos")
        .agg(F.avg(F.col("__x") / F.col("__nr")).alias("__mu"), F.count(F.lit(1)).alias("__c"))
    )
    std_dim = (
        withn.filter(F.col("__ns") > 0)
        .groupBy("__pos")
        .agg(F.avg(F.col("__xs") / F.col("__ns")).alias("__mu"), F.count(F.lit(1)).alias("__c"))
    )
    raw = raw_dim.agg(
        F.max("__c").alias("n_vecs_raw"),
        F.round(F.sum(F.col("__mu") * F.col("__mu")), 6).alias("aniso_raw"),
    )
    std = std_dim.agg(
        F.max("__c").alias("n_vecs_std"),
        F.round(F.sum(F.col("__mu") * F.col("__mu")), 6).alias("aniso_std"),
    )
    return (
        raw.crossJoin(F.broadcast(std))
        .select(
            F.lit(dim).cast("int").alias("dim"),
            "n_vecs_raw",
            "aniso_raw",
            "n_vecs_std",
            "aniso_std",
        )
    )


def hard_negative_mining(
    df: DataFrame,
    every_nth: int = 100,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    broadcast_anchors: bool = True,
) -> DataFrame:
    """Hard-negative mining for contrastive / reranker training: for
    each anchor vector, the top-k most-cosine-similar vectors with a
    DIFFERENT label — maximally confusing negatives, the pairs that
    actually move a contrastive loss (random negatives are trivially
    separated after the first epochs).

    Anchors are a deterministic corpus slice (every ``every_nth`` id,
    q103's convention). The label-mismatch predicate is NOT joined as a
    non-equi BNLJ: anchors expand against the bounded distinct-label
    dictionary ("this anchor × every OTHER label") and the corpus joins
    that target table with a plain EQUI-join on the label — the corpus
    streams through a hash join, no nested-loop anywhere. Then the
    exact salted two-phase top-k cut (no reducer ever sorts
    corpus-scale rows); rank order is total on the 6dp-rounded cosine
    (the q143 convention) then id. ``broadcast_anchors`` mirrors
    q103's dial: True for bounded request batches; at 100 TB an
    every-nth slice is itself corpus-proportional — pass False and the
    equi-join shuffles both sides on the label key (low-cardinality
    labels skew: AQE skew-join splits the hot reducers).

    Returns (query_id, query_label, vec_id, neg_cos, rank).
    """
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"), F.col(label_col)
    ).filter(F.col("__v").isNotNull() & F.col(label_col).isNotNull())
    anchors = base.filter(F.col(id_col) % every_nth == 0).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col(label_col).alias("query_label"),
    )
    labels = base.select(F.col(label_col).alias("__cl")).distinct()
    # The (anchor × other-label) routing table carries KEYS ONLY — the
    # query VECTOR is attached afterwards by a query_id equi-join
    # against the one-vector-per-anchor table, so the broadcast
    # payload is |anchors|·(|labels|-1) scalar triples plus each
    # vector ONCE, not |anchors|·(|labels|-1) full vectors (r7-advice:
    # with high label cardinality the vector-duplicating broadcast
    # scaled with labels × dim and could blow the broadcast limit
    # even for a bounded anchor set).
    tkeys = anchors.select("query_id", "query_label").join(
        F.broadcast(labels), F.col("__cl") != F.col("query_label")
    )
    qvecs = anchors.select("query_id", "__qv")
    scored = (
        base.join(
            F.broadcast(tkeys) if broadcast_anchors else tkeys,
            F.col(label_col) == F.col("__cl"),
        )
        .join(
            F.broadcast(qvecs) if broadcast_anchors else qvecs,
            "query_id",
        )
        .select(
            "query_id",
            "query_label",
            F.col(id_col),
            # rank on the 6dp-ROUNDED cosine (the q143 convention): the
            # ordering an oracle engine replays must not hinge on sub-6dp
            # float-accumulation differences
            F.round(cosine(F.col("__v"), F.col("__qv")), 6).alias("__cos"),
        )
        .filter(F.col("__cos").isNotNull())
    )
    out = _salted_topk(
        scored,
        ["query_id"],
        [F.col("__cos").desc(), F.col(id_col).asc()],
        k,
        id_col=id_col,
        rank_col="rank",
    )
    return out.select(
        "query_id",
        "query_label",
        id_col,
        F.col("__cos").alias("neg_cos"),
        F.col("rank").cast("int").alias("rank"),
    )


def banded_mutual_knn(
    df: DataFrame,
    k: int = 4,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    target_bucket_rows: int = AUTO_TARGET_BUCKET_ROWS,
) -> DataFrame:
    """Mutual kNN over a BAND-OR of independent LSH bucketings — the
    recall amplifier for the auto occupancy dial. One sign-LSH
    bucketing misses any pair a hyperplane slices; ``bands``
    independent plane sets (plane_matrix seeds 0..bands-1) each
    generate in-bucket candidates and the union is scored once — miss
    probability decays geometrically in the band count (the minhash
    banding argument applied to sign-LSH) while candidate volume
    stays ~bands·n·target_bucket_rows — linear in the corpus, scaled
    by a small constant.

    Plan: per band, the same auto-masked bucket join as
    ``mutual_knn_pairs`` emitting CANDIDATE ID PAIRS only (no vectors
    ride through the union/distinct); the distinct pair set joins
    the corpus twice to attach both vectors, cosine is scored once
    per surviving pair, per-query top-k via the salted two-phase cut,
    then the reciprocal self-join. Output schema matches
    mutual_knn_pairs: (id_a, id_b, cos_sim, rank_ab, rank_ba).
    """
    if dim is None:
        first = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if first is None:
            return df.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cos_sim double, rank_ab int, rank_ba int"
            )
        dim = len(first[0])
    # One spread feeds every per-band bucketing AND the vector-attach
    # sides: a single-split scan would compute the 20-bit LSH and
    # generate each band's in-bucket id pairs serially (guarded no-op
    # at real scale — guide §2.5).
    df = spread_small_input(df)
    base = (
        df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
        )
        .withColumn("__n", l2_norm(F.col("__v")))
        .filter(F.col("__n") > 0)
    )
    cand = None
    for b in range(bands):
        m = plane_matrix(AUTO_MAX_PLANES, dim, seed=b)
        bk = lsh_bucket_auto(
            df, vec_col, dim=dim, matrix=m, target_bucket_rows=target_bucket_rows
        ).select(F.col(id_col), F.col("lsh_bucket"))
        pairs_b = (
            bk.alias("q")
            .join(bk.alias("c"), on="lsh_bucket")
            .filter(F.col(f"q.{id_col}") != F.col(f"c.{id_col}"))
            .select(
                F.col(f"q.{id_col}").alias("query_id"),
                F.col(f"c.{id_col}").alias("cand_id"),
            )
        )
        cand = pairs_b if cand is None else cand.unionByName(pairs_b)
    cand = cand.distinct()
    qv = base.select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__n").alias("__qn"),
    )
    cv = base.select(
        F.col(id_col).alias("cand_id"),
        F.col("__v").alias("__cv"),
        F.col("__n").alias("__cn"),
    )
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "cand_id")
        .select(
            "query_id",
            F.col("cand_id").alias(id_col),
            (dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))).alias(
                "cos_sim"
            ),
        )
    )
    knn = _salted_topk(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col(id_col).asc()],
        k,
        id_col=id_col,
        rank_col="rank",
    ).persist()
    a = knn.select(
        F.col("query_id").alias("id_a"),
        F.col(id_col).alias("id_b"),
        F.col("cos_sim").alias("__cos"),
        F.col("rank").alias("rank_ab"),
    )
    b_side = knn.select(
        F.col("query_id").alias("__qb"),
        F.col(id_col).alias("__vb"),
        F.col("rank").alias("rank_ba"),
    )
    out = a.join(
        b_side, (F.col("__qb") == F.col("id_b")) & (F.col("__vb") == F.col("id_a"))
    ).filter(F.col("id_a") < F.col("id_b"))
    return out.select(
        "id_a",
        "id_b",
        F.round("__cos", 6).alias("cos_sim"),
        F.col("rank_ab").cast("int").alias("rank_ab"),
        F.col("rank_ba").cast("int").alias("rank_ba"),
    )


def mutual_knn_pairs(
    df: DataFrame,
    k: int = 4,
    planes: int | str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    matrix: list[list[int]] | None = None,
    dim: int | None = None,
    target_bucket_rows: int = AUTO_TARGET_BUCKET_ROWS,
) -> DataFrame:
    """Mutual k-nearest-neighbor pairs — edges (a, b) where b is in
    a's top-k AND a is in b's top-k (within the shared LSH bucket
    structure). The reciprocal constraint is the classic
    high-precision near-dup / alignment signal: one-directional kNN
    hits are often hubness artifacts (a popular vector appears in
    everyone's top-k); mutuality kills them without any threshold.

    Plan: q103's batch-ANN machinery with EVERY vector as its own
    query (corpus-proportional ⇒ the bucket join shuffles both sides,
    broadcast_queries=False — the documented q103 rule), then one
    equi-self-join of the n·k kNN edge list on the reversed
    (query, neighbor) key pair. The kNN table is k rows per vector —
    the join is edge-list-sized, never corpus².

    ``planes`` defaults to "auto" (r7-verdict lead item): the plane
    count is derived from the corpus size inside the plan
    (``lsh_bucket_auto``), pinning bucket occupancy — and therefore
    the candidate-scoring volume — at ~``target_bucket_rows`` per
    bucket instead of the n²/2^planes a fixed dial costs. Pass an
    int only for bounded corpora / fixture replay. Pass ``dim`` to
    skip the one-row dim sniff (a plan-construction-time job).

    Returns (id_a, id_b, cos_sim, rank_ab, rank_ba) for id_a < id_b.
    """
    if dim is None:
        first = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if first is None:
            # degenerate corpus: empty result with the output schema
            # (the oracle's joins over an empty table are empty too —
            # compare, don't crash)
            return df.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cos_sim double, rank_ab int, rank_ba int"
            )
        dim = len(first[0])
    # Spread before bucketing so the max_planes LSH bits — and the
    # downstream bucket join batch_ann_topk builds from `buckets` —
    # start from a parallel input (guarded no-op at real scale).
    df = spread_small_input(df)
    if planes == "auto":
        buckets = lsh_bucket_auto(
            df, vec_col, dim=dim, matrix=matrix,
            target_bucket_rows=target_bucket_rows,
        )
    else:
        m = matrix if matrix is not None else plane_matrix(planes, dim)
        buckets = lsh_bucket(df, planes=planes, dim=dim, matrix=m)
    queries = buckets.select(
        F.col(id_col).alias("query_id"), F.col(vec_col), F.col("lsh_bucket")
    )
    knn = batch_ann_topk(
        buckets, queries, k=k, id_col=id_col, vec_col=vec_col,
        broadcast_queries=False, spread=False,
    ).persist()
    a = knn.select(
        F.col("query_id").alias("id_a"),
        F.col(id_col).alias("id_b"),
        F.col("cos_sim").alias("__cos"),
        F.col("rank").alias("rank_ab"),
    )
    b = knn.select(
        F.col("query_id").alias("__qb"),
        F.col(id_col).alias("__vb"),
        F.col("rank").alias("rank_ba"),
    )
    out = a.join(
        b, (F.col("__qb") == F.col("id_b")) & (F.col("__vb") == F.col("id_a"))
    ).filter(F.col("id_a") < F.col("id_b"))
    return out.select(
        "id_a",
        "id_b",
        F.round("__cos", 6).alias("cos_sim"),
        F.col("rank_ab").cast("int").alias("rank_ab"),
        F.col("rank_ba").cast("int").alias("rank_ba"),
    )


def semantic_decontamination(
    df: DataFrame,
    eval_mod: int = 199,
    threshold: float = 0.30,
    max_eval: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-space eval-set decontamination: the semantic
    counterpart of the n-gram decontamination scan (operators.curation
    .decontaminate) — paraphrased benchmark leakage survives n-gram
    overlap but not embedding cosine. Every corpus vector is scored by
    its MAX cosine against the held-out eval set; vectors at or above
    ``threshold`` (on the 6dp-rounded value, the q143/q156 convention
    that keeps the comparison identical across engines) are flagged,
    and the output is the per-label contamination funnel.

    The eval set here is the deterministic id slice ``id % eval_mod ==
    0`` CAPPED to the fixed id range ``id < eval_mod · max_eval`` (≤
    ``max_eval`` ids by construction — an id-range filter, not a
    LIMIT, so membership stays deterministic even under duplicate
    ids), standing in for a REAL benchmark table. The scale contract
    is that eval sets are fixed-size artifacts (a benchmark does not
    grow with the corpus): the eval side is an absolutely-bounded
    broadcast and the corpus streams through one map-side scan —
    |corpus| × ≤max_eval dot products, linear in the corpus, no
    shuffle until the |labels|-row final aggregate. (The BNLJ lint
    cannot see a filter-shaped bound, so q168 carries an allowlist
    entry with this justification.) A corpus-proportional "eval"
    input would need the LSH-bucketed candidate path (batch_ann_topk)
    instead.
    """
    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.col(label_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    base = base.withColumn("__n", l2_norm(F.col("__v"))).filter(F.col("__n") > 0)
    ev = base.filter(
        (F.col(id_col) % eval_mod == 0) & (F.col(id_col) < eval_mod * max_eval)
    ).select(F.col("__v").alias("__ev"), F.col("__n").alias("__en"))
    corpus = base.filter(
        ~((F.col(id_col) % eval_mod == 0) & (F.col(id_col) < eval_mod * max_eval))
    )
    scored = (
        corpus.join(F.broadcast(ev))
        .select(
            id_col,
            label_col,
            (dot(F.col("__v"), F.col("__ev")) / (F.col("__n") * F.col("__en"))).alias(
                "__cos"
            ),
        )
        .groupBy(id_col, label_col)
        .agg(F.round(F.max("__cos"), 6).alias("__max_cos"))
    )
    return (
        scored.groupBy(label_col)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum((F.col("__max_cos") >= threshold).cast("bigint")).alias(
                "n_contaminated"
            ),
            F.round(
                F.sum((F.col("__max_cos") >= threshold).cast("bigint"))
                / F.count(F.lit(1)),
                6,
            ).alias("contamination_frac"),
            F.round(F.max("__max_cos"), 6).alias("max_cos"),
        )
    )


# ---------------------------------------------------------------------------
# kNN label-consistency retrieval metrics (nDCG / MRR / P@k / recall@k)

# Rank discounts 1/log2(rank+1) precomputed driver-side to 12 decimals
# and shipped as LITERALS to both engines: Spark's log2 (java.lang.Math)
# and DuckDB's (libm) are each within 1 ulp but not guaranteed to agree,
# and the DCG sum must be exact decimal addition to stay
# order-independent. IDCG prefixes are exact Decimal sums of the same
# rounded terms, so ndcg = dcg/idcg replays bit-identically.
KNN_METRICS_K = 10
KNN_METRICS_EVERY = 25
# Hard benchmark-size bound: queries = ids that are ≡0 mod EVERY AND
# below EVERY·MAX_QUERIES — an id-RANGE filter, so the broadcast side
# is ≤ MAX_QUERIES rows BY CONSTRUCTION at any corpus size (the q168
# decontamination-slice convention; a bare modulus filter would grow
# the "benchmark" with the corpus and quietly turn the scored join
# quadratic).
KNN_METRICS_MAX_QUERIES = 512


def _dcg_tables(k: int) -> tuple[list[str], list[str]]:
    import math
    from decimal import Decimal

    disc = [f"{1.0 / math.log2(r + 1):.12f}" for r in range(1, k + 1)]
    pref, acc = [], Decimal(0)
    for d in disc:
        acc += Decimal(d)
        pref.append(str(acc))
    return disc, pref


def knn_label_metrics(
    df: DataFrame,
    k: int = KNN_METRICS_K,
    every: int = KNN_METRICS_EVERY,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-space retrieval quality scored as an IR benchmark:
    every ``every``-th vector is a query, exact cosine ranking over the
    rest of the corpus is the system under test, and a corpus document
    is RELEVANT to a query iff it carries the query's label — the
    standard kNN label-consistency probe (is same-class structure
    actually recoverable by nearest-neighbor search?). Per query:
    nDCG@k (binary gains, literal decimal discounts — see _dcg_tables),
    MRR@k, precision@k, recall@k (relevant base = all same-label
    corpus rows, excluding the query itself). Output: one row per
    label with n_queries and the four metric means.

    Scale shape: the query set is a bounded eval benchmark, so it
    broadcasts and the corpus streams ONCE through the scored join;
    the per-query cut is the salted two-phase top-k (never a
    corpus-sized window partition); everything after ranks is
    (|Q|·k)-bounded. Zero-magnitude vectors can be neither queries nor
    neighbors (cosine undefined → NULL → dropped), mirrored by the
    oracle's norm>0 guards."""
    disc, pref = _dcg_tables(k)
    # Spread the corpus before the scored join (a single-split scan
    # would run all |corpus|·|Q| scorings on one core; guarded no-op
    # at real scale), and compute each side's norm ONCE instead of
    # per pair: cosine(a,b) re-derives l2(a) and l2(b) inside every
    # pair — hoisting them is 3x less higher-order-function work and
    # bit-identical (same expressions over the same rows, the
    # NULL-on-zero-denominator guard preserved below).
    base = spread_small_input(df).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.col(label_col).alias("__label"),
    ).withColumn("__n", l2_norm(F.col("__v")))
    label_totals = base.groupBy("__label").agg(F.count(F.lit(1)).alias("__label_n"))
    queries = base.filter(
        (F.col("__id") % every == 0)
        & (F.col("__id") < every * KNN_METRICS_MAX_QUERIES)
    ).select(
        F.col("__id").alias("__qid"),
        F.col("__v").alias("__qv"),
        F.col("__label").alias("__qlabel"),
        F.col("__n").alias("__qn"),
    )
    denom = F.col("__n") * F.col("__qn")
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("__id") != F.col("__qid"))
        .select(
            "__qid",
            "__qlabel",
            "__id",
            "__label",
            F.when(denom != 0, dot(F.col("__v"), F.col("__qv")) / denom).alias(
                "__cos"
            ),
        )
        .filter(F.col("__cos").isNotNull())
    )
    ranked = _salted_topk(
        scored,
        ["__qid"],
        [F.desc("__cos"), F.asc("__id")],
        k,
        "__id",
        rank_col="__rank",
    )
    rel = F.col("__label") == F.col("__qlabel")
    disc_expr = F.element_at(
        F.array(*[F.lit(d).cast("decimal(14,12)") for d in disc]), F.col("__rank")
    )
    per_q = ranked.groupBy("__qid", "__qlabel").agg(
        F.sum(rel.cast("bigint")).alias("__rel_k"),
        F.min(F.when(rel, F.col("__rank"))).alias("__first_rel"),
        F.sum(F.when(rel, disc_expr).otherwise(F.lit(0).cast("decimal(14,12)")))
        .alias("__dcg"),
    )
    idcg_expr = F.element_at(
        F.array(*[F.lit(p).cast("decimal(16,12)") for p in pref]),
        F.least(F.col("__total_rel"), F.lit(k)).cast("int"),
    )
    metrics = (
        per_q.join(
            F.broadcast(label_totals),
            per_q["__qlabel"] == label_totals["__label"],
        )
        .withColumn("__total_rel", F.col("__label_n") - 1)
        .select(
            "__qid",
            "__qlabel",
            F.when(
                F.col("__total_rel") > 0,
                F.col("__dcg").cast("double")
                / idcg_expr.cast("double"),
            )
            .otherwise(0.0)
            .alias("__ndcg"),
            F.when(
                F.col("__first_rel").isNotNull(),
                F.lit(1.0) / F.col("__first_rel"),
            )
            .otherwise(0.0)
            .alias("__mrr"),
            (F.col("__rel_k").cast("double") / F.lit(float(k))).alias("__p"),
            F.when(
                F.col("__total_rel") > 0,
                F.col("__rel_k").cast("double") / F.col("__total_rel"),
            )
            .otherwise(0.0)
            .alias("__recall"),
        )
    )
    from ..functions import portable_round

    def _mean(col: str) -> Column:
        # per-query metric -> exact 12dp decimal -> order-independent sum
        return portable_round(
            F.sum(portable_round(F.col(col), 12).cast("decimal(20,12)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        )

    return (
        metrics.groupBy(F.col("__qlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            _mean("__ndcg").alias("mean_ndcg"),
            _mean("__mrr").alias("mean_mrr"),
            _mean("__p").alias("mean_precision"),
            _mean("__recall").alias("mean_recall"),
        )
    )
