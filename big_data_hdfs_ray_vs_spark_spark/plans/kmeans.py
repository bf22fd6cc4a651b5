"""K-means: MLlib wrapper with the reference's exact configuration
(kmeans_spark.py:97-150): VectorAssembler(handleInvalid="skip") over the
8 text features, KMeans(k, maxIter=20, seed=42, initMode="k-means||",
tol=1e-4). The Lloyd loop runs inside MLlib's JVM fit — nothing to
hand-roll (SURVEY §3.3).

``lloyd_kmeans`` is the deterministic DataFrame-native twin: first-k-
by-id init, centroids broadcast as literal arrays (k·dim doubles —
nothing to ship), assignment as a codegen argmin expression, ONE
shuffle per iteration (the centroid-mean recompute). Same physical
shape as MLlib's Lloyd step, but every iteration is exactly replayable
in plain SQL — the q15/q30 oracles unroll the identical recurrence.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    out_col: str = "cluster",
) -> DataFrame:
    """Map-only nearest-centroid assignment: squared-euclidean argmin,
    ties to the lowest cluster index. Centroids travel as DATA (a
    broadcast 1-row matrix), not literal expressions: the plan — and
    its generated code — is byte-identical across calls and across k,
    so Spark compiles the k·dim distance argmin ONCE (unrolled-literal
    plans paid ~10 s of codegen at k=8, dim=64). Zero shuffles."""
    spark = df.sparkSession
    cm = spark.createDataFrame([(centroids,)], "__cm array<array<double>>")
    dists = F.transform(
        F.col("__cm"),
        lambda cen: F.aggregate(
            F.zip_with(F.col(vec_col), cen, lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    # array_position ties to the FIRST minimum — lowest cluster index,
    # matching the SQL oracle's tie rule.
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return (
        df.crossJoin(F.broadcast(cm))
        .withColumn(out_col, cluster)
        .drop("__cm")
    )


# The q30 IVF quantizer contract, shared by the Spark query
# (queries.q30_ivf_ann) and its DuckDB oracle (oracles._ivf_ann_sql).
# Both sides MUST train on the same bounded sample with the same k and
# iteration count — tuning one without the other makes fit and replay
# silently train on different row sets and fail the gate with an opaque
# value mismatch, so the numbers live here exactly once.
IVF_QUANTIZER = {"k": 8, "iters": 3, "sample_n": 4096}


def lloyd_kmeans_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    sample_n: int = 4096,
) -> list[list[float]]:
    """FAISS-style coarse-quantizer training: run Lloyd's driver-side
    (numpy) over a bounded, deterministic sample — the ``sample_n``
    rows with the smallest ids. Returns the centroid list.

    This is the scale path for quantizer FIT: a k=8..1024 coarse
    quantizer never needs the full corpus (FAISS trains IVF quantizers
    on a capped sample on one node); collecting ``sample_n``·dim
    doubles is O(1) in the corpus size, and it replaces ``iters``
    driver-synced distributed jobs with ONE bounded collect. Assignment
    of the full corpus stays distributed (``assign_clusters``).

    The recurrence is bit-compatible with ``lloyd_kmeans``: first-k-
    by-id init, squared-euclidean argmin with ties to the lowest
    cluster index, element-wise float64 means, empty clusters keep
    their previous centroid — so a SQL oracle can replay fit + probe
    end-to-end by limiting its training CTE to the same sample.

    Caveat on "bit-compatible": the numpy distance reduction sums
    float64 terms in a different association order than a SQL engine's
    sequential accumulation, so an assignment whose two nearest
    centroids tie within an ulp could in principle flip between
    engines. With continuous-valued embeddings such exact ties have
    measure zero (the equivalence test pins agreement at atol=1e-9 on
    every tier shipped); integer-valued or duplicated vectors would be
    the shapes to re-verify."""
    import numpy as np

    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
        .orderBy(id_col)
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError("lloyd_kmeans_sample: input has no rows")
    pts = np.array([r["__v"] for r in rows], dtype=np.float64)
    return lloyd_numpy(pts, k, iters)


def lloyd_numpy(pts, k: int, iters: int) -> list[list[float]]:
    """The driver-side Lloyd recurrence on an (n, dim) float64 array —
    shared by lloyd_kmeans_sample (full vectors) and the PQ trainer
    (per-subspace slices of ONE shared sample). Same contract as
    lloyd_kmeans: first-k-by-order init, squared-euclidean argmin with
    ties to the lowest index, element-wise means, empty clusters keep
    their previous centroid."""
    k = min(k, len(pts))
    cens = pts[:k].copy()
    for _ in range(iters):
        # (n, k) squared distances; argmin ties to the first (lowest) index.
        d2 = ((pts[:, None, :] - cens[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = pts[assign == j]
            if len(members):
                # sum/len, not np.mean's pairwise path — matches the
                # plain accumulation the SQL oracle's avg() performs.
                cens[j] = members.sum(axis=0) / len(members)
    return [[float(x) for x in c] for c in cens]


def lloyd_kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    iters: int = 4,
) -> tuple[list[list[float]], DataFrame]:
    """Deterministic Lloyd's over an array column.

    Init: the k rows with smallest id. Each iteration assigns points to
    the nearest centroid (squared-euclidean argmin, ties to the lowest
    cluster index) and recomputes centroids as element-wise means;
    empty clusters keep their previous centroid. Returns the FINAL
    centroids and the assignment under them (MLlib transform
    semantics). Centroid collect is k·dim floats per iteration —
    driver traffic is O(1) in the data size."""
    pts = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).persist()
    init = pts.orderBy(id_col).limit(k).collect()
    if not init:
        pts.unpersist()
        raise ValueError("lloyd_kmeans: input has no rows")
    # Fewer rows than k (a small blocking group through the IVF path):
    # degrade to k_eff = n rows instead of indexing past the init list.
    k = min(k, len(init))
    centroids = [[float(x) for x in r["__v"]] for r in init]
    dim = len(centroids[0])

    def assigned_df(cens: list[list[float]]) -> DataFrame:
        # Shared broadcast-matrix argmin (see assign_clusters for the
        # codegen rationale). Assignment is map-only: zero shuffles.
        return assign_clusters(pts, cens, "__v")

    for _ in range(iters):
        rows = (
            assigned_df(centroids)
            .groupBy("cluster")
            .agg(*[F.avg(F.element_at("__v", d + 1)).alias(f"c{d}") for d in range(dim)])
            .collect()
        )
        new = {r["cluster"]: [float(r[f"c{d}"]) for d in range(dim)] for r in rows}
        centroids = [new.get(j, centroids[j]) for j in range(k)]

    # Materialize the final assignment BEFORE dropping the point cache:
    # the return value is lazy, so unpersisting first would make every
    # downstream consumer re-derive pts (and the k·dim distance
    # expression) from the raw input. The assignment is (id, cluster) —
    # cheap to hold; callers unpersist when done.
    final = assigned_df(centroids).select(id_col, "cluster").persist()
    final.count()
    pts.unpersist()
    return centroids, final


def assemble_features(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Numeric columns → MLlib vector column, skipping rows with
    null/NaN in any feature — VectorAssembler(handleInvalid="skip")
    semantics (kmeans_spark.py:104-110), expressed as a codegen filter
    + array_to_vector. The expression path skips VectorAssembler's
    generic row-encoder UDT serialization, which is ~25% of the whole
    k-means fit at the 4M-row tier (41 s → 30 s); the row stream is
    identical, so the seeded k-means|| trajectory (and centroids) are
    bit-for-bit unchanged."""
    keep = None
    for c in feature_cols:
        ok = F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
        keep = ok if keep is None else (keep & ok)
    vec = array_to_vector(
        F.array(*[F.col(c).cast("double") for c in feature_cols])
    ).alias("features")
    return df.filter(keep).select("*", vec)


def kmeans_fit(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 3,
    max_iter: int = 20,
    tol: float = 1e-4,
    seed: int = 42,
):
    """Returns (centroids: list[list[float]], assignments_df, model).

    assignments_df carries a `cluster` int column (model.transform
    renamed, kmeans_spark.py:153-165)."""
    # Hand MLlib an UNPERSISTED slim projection on purpose: fit()
    # checks dataset.storageLevel and, when NONE, caches the converted
    # RDD[instance] itself — so every k-means||/Lloyd pass runs over
    # in-memory JVM vectors. Persisting here would make MLlib skip that
    # internal cache and pay DataFrame-cache → Vector deserialization
    # on EVERY pass (~3× slower fit measured at the 4M-row tier:
    # 114 s → 36 s). transform() below re-assembles from the source —
    # one cheap codegen pass, not an iterated cost.
    assembled = assemble_features(df, feature_cols).select("features")
    km = (
        KMeans()
        .setK(k)
        .setMaxIter(max_iter)
        .setTol(tol)
        .setSeed(seed)
        .setInitMode("k-means||")
        .setFeaturesCol("features")
        .setPredictionCol("cluster")
    )
    model = km.fit(assembled)
    assignments = model.transform(assembled)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return centroids, assignments, model


def cluster_histogram(assignments: DataFrame) -> DataFrame:
    """groupBy(cluster).count() ordered by cluster (kmeans_spark.py:162)."""
    return (
        assignments.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("cluster")
    )
