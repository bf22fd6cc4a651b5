"""The engine's query registry — one entry per operator family from
SURVEY §2 plus the LLM-data extensions, each expressed over the driver's
testdata tables (TESTDATA.md) so the DuckDB oracle can replay it.

Conventions (driver correctness gate):
- every computed column is aliased identically here and in oracles.py;
- floats are rounded at the output boundary (round travels with the
  query, so Spark↔DuckDB double noise can't flip the value hash);
- every query is a single declarative plan (no driver-side loops except
  the documented iterative algorithms).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import functions as fx
from .functions import count_if, bucketize
from .operators import dedup, sampling, similarity, text
from .plans import graph as graph_plans
from .plans.kmeans import cluster_histogram, lloyd_kmeans
from .sources import load_table

# --------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _emb_dim(sf_dir: str) -> int:
    """Embedding dimensionality from the parquet FILE, not a Spark
    job: plan-construction-time ``.first()`` sniffs serialized
    registry startup behind a dozen one-row jobs (r7-verdict item 7).
    pyarrow streams minimal batches until the first non-null vector —
    footer + one small batch, no JVM work. Falls back to 64 (the
    testdata contract, also hardcoded in every embedding oracle) when
    the file has no non-null vector: every downstream op is vacuous
    on an empty guarded corpus, so the dim only shapes an unused
    literal matrix."""
    key = os.path.join(sf_dir, "embeddings.parquet")
    if key in _EMB_DIM_CACHE:
        return _EMB_DIM_CACHE[key]
    dim = 64
    try:
        import pyarrow.parquet as pq

        f = pq.ParquetFile(key)
        for batch in f.iter_batches(batch_size=64, columns=["embedding"]):
            col = batch.column(0)
            done = False
            for i in range(len(col)):
                v = col[i].as_py()
                if v is not None:
                    dim = len(v)
                    done = True
                    break
            if done:
                break
    except Exception:
        pass  # unreadable/odd layout: the 64 fallback keeps plans buildable
    _EMB_DIM_CACHE[key] = dim
    return dim


_EMB_DIM_CACHE: dict[str, int] = {}


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings table. The null-vector guard (a NULL embedding is
    not a vector) lives in sources/registry.load_table — the actual
    load boundary, so register_views/spark.sql consumers get it too;
    every embedding oracle carries the matching
    `embedding IS NOT NULL` filter."""
    return _t(spark, sf_dir, "embeddings")


def graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graph view used by PageRank/triangles: part→supplier links
    from lineitem (raw stream: duplicates and key-overlap cycles are
    semantically significant, SURVEY §2.8)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"))


# --------------------------------------------------------------------------
# relational / ETL surface (SURVEY §2.1-§2.7)


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped scan→filter→hash-aggregate: the engine spine.
    Filter + 7-column projection push down to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit("2025-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q02_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join chain orders⋈customer⋈nation⋈region with the
    dimension sides broadcast — no shuffle of the fact table."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dims = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q03_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject (per-partition heaps, no
    global sort). Total order via the unique key tie-break."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price"))
    )


def q04_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one-pass quality aggregate shape
    (etl_spark.py:121-129): plain + conditional aggregates in a single
    hash-aggregate over one scan. The global average goes through an
    exact decimal sum + portable_round: the divisor is the exact table
    row count (10^k in the driver testdata), which makes 4-decimal
    midpoints reachable, where round() splits engines (see
    functions.portable_round)."""
    ev = _t(spark, sf_dir, "events")
    sum_dec = F.sum(F.col("value").cast("decimal(18,6)"))
    return ev.agg(
        F.count(F.lit(1)).alias("total_rows"),
        count_if(F.col("props").isNull()).alias("null_props"),
        count_if(F.col("value") < 0).alias("negative_value"),
        count_if(F.col("event_type") == "error").alias("n_error"),
        fx.portable_round(sum_dec.cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_value"
        ),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.min("value"), 4).alias("min_value"),
    )


VALUE_CUTS = [(10.0, "low"), (100.0, "mid")]


def q05_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-WHEN bucketing + 1-key grouped agg (etl_spark.py:143-168
    shape, strict-< boundaries)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("value_bucket", bucketize(F.col("value"), VALUE_CUTS, "high"))
        .groupBy("value_bucket")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


def q06_group_2keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-key grouped aggregation (etl_spark.py:179-183 shape)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("value_bucket", bucketize(F.col("value"), VALUE_CUTS, "high"))
        .groupBy("event_type", "value_bucket")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.avg("user_id"), 4).alias("avg_user"),
        )
    )


def q07_cleansing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound range-filter cleansing (etl_spark.py:194-202): rows
    surviving vs removed, one conditional-agg pass."""
    ev = _t(spark, sf_dir, "events")
    kept = (
        F.col("value").between(0, 500)
        & F.col("props").isNotNull()
        & (F.col("user_id") >= 0)
    )
    return ev.agg(
        F.count(F.lit(1)).alias("total_rows"),
        count_if(kept).alias("kept_rows"),
        (F.count(F.lit(1)) - count_if(kept)).alias("removed_rows"),
        F.round(F.avg(F.when(kept, F.col("value"))), 4).alias("kept_avg_value"),
    )


def q08_composite_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived arithmetic score columns + final-metrics global aggregate
    (etl_spark.py:207-224 shape) on lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    scored = li.select(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) / 100, 3).alias(
            "revenue_score"
        ),
        F.round(F.col("l_quantity") * (1 + F.col("l_tax")) / 10, 3).alias("volume_score"),
        F.round((1 - F.col("l_discount")) * F.col("l_quantity"), 3).alias("net_qty_score"),
    )
    return scored.agg(
        F.count(F.lit(1)).alias("final_count"),
        F.round(F.avg("revenue_score"), 4).alias("avg_revenue_score"),
        F.round(F.avg("volume_score"), 4).alias("avg_volume_score"),
        F.round(F.avg("net_qty_score"), 4).alias("avg_net_qty_score"),
        F.round(F.max("revenue_score"), 3).alias("max_revenue_score"),
        F.round(F.max("volume_score"), 3).alias("max_volume_score"),
        F.round(F.max("net_qty_score"), 3).alias("max_net_qty_score"),
    )


def q09_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + distinct node-set build (pagerank_spark.py:94-96 shape)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nodes = (
        orders.select(F.col("o_custkey").alias("node"))
        .union(customer.select(F.col("c_custkey").alias("node")))
        .distinct()
    )
    return nodes.agg(F.count(F.lit(1)).alias("n_nodes"))


def q10_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top order per customer (SURVEY §2.5 — windows are
    part of our surface even though the reference only advertised them)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("best_price"))
    )


def q11_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: per-user running sum over event time."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


# --------------------------------------------------------------------------
# graph surface (SURVEY §2.8)


def q12_out_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, _nodes, out_degrees = graph_plans.build_graph(graph_edges(spark, sf_dir))
    return out_degrees.select(F.col("src").alias("node"), "out_degree")


def q13_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 fixed power iterations (the oracle replays the same unrolled
    recurrence in SQL; the convergence probe is covered by fixture
    tests, not the oracle)."""
    scores, _iters = graph_plans.pagerank(
        graph_edges(spark, sf_dir), damping=0.85, max_iter=3, tol=None
    )
    return scores.select("node", F.round("score", 8).alias("score"))


def q14_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph_plans.triangle_count_adj_df(graph_edges(spark, sf_dir))


# --------------------------------------------------------------------------
# ML surface (SURVEY §2.8 K-means; MLlib loop → rows-only check)




def q15_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DataFrame-native Lloyd's (first-k-by-id init, 4
    unrolled iterations) over the first 8 embedding dims → cluster
    histogram. The DuckDB oracle replays the identical recurrence, so
    the iterative ML loop gets a full value-hash check; the MLlib
    k-means|| path (reference parity) is exercised by
    tests/test_kmeans_fixture.py."""
    emb = _emb(spark, sf_dir)
    feats = emb.select("vec_id", F.slice("embedding", 1, 8).alias("v"))
    _centroids, assignments = lloyd_kmeans(feats, "vec_id", "v", k=3, iters=4)
    return cluster_histogram(assignments)


# --------------------------------------------------------------------------
# LLM-data surface: dedup / similarity / text (BASELINE.json north star)


def q16_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_stats(_t(spark, sf_dir, "documents"))


def q17_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bands = dedup.minhash_bands(docs, num_hashes=12, rows_per_band=2)
    return dedup.minhash_candidate_pairs(bands)


def q18_jaccard_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard on a deterministic pair set (doc i vs i+1) —
    exercises the shingle/intersect machinery linearly."""
    docs = _t(spark, sf_dir, "documents")
    pairs = docs.select(F.col("doc_id").alias("id_a")).join(
        docs.select(F.col("doc_id").alias("id_b")),
        on=[F.col("id_b") == F.col("id_a") + 1],
    )
    j = dedup.ngram_jaccard_pairs(docs, pairs)
    return j.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q19_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding")
    q = [float(x) for x in qvec.first()["embedding"]]  # cosine_topk builds the literal
    out = similarity.cosine_topk(emb.filter(F.col("vec_id") != 0), q, k=10)
    return out.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


def q20_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus quality rollup. Averages derive from exact
    sums + portable_round: per-source doc counts in the testdata are
    2^a·5^b (100, 1000), so avg quotients can land exactly on decimal
    midpoints where round() splits engines (functions.portable_round)."""
    docs = text.quality_features(_t(spark, sf_dir, "documents"))
    n = F.count(F.lit(1))
    return docs.groupBy("source").agg(
        n.alias("n_docs"),
        fx.portable_round(F.sum("n_tokens") / n, 4).alias("avg_tokens"),
        fx.portable_round(
            F.sum(F.col("stopword_ratio").cast("decimal(18,6)")).cast("double") / n, 6
        ).alias("avg_stopword_ratio"),
        fx.portable_round(
            F.sum(F.col("quality_score").cast("decimal(18,6)")).cast("double") / n, 6
        ).alias("avg_quality"),
    )


def q21_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = text.lang_id_heuristic(_t(spark, sf_dir, "documents"))
    return docs.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("count"))


def q22_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = text.token_counts(_t(spark, sf_dir, "documents"))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_pieces").alias("total_pieces"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


def q23_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = text.fingerprint(_t(spark, sf_dir, "documents"))
    return docs.groupBy("source").agg(
        F.countDistinct("fingerprint").alias("n_fingerprints"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q24_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs. The registry entry hashes tokens with the
    portable md5-derived 60-bit hash so the DuckDB oracle can replay the
    full vote→band→hamming pipeline bit-for-bit; production callers keep
    the default (faster) xxhash64, which the pure-Python pytest oracle
    covers."""
    docs = _t(spark, sf_dir, "documents")
    sims = dedup.simhash64(docs, token_hash=dedup.md5_hash60)
    return dedup.simhash_near_pairs(sims, max_hamming=6)


def q25_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization rollup (streaming/sessions.py batch twin)."""
    from .streaming.sessions import session_stats

    return session_stats(_t(spark, sf_dir, "events"))


def q26_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate — the batch twin of
    streaming/windows.py:windowed_event_stats (same groupBy(window)
    plan minus the watermark). One shuffle on (window, event_type).

    Cross-engine determinism (caught at sf0.1): sums go through
    DECIMAL(18,6) (order-independent addition), and the average is
    portable_round over the exact-sum quotient instead of round().
    Two-decimal sums over counts like 24/32 land EXACTLY on 4-decimal
    midpoints (1512.12/32 = 47.25375), where Spark rounds the shortest
    decimal string (HALF_UP → …38) but DuckDB rounds the binary double
    (→ …37); see functions.portable_round."""
    ev = _t(spark, sf_dir, "events")
    sum_dec = F.sum(F.col("value").cast("decimal(18,6)"))
    quot = sum_dec.cast("double") / F.count(F.lit(1))
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(sum_dec.cast("double"), 4).alias("sum_value"),
            fx.portable_round(quot, 4).alias("avg_value"),
        )
        .select(
            (fx.epoch_us(F.col("w.start")) / F.lit(1_000_000))
            .cast("long")
            .alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def q27_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label: the all-pairs
    join is confined to each label's bucket, so cost is Σ|bucket|², not
    |N|² — the same blocked shape an LSH-bucket key gives at scale.

    Scale knob — BUCKET SIZE. The scale probe measures ~3.5× time on
    10× rows (SCALING.md): Σ|bucket|² grows quadratically in mean
    bucket occupancy, so the knob is the blocking key's selectivity,
    not the code. With b buckets over n rows, work ≈ n²/b; this entry
    blocks on `label` (10 buckets — fine at 2k vectors, a scale-killer
    at 2B). At corpus scale swap the key for a sign-LSH bucket
    (similarity.lsh_bucket, planes p → 2^p buckets): each +1 plane
    halves expected occupancy and so quarters the pairwise work, at
    the cost of missing pairs whose cosine puts them across a
    hyperplane (recall loss ~ (angle/π)·p per pair; compensate with
    band-OR over r independent plane sets as in minhash banding)."""
    emb = _emb(spark, sf_dir)
    pairs = similarity.pairwise_cosine_within(
        emb, "label", id_col="vec_id", threshold=0.35
    )
    return pairs.select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))


def q28_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: sign-LSH bucketing (4 hyperplanes → 16 buckets at this SF, so the probe bucket holds a real candidate set),
    then brute-force cosine only inside the query's bucket. The registry
    entry uses the literal ±1 plane matrix (plane_matrix — pure-Python
    md5, engine-independent), so the DuckDB oracle replays bucket
    assignment AND the in-bucket top-k exactly; the xxhash64 plane
    default is covered by tests/test_similarity.py."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    m = similarity.plane_matrix(4, len(qvec))
    buckets = similarity.lsh_bucket(emb, planes=4, dim=len(qvec), matrix=m)
    out = similarity.lsh_topk(buckets, qvec, k=10, planes=4, matrix=m)
    return out.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


def q29_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payload + typed metadata →
    Arrow-batched mapInPandas decode (deterministic stub kernel) →
    per-image feature rows. The registry output projects the raw
    `feat array<float>` to hashable scalars (the driver's canonicalizer
    sorts rows via pandas, which can't hash lists) and carries no sort —
    the oracle compare is order-insensitive, so a global sort at the end
    would be a wasted exchange at scale. The deterministic stub kernel is
    fully replayable in SQL, so this has a real DuckDB oracle; raw-array
    checks live in tests/test_multimodal.py."""
    from .operators import multimodal

    media = multimodal.synthetic_media(spark, n=300, partitions=4)
    feats = multimodal.image_features(media)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round("mean_byte", 6).alias("mean_byte"),
        F.size("feat").alias("feat_dim"),
    )


def q30_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN scale path: coarse quantizer → probe the nprobe nearest
    inverted lists only. The quantizer is trained FAISS-style on a
    bounded deterministic sample driver-side (lloyd_kmeans_sample:
    first-4096-by-id, 3 Lloyd iterations, first-k init — one bounded
    collect instead of 3 driver-synced distributed jobs; a k=8 coarse
    quantizer never needs the full corpus). List assignment of the full
    corpus is the distributed map-only broadcast-argmin (no join), and
    the DuckDB oracle replays fit + assign + probe + in-list top-k
    end-to-end by limiting its training CTE to the same sample. The
    MLlib quantizer (ivf_index) keeps its recall test in
    tests/test_similarity.py."""
    from .plans.kmeans import IVF_QUANTIZER, assign_clusters, lloyd_kmeans_sample

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    centroids = lloyd_kmeans_sample(emb, "vec_id", "embedding", **IVF_QUANTIZER)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    indexed = assign_clusters(emb, centroids, "embedding", out_col="ivf_list")
    out = similarity.ivf_topk(indexed, centroids, qvec, k=10, nprobe=4)
    return out.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


def q31_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregate (returnflag → linestatus → grand
    total) — one shuffle; Spark expands grouping sets in the same hash
    aggregate, no extra pass per level."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_price",
        )
    )


def q32_quantized_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (capacity-quantized contiguous): one window
    cumsum per source stream — bin_id = floor(tokens_before/512)."""
    from .operators import packing

    return packing.quantized_packing(_t(spark, sf_dir, "documents"), capacity=512)


def q33_greedy_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact first-fit-contiguous packing via applyInPandas (sequential
    remainder recurrence — not window-expressible in Spark). The DuckDB
    oracle replays the same recurrence as a recursive CTE; the
    pure-Python packing oracle is tests/test_packing.py."""
    from .operators import packing

    bins = packing.greedy_packing(_t(spark, sf_dir, "documents"), capacity=512)
    return bins.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )


def q34_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running-stats anomaly flags — batch twin of the
    applyInPandasWithState streaming operator (streaming/stateful.py).
    The Welford prefix recurrence equals population mean/var of the
    prior events, so both this query and the DuckDB oracle express it
    as prefix window aggregates (pure codegen, no Python in the plan);
    stream ≡ Welford-batch ≡ prefix-window equivalence is pinned in
    tests/test_streaming.py."""
    from .streaming.stateful import anomaly_flags_prefix

    ev = _t(spark, sf_dir, "events")
    flags = anomaly_flags_prefix(ev, k=2.0, min_obs=5)
    return flags.select(
        "user_id", "event_id", F.round("value", 4).alias("value"), F.round("zscore", 4).alias("zscore")
    )


def q35_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join surface (SURVEY §2.3 note: semi/anti exposed even
    though the reference is equi-only): customers with no high-value
    (>400k) order, per nation. The pushed filter shrinks the build side
    before the anti join; only keys shuffle, the join never widens."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    none = cust.join(
        orders.filter(F.col("o_totalprice") > 400000).select(
            F.col("o_custkey").alias("c_custkey")
        ),
        on="c_custkey",
        how="left_anti",
    )
    return none.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
    )


def q36_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type (p50/p95). Exact
    percentile needs a per-group sort — fine as an occasional reporting
    query; approx_percentile (t-digest, one pass, mergeable) is the
    100 TB hot-path variant (not oracle-comparable across engines)."""
    ev = _t(spark, sf_dir, "events")
    # NaN mask: Spark's percentile ranks NaN as the LARGEST value while
    # other engines exclude it — and a NaN is not an observation.
    vv = F.when(~F.isnan(F.col("value")), F.col("value"))
    return ev.groupBy("event_type").agg(
        F.round(F.percentile(vv, F.lit(0.5)), 4).alias("p50_value"),
        F.round(F.percentile(vv, F.lit(0.95)), 4).alias("p95_value"),
        F.round(F.avg(vv), 4).alias("avg_value"),
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q37_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot events to one column per type (explicit value list, so the
    schema is static and no distinct-values pre-pass runs — required
    for a deterministic plan at scale). Equivalent to conditional
    aggregation; one shuffle on user_id."""
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum("value"), 4))
    )
    return out.select(
        "user_id", *[F.col(t).alias(f"sum_{t}") for t in EVENT_TYPES]
    )


Q39_FRACTIONS = {"en": 0.5, "de": 0.3, "fr": 0.3, "es": 0.2, "zh": 0.1}


def q38_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup endgame: shingle → MinHash-LSH candidates → exact
    Jaccard verification (≥ 0.5) → connected components → representative
    election. The full pipeline a 100 TB corpus dedup actually runs; the
    cluster step (operators.dedup.dup_clusters) touches only the pair
    graph, never the corpus. Oracle replays the closure with a recursive
    CTE."""
    docs = _t(spark, sf_dir, "documents")
    # One shingle pass feeds both the signature and verification stages.
    sets = dedup.shingle_sets(docs).persist()
    bands = dedup.minhash_bands(docs, sets=sets)
    cand = dedup.minhash_candidate_pairs(bands)
    verified = (
        dedup.ngram_jaccard_pairs(docs, cand, sets=sets)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    return dedup.dup_clusters(verified)


def q39_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language Bernoulli sample (hash-derived, layout-
    independent — operators.sampling). Output is the sampled membership
    itself, so the oracle verifies row-level reproducibility, not just
    rates."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.stratified_sample(docs, "lang", Q39_FRACTIONS).select(
        "doc_id", "lang", "source"
    )


def q40_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked token-budget curation: per source keep the best
    documents until an 800-token quota (operators.sampling.token_budget_
    curation) — the 'mix builder' step of a training-data pipeline."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.token_budget_curation(docs, group_col="source", budget_tokens=800)


Q42_WEIGHTS = {"en": 2.3, "de": 1.0, "fr": 0.5, "es": 1.5, "zh": 0.25}


def q41_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-sharded global training order (operators.sampling.
    deterministic_shuffle): one exchange + per-shard sorts, no
    single-reducer total sort. The oracle replays shard and in-shard
    rank with the same hash."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.deterministic_shuffle(docs, n_shards=16)


def q42_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static training-mix resampling: per-language epoch weights with
    deterministic fractional repeats (operators.sampling.mixture_weights
    — narrow explode, zero shuffles)."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.mixture_weights(docs, Q42_WEIGHTS, group_col="lang")


def q43_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.temporal.asof_join): each purchase event
    picks up the value of the user's latest click at-or-before it —
    one shuffle on user_id, a running last-non-null instead of a
    nested-loop inequality join. The event_id tiebreak makes the
    equal-timestamp pick deterministic, so the oracle (a correlated
    ORDER BY ... LIMIT 1 lookup — an independent formulation of the
    same semantics) replays it exactly."""
    from .operators import temporal

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.round("value", 4).alias("last_click_value"),
    )
    out = temporal.asof_join(
        purchases, clicks, on="user_id", ts="ts", tiebreak="click_event_id"
    )
    return out.select("event_id", "user_id", "purchase_value", "last_click_value")


def q44_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × point range join with no equi key (operators.temporal.
    range_join_bins): purchases falling inside the 10-minute window
    after each error event, via bin-quantized equi-join + exact refine
    — the scalable escape from BroadcastNestedLoopJoin. Inner-join
    semantics: only windows containing ≥1 purchase appear."""
    from .operators import temporal

    ten_min_us = 600_000_000
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        fx.epoch_us("ts").alias("start_us"),
        (fx.epoch_us("ts") + ten_min_us).alias("end_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        fx.epoch_us("ts").alias("ts_us"), "value"
    )
    joined = temporal.range_join_bins(
        errors, purchases, start="start_us", end="end_us", point_ts="ts_us", bin_width=ten_min_us
    )
    return joined.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 4).alias("sum_purchase_value"),
    )


def q45_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel over event time: users who signed up,
    then clicked strictly after their first signup, then purchased
    strictly after that first qualifying click. Two chained prefix
    windows over ONE (user_id, ts) sort — the running min of each
    stage's qualifying timestamp — then a per-user reduce; no
    self-joins of the event stream. At 100 TB this is one shuffle of
    the events table versus three for the join formulation."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = (
        ev.withColumn(
            "signup_ts",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("signup_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "is_funnel_purchase",
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("click_ts")),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("event_type") == "signup").alias("s"),
        F.max(F.col("click_ts").isNotNull()).alias("c"),
        F.max("is_funnel_purchase").alias("p"),
    )
    return per_user.agg(
        count_if(F.col("s")).alias("n_signup"),
        count_if(F.col("c")).alias("n_signup_click"),
        count_if(F.col("p")).alias("n_full_funnel"),
    )


def q46_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KMV (bottom-k) distinct-count sketch per event_type
    (operators.sketches) beside the exact count — the deterministic,
    cross-engine-replayable alternative to approx_count_distinct's
    engine-private HLL registers. k=64 → ~13% standard error."""
    from .operators import sketches

    ev = _t(spark, sf_dir, "events")
    est = sketches.kmv_distinct(ev, key="user_id", group_cols=["event_type"], k=64)
    exact = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_exact"))
    return exact.join(est, "event_type")


def q47_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (operators.text.tfidf_top_terms)
    — the characteristic-vocabulary step of corpus curation. Ties
    broken by term, so the oracle replays the exact cut."""
    docs = _t(spark, sf_dir, "documents")
    return text.tfidf_top_terms(docs, id_col="doc_id", text_col="text", top_n=3)


def q48_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — the inverse of q37's static pivot: the per-user
    type×sum matrix back to long form. DataFrame.unpivot is a narrow
    row-local expansion (no shuffle beyond the pivot's own); absent
    combinations drop with an explicit null filter so both engines
    agree on the row set."""
    wide = q37_event_pivot(spark, sf_dir)
    long = wide.unpivot(
        ids=["user_id"],
        values=[f"sum_{t}" for t in EVENT_TYPES],
        variableColumnName="event_type",
        valueColumnName="sum_value",
    )
    return long.filter(F.col("sum_value").isNotNull()).select(
        "user_id",
        F.expr("substring(event_type, 5)").alias("event_type"),
        "sum_value",
    )


def q49_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based trailing window (RANGE frame, §2.5 surface beyond the
    ROWS frames of q10/q11): per event, the same user's 30-minute
    trailing sum/count. RANGE frames are defined by the ordering VALUE,
    so equal-timestamp peers are always in-frame together — the result
    is deterministic with no tiebreak column needed."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(fx.epoch_us("ts"))
        .rangeBetween(-1_800_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("trailing_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_n"),
    )


def q50_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defeating salted equi-join (operators.relational.salted_
    join): lineitem⋈supplier on the salted key, revenue per supplier
    nation. Row-identical to the plain join — the oracle IS the plain
    join — while a hot supplier's rows spread across n_salts tasks."""
    from .operators.relational import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, sup, on="l_suppkey", n_salts=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


def q51_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators.curation.decontaminate):
    documents sharing ≥1 distinct word 3-gram with a held-out "eval"
    slice (doc_id % 97 == 0 stands in for a benchmark set). The eval
    shingle set is broadcast; cost is one corpus scan + one doc-keyed
    aggregate — never corpus×corpus."""
    from .operators import curation

    docs = _t(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return curation.decontaminate(train, eval_docs)


def q52_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules (operators.curation.gopher_quality_
    flags): word-count / mean-word-length / alphabetic-ratio / stopword
    rules in one zero-shuffle projection; ``keep`` = AND of all."""
    from .operators import curation

    docs = _t(spark, sf_dir, "documents")
    return curation.gopher_quality_flags(docs).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_word_ratio",
        "n_distinct_stopwords",
        "keep",
    )


def q53_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (operators.curation.
    repetition_stats): distinct-token ratio and the share of 2-gram
    occurrences taken by the most frequent 2-gram."""
    from .operators import curation

    return curation.repetition_stats(_t(spark, sf_dir, "documents"))


def q54_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII audit (operators.curation.pii_summary): email / IPv4
    / phone-pattern totals and redaction char delta, one row, pure
    regexp codegen (RE2-safe patterns so the oracle runs them too)."""
    from .operators import curation

    return curation.pii_summary(_t(spark, sf_dir, "documents"))


def q55_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking with overlap (operators.curation.chunk_
    documents): chunk_size 32 / stride 16 over documents — the corpus →
    training-context-rows step. Zero shuffles (sequence→slice→
    posexplode array codegen)."""
    from .operators import curation

    return curation.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, stride=16
    )


def q56_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate exposure (operators.curation.
    boilerplate_stats): the share of a document's distinct word 3-grams
    that occur in ≥20 distinct documents corpus-wide."""
    from .operators import curation

    return curation.boilerplate_stats(
        _t(spark, sf_dir, "documents"), n=3, min_df=20
    )


def q57_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (operators.similarity.
    quantize_embeddings) with reconstruction metrics. The qvec array is
    projected to engine-portable scalars for the registry (the driver
    canonicalizer can't sort list cells); raw-array checks live in
    tests/test_similarity.py."""
    emb = _emb(spark, sf_dir)
    out = similarity.quantize_embeddings(emb)
    return out.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.aggregate(
            "qvec", F.lit(0).cast("long"), lambda a, q: a + F.abs(q)
        ).alias("qvec_l1"),
        F.round("max_abs_err", 6).alias("max_abs_err"),
        F.round("cos_recon", 6).alias("cos_recon"),
    )


def q58_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning (operators.relational.bloom_*): a
    4096-bit / 4-hash engine-portable filter built from the p_size<=3
    part keys prunes the lineitem scan BEFORE any join. One audit row
    proves the no-false-negative invariant (every true match passes)
    and measures the realized false-positive count. The fact side is
    spread before the probe: the portable-md5 positions are ~4x an
    xxhash per row, and a single-split scan would serialize all of it
    on one core (interleaved A/B at sf0.1: 1.85 s -> 0.80 s)."""
    from .operators import relational

    li = fx.spread_small_input(_t(spark, sf_dir, "lineitem").select("l_partkey"))
    dim = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 3)
        .select("p_partkey")
        .distinct()
    )
    words = relational.bloom_build(dim, "p_partkey", num_bits=4096, num_hashes=4, portable=True)
    probe = relational.bloom_might_contain(
        F.col("l_partkey"), words, num_hashes=4, portable=True
    )
    flags = li.join(
        F.broadcast(
            dim.withColumnRenamed("p_partkey", "l_partkey").withColumn("__m", F.lit(True))
        ),
        on="l_partkey",
        how="left",
    ).select(probe.alias("__pass"), F.coalesce("__m", F.lit(False)).alias("__match"))
    return flags.agg(
        F.count(F.lit(1)).alias("n_fact"),
        count_if(F.col("__pass")).alias("n_pass_bloom"),
        count_if(F.col("__match")).alias("n_true_match"),
        count_if(F.col("__pass") & ~F.col("__match")).alias("n_false_pos"),
    )


def q59_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new batch against an existing corpus
    (operators.dedup.incremental_dedup_flags): odd doc_ids are the
    batch, even the corpus. Per-batch-doc audit flags: exact content
    hash seen in corpus / MinHash-LSH + Jaccard>=0.8 near-dup vs
    corpus / kept."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.incremental_dedup_flags(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        threshold=0.8,
    )


def q60_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-quantile sketch (operators.sketches.
    histogram_quantiles): per-event-type p50/p90/p99 of value from a
    50-bin [0,500) histogram — the one-pass scale path next to q36's
    exact global-sort percentiles; error bounded by one bin width."""
    from .operators import sketches

    ev = _t(spark, sf_dir, "events")
    return sketches.histogram_quantiles(
        ev, "value", ["event_type"], quantiles=(0.5, 0.9, 0.99), lo=0.0, hi=500.0, n_bins=50
    )


def q61_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimation (operators.sketches.
    cms_counters/cms_estimate, 3×1024 counters) probed at the exact
    top-10 lineitem part keys: est_count >= true_count always (the CMS
    overestimate invariant); the gap is the realized collision cost of
    2000 keys in 1024 buckets.

    Scale knob — CMS WIDTH (and depth). The probe measures ~3.7× time
    on 10× rows (SCALING.md): the build hashes every fact row depth
    times (portable md5 here — xxhash64 is ~3× cheaper when oracle
    replay isn't needed), so build cost is depth×rows while sketch
    state stays width×depth counters regardless of data size — that's
    the point of the sketch. Width buys accuracy, not time: expected
    overestimate ≈ rows/width per depth row (min over depth rows), so
    10× data at fixed width means 10× absolute error; hold the
    relative-error target by scaling width with rows (width ≈ e/ε for
    εn error), which costs only sketch memory, never shuffle — the
    counter table is width×depth rows, broadcast-sized into the probe
    join at any corpus size."""
    from .operators import sketches

    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    counters = sketches.cms_counters(li, "l_partkey", width=1024, depth=3)
    # The exact top-10 feeds both the probe explode and the final join;
    # it is a BOUNDED 10-row structure, so collect it once and re-seed a
    # local relation instead of persisting (a .persist() here leaked a
    # session-lifetime cache entry for library callers — r2 ADVICE).
    top_rows = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), "l_partkey")
        .limit(10)
        .collect()
    )
    true_top = spark.createDataFrame(
        top_rows, "l_partkey bigint, true_count bigint"
    )
    est = sketches.cms_estimate(counters, true_top, "l_partkey", width=1024, depth=3)
    return true_top.join(est, on="l_partkey").select(
        "l_partkey", "true_count", "est_count"
    )


def q62_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (operators.sampling.cap_per_group): at most 30
    documents per source, selected by the rows' own salted hash — the
    no-domain-dominates rule of web-corpus curation, deterministic
    under any layout."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.cap_per_group(docs, "source", cap=30).select("doc_id", "source")


def q63_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators.relational.snapshot_diff): yesterday =
    orders minus every 7th key; today = orders minus every 5th key with
    totalprice bumped on every 3rd — per-status row counts audit the
    increment (added/removed/changed/unchanged)."""
    from .operators import relational

    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0)
    new = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    diff = relational.snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )
    return (
        diff.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


def q64_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort matrix over events: cohort = a user's first
    event day; cell = distinct users from that cohort active N days
    later. Two shuffles total — one user-keyed aggregate for the cohort
    dimension (derived from the fact itself, then joined back on
    user_id) and one (cohort, offset) distinct-count."""
    ev = _t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    cohorts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        ev.join(cohorts, on="user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("d", "cohort_day").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        # Emit the cohort as an ISO string: a Spark DATE collects as
        # datetime.date ("2024-01-01") while the oracle's DATE surfaces
        # through pandas as datetime64 ("2024-01-01 00:00:00") — equal
        # dates, different canonical strings (caught by the r3 gate).
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_users",
        )
    )


def q65_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (operators.validate): five
    dbt-test-shaped rules over lineitem compiled into one conditional-
    count aggregate plus one uniqueness pass — per-rule violation
    counts, not one scan per rule. The synthetic data genuinely
    violates two rules (price cap, composite-key uniqueness)."""
    from .operators import validate as V

    li = _t(spark, sf_dir, "lineitem")
    return V.validate(
        li,
        [
            V.not_null("l_partkey"),
            V.in_range("l_quantity", 1, 50),
            V.in_range("l_extendedprice", 0, 50_000),
            V.accepted_values("l_returnflag", ["A", "N", "R"]),
            V.unique(["l_orderkey", "l_linenumber"]),
        ],
    )


def q66_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (operators.curation.k_anonymity_audit) over
    events with quasi-identifiers (event_type, event day): how exposed
    would a user-derived release be at k=5."""
    from .operators import curation

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    return curation.k_anonymity_audit(ev, ["event_type", "day"], k=5)


def q67_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry path (spark.sql over registered views — the registry's
    other queries use the DataFrame API): orders priced above their own
    customer's average, a correlated subquery Catalyst decorrelates
    into an aggregate + join. Returns per-customer counts."""
    from .sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
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
    )


def q68_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (operators.sampling.
    weighted_sample_per_group, Efraimidis–Spirakis): 20 docs per
    source, selection probability proportional to document length —
    deterministic under any layout."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "weight", F.length("text").cast("double")
    )
    return sampling.weighted_sample_per_group(
        docs, "source", "weight", n=20
    ).select("doc_id", "source")


def q69_feature_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem numeric features
    in ONE aggregate pass (six corr() accumulators, map-side combined)
    — the feature-diagnostics step before any modeling, never a
    per-pair scan."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = [
        F.round(F.corr(a, b), 4).alias(f"corr_{a[2:]}_{b[2:]}")
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
    ]
    return li.agg(*aggs)


def q70_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram Shannon entropy per document (operators.text.
    char_bigram_entropy) — the compressibility/gibberish signal that
    complements the word-level Gopher rules (q52)."""
    return text.char_bigram_entropy(_t(spark, sf_dir, "documents"))


def q71_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit, pure composition of existing ops: the
    deterministic hash split (operators.sampling.train_val_test_split)
    + MinHash-LSH candidates + exact-Jaccard verification, keeping
    pairs ABOVE 0.8 that cross a split boundary — exactly the
    holdout-contamination check a training pipeline must run before
    trusting an eval number."""
    from pyspark import StorageLevel

    docs = _t(spark, sf_dir, "documents")
    split = sampling.train_val_test_split(docs).select("doc_id", "split")
    # ONE shingle pass shared by the LSH band stage and the exact
    # verification join (the q38/q59/q93 persist-reuse discipline) —
    # shingling + portable hashing is the CPU-dense step, never pay it
    # twice.
    sets = dedup.shingle_sets(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sets.count()  # eager pin — see q93
    bands = dedup.minhash_bands(docs, sets=sets)
    cand = dedup.minhash_candidate_pairs(bands)
    sims = dedup.ngram_jaccard_pairs(docs, cand, sets=sets).filter(
        F.col("jaccard") >= 0.8
    )
    sa = split.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "split_a")
    sb = split.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "split_b")
    return (
        sims.join(sa, on="id_a")
        .join(sb, on="id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", F.round("jaccard", 6).alias("jaccard"))
    )


def q72_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build from a change log (operators.temporal.
    scd2_history): per user, collapse the event stream into
    event_type state versions with [valid_from, valid_to) intervals —
    the CDC-compaction primitive. Times are epoch micros (bigint) so
    the value hash is engine-portable."""
    from .operators import temporal

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts_ns DIV 1000").alias("ts_us"),
        "event_type",
    )
    # Open-ended (current) versions get the conventional max-sentinel
    # end instead of NULL: a nullable BIGINT surfaces as float64 through
    # the driver's pandas canonicalization (same class as q40/q73).
    return temporal.scd2_history(
        ev, key="user_id", ts="ts_us", value_cols=["event_type"], tiebreak="event_id"
    ).select(
        "user_id",
        "event_type",
        F.col("valid_from").alias("valid_from_us"),
        F.coalesce("valid_to", F.lit(9223372036854775807)).alias("valid_to_us"),
        "version",
        "is_current",
    )


def q73_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-grid resample with forward fill (operators.temporal.
    resample_ffill): per user, one row per epoch-aligned day tick
    carrying the latest observed value — the feature-store backfill
    primitive (union + running-last, no per-tick lookup join)."""
    from .operators import temporal

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts_ns DIV 1000000000").alias("ts_s"),
        "value",
    )
    out = temporal.resample_ffill(
        ev, key="user_id", ts="ts_s", value="value", step=86_400, tiebreak="event_id"
    )
    # Grid ticks before a user's first observation have nothing to
    # fill; drop them so obs_ts is never NULL. (Also load-bearing for
    # the oracle compare: a nullable BIGINT round-trips through the
    # driver's pandas canonicalization as float64 — "88.0" vs Spark's
    # "88" — so the all-int grid must stay null-free on both sides.)
    return out.where(F.col("obs_ts").isNotNull()).select(
        "user_id", "grid_ts", F.round("value", 4).alias("value"), "obs_ts"
    )


def q74_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    (operators.temporal.transition_counts) — the user-journey /
    session-flow mining step: one lag window per user, then a tiny
    (states × states) aggregate."""
    from .operators import temporal

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts_ns DIV 1000").alias("ts_us"),
        "event_type",
    )
    return temporal.transition_counts(
        ev, key="user_id", ts="ts_us", state="event_type", tiebreak="event_id"
    )


def q75_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler (operators.profile.profile_columns):
    nulls / exact distincts / min / max / avg string length for every
    documents column in a single aggregate scan — the trust-but-verify
    step before any new data drop enters the pipeline."""
    from .operators import profile

    return profile.profile_columns(_t(spark, sf_dir, "documents"))


def q76_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text normalization audit (operators.text.normalize_text):
    per language, document count, characters dropped by the keep-set
    filter, changed-doc count, and an order-independent bit_xor
    checksum of the portable 60-bit md5 of each normalized text — the
    checksum pins the full normalized CONTENT, not just counts, while
    keeping the output one row per language."""
    from .operators.dedup import md5_hash60

    docs = text.normalize_text(_t(spark, sf_dir, "documents"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_removed_chars").alias("removed_chars"),
        F.sum(F.col("changed").cast("long")).alias("n_changed"),
        F.bit_xor(md5_hash60(F.col("norm_text"))).alias("checksum"),
    )


def q77_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document segment dedup with doc rebuild
    (operators.dedup.segment_dedup): every 5-token segment keeps its
    first corpus-wide occurrence; later copies are dropped and each
    document's text is reassembled from its surviving segments.

    Scale knob — SEGMENT LENGTH (seg_words). The probe measures ~3.5×
    time on 10× rows (SCALING.md): the explode emits ~tokens/seg_words
    rows per doc, so the dominant shuffle (first-occurrence window,
    keyed by segment hash) scales with corpus_tokens/seg_words.
    Doubling seg_words halves the exploded row count AND the window
    shuffle, at the cost of coarser dedup granularity (only ≥seg_words
    exact-token runs dedup). Viral segments (the same hash in millions
    of docs) are the skew case — AQE skew-join splitting handles the
    window's shuffle partitions; at 100 TB also pre-filter segments by
    a frequency sketch so singleton segments (the vast majority) skip
    the window entirely."""
    return dedup.segment_dedup(
        _t(spark, sf_dir, "documents"), seg_words=5
    )


def q78_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier summary (operators.profile.
    robust_outlier_stats): exact median/MAD modified z-score — the
    outlier rule heavy-tailed telemetry needs (mean/stddev z-scores
    saturate on the very outliers they're meant to find)."""
    from .operators import profile

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    return profile.robust_outlier_stats(ev, group="event_type", value="value", z=3.5)


def q79_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity join (operators.text.
    sparse_cosine_pairs): the term-postings self-join formulation —
    the sparse complement of the dense-embedding ANN paths (q19/q27/
    q28/q30), with the document-frequency cutoff as the scale dial.
    Restricted to a fixed 100-doc slice so the demonstration output is
    scale-independent."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return text.sparse_cosine_pairs(docs, min_sim=0.1, max_df_ratio=0.5)


def q80_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantile discretizer (operators.profile.
    equidepth_bins): every event lands in one of 4 equi-depth value
    bins per event_type, with per-bin count and [lo, hi] span — the
    exact counterpart of MLlib's approximate QuantileDiscretizer."""
    from .operators import profile

    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    return profile.equidepth_bins(
        ev, value="value", k=4, group="event_type", tiebreak="event_id"
    )


def q81_grouped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time in ONE aggregate pass
    (operators.profile.grouped_trend, built-in regr_* aggregates). x is
    days since 2024-01-01 — small magnitudes, so the closed-form sums
    stay well-conditioned."""
    from .operators import profile

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (
            (F.expr("ts_ns DIV 1000") - F.lit(1_704_067_200_000_000))
            / F.lit(86_400_000_000.0)
        ).alias("x_days"),
    )
    return profile.grouped_trend(ev, group="event_type", x="x_days", y="value")


def q82_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift audit (operators.profile.
    psi_drift): first calendar week of events as the reference slice vs
    the rest, fixed-width value bins over [0, 500) per event_type — the
    'did this week's data shift?' gate of a production pipeline."""
    from .operators import profile

    ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts_ns")
    ref = F.expr("ts_ns DIV 1000") < F.lit(1_704_672_000_000_000)
    return profile.psi_drift(
        ev, value="value", split=ref, lo=0.0, hi=500.0, bins=10, group="event_type"
    )


def q83_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (operators.multimodal.frame_sample):
    frame indices explode JVM-side from metadata; the per-frame decode
    is the Arrow-batched mapInPandas stub kernel. The deterministic
    stub is fully SQL-replayable, so the video path gets the same full
    value-hash oracle as the image path (q29)."""
    from .operators import multimodal

    media = multimodal.synthetic_media(spark, n=300, partitions=4)
    return multimodal.frame_sample(media, every_n=30)


def q84_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate over (status, priority) — all 2^2 grouping sets in
    one pass, completing the grouping family next to rollup (q31) and
    the fused GROUPING SETS ETL pass (operators/etl.py). One shuffle;
    each input row expands to its grouping combinations map-side."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def q85_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (operators.dedup.blocked_name_matches): customer
    names matched within nation blocks by deletion-neighborhood
    (SymSpell) blocking + exact Levenshtein <= 1 — the entity-
    resolution complement of the document near-dup family (structured
    identifiers, not text)."""
    cust = _t(spark, sf_dir, "customer")
    return dedup.blocked_name_matches(
        cust, id_col="c_custkey", name_col="c_name", block_col="c_nationkey", max_dist=1
    ).select("id_a", "id_b", "distance")


def q86_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (plans.graph.personalized_pagerank):
    random walk with restart at the smallest part node — seeded
    relevance over the same graph as q13, reusing the iterate machinery
    with only the restart vector changed. 3 fixed iterations so the
    oracle replays the exact recurrence."""
    edges = graph_edges(spark, sf_dir)
    # source=None: the restart node (min src) is derived inside
    # personalized_pagerank from its persisted dedup'd edge set — the
    # old eager agg here cost one extra full lineitem scan before the
    # graph build (r10 job-floor pass; identical value, MIN skips
    # nulls and duplicates).
    scores = graph_plans.personalized_pagerank(edges, source=None, iters=3)
    return scores.select("node", F.round("score", 8).alias("score"))


def q87_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test per event_type in one aggregate pass
    (operators.profile.ab_test_welch): even vs odd user_id as the
    experiment arms — the experiment-readout primitive."""
    from .operators import profile

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id", "value")
    return profile.ab_test_welch(
        ev, group="event_type", value="value", split=F.col("user_id") % 2 == 0
    )


def q88_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (plans.graph.hits, L1-normalized, 3
    fixed rounds) over the q13 graph — the link-analysis complement of
    PageRank: authorities accumulate from hub links and vice versa,
    two join+aggregate halves per round with scalar broadcast
    normalizers."""
    return graph_plans.hits(graph_edges(spark, sf_dir), iters=3)


def q89_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator surface with DISTINCT semantics: customers holding
    orders vs customers in the low-numbered nations — INTERSECT /
    EXCEPT both ways / UNION counted in one summary row. Spark plans
    intersect/subtract as left-semi/left-anti joins over distincts."""
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    seg = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 12)
        .select("c_custkey")
    )
    # ONE declarative plan: distinct sides full-outer-joined on the key;
    # every set cardinality is a conditional count over the join result
    # (Spark plans INTERSECT/EXCEPT as exactly these semi/anti joins —
    # here all four come from a single pass).
    a = orders.distinct().withColumn("__a", F.lit(1))
    b = seg.withColumn("__b", F.lit(1))
    j = a.join(b, on="c_custkey", how="full")
    both = F.col("__a").isNotNull() & F.col("__b").isNotNull()
    return j.agg(
        count_if(both).alias("n_intersect"),
        count_if(F.col("__a").isNotNull() & F.col("__b").isNull()).alias("n_orders_only"),
        count_if(F.col("__a").isNull() & F.col("__b").isNotNull()).alias("n_segment_only"),
        F.count(F.lit(1)).alias("n_union"),
    )


def q90_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over per-user activity days: contiguous daily
    runs found with the classic date − row_number constant-per-island
    trick (one window per user, no self-join). Output per user:
    distinct active days, island count, and the longest streak."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns DIV 86400000000000").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = ev.withColumn("grp", F.col("day") - F.row_number().over(w))
    runs = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.sum("run_len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_islands"),
        F.max("run_len").alias("longest_streak"),
    )


def q91_merge_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation: daily per-event-type moment partials
    (operators.sketches.moments_partials) merged to event_type level
    with the parallel variance combine (merge_moments) — the rollup is
    answered from partials alone, no fact re-scan. The oracle replays
    the identical two-level computation."""
    from .operators import sketches

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.expr("ts_ns DIV 86400000000000").alias("day"), "value"
    )
    partials = sketches.moments_partials(ev, group=["event_type", "day"], value="value")
    return sketches.merge_moments(partials, group="event_type")


def q92_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances (plans.graph.bfs_layers) over the UNDIRECTED
    part↔supplier graph from the min part node — frontier expansion
    with a distributed settled set (left-anti join, no driver-side
    visited structure). Supplier ids are offset by max(part key)+1 —
    derived from the data in the same one-row aggregate that fetches
    the source node, so the two key spaces can NEVER collide at any
    scale factor (a fixed literal offset silently merges vertices once
    the part table outgrows it)."""
    li = _t(spark, sf_dir, "lineitem")
    # One column-pruned scalar fetch serves both the collision-free
    # supplier offset and the BFS source (min part key — every src in
    # the undirected union is either a part key or an offset supplier
    # id, so min part key is the global min node).
    bounds = li.agg(
        F.min("l_partkey").alias("lo"), F.max("l_partkey").alias("hi")
    ).first()
    if bounds["hi"] is None:  # empty table: BFS of nothing is nothing
        return spark.createDataFrame([], "node long, dist int")
    src0, offset = bounds["lo"], bounds["hi"] + 1
    # No pre-distinct here: bfs_layers dedupes its edge input once, so a
    # distinct on fwd would just add a second 600k-row shuffle. Raw
    # union → ONE distinct inside bfs_layers.
    fwd = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + F.lit(offset)).alias("dst"),
    )
    und = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sources = spark.createDataFrame([(src0,)], "node long")
    return graph_plans.bfs_layers(und, sources, max_depth=12)


def q93_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-superset / quote detection: directional n-gram containment
    (operators.dedup.ngram_containment_pairs) over the MinHash-LSH
    candidate set — |A∩B|/|A| catches a short doc embedded in a long
    one where Jaccard stays low. One shared shingle pass feeds both the
    LSH band stage and the exact verification join (the q38/q59
    persist-reuse discipline)."""
    from pyspark import StorageLevel

    docs = _t(spark, sf_dir, "documents")
    sets = dedup.shingle_sets(docs).persist(StorageLevel.MEMORY_AND_DISK)
    # Pin eagerly (the q56 lesson): a lazy persist lets the band stage
    # and the verification join race to populate it, shingling twice.
    sets.count()
    bands = dedup.minhash_bands(docs, num_hashes=12, rows_per_band=2, sets=sets)
    pairs = dedup.minhash_candidate_pairs(bands)
    out = dedup.ngram_containment_pairs(docs, pairs, sets=sets)
    return out.filter(
        F.greatest("containment_a", "containment_b") >= 0.3
    ).select(
        "id_a",
        "id_b",
        F.round("containment_a", 6).alias("containment_a"),
        F.round("containment_b", 6).alias("containment_b"),
    )


def q94_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf-law fit: token frequencies → top-200 terms by count
    (TakeOrdered, no global sort) → OLS of ln(freq) on ln(rank) in one
    regr_* aggregate. The slope (~ -1 for natural text) is the corpus-
    health smell test for synthetic/degenerate drops. The rank window
    runs over the already-limited 200 rows, so the single-partition
    window is a non-issue at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(fx.whitespace_tokens(F.col("text"))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    top = counts.orderBy(F.desc("freq"), F.asc("tok")).limit(200)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("tok"))),
    )
    return ranked.agg(
        F.round(F.regr_slope(F.log("freq"), F.log("rank")), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(F.log("freq"), F.log("rank")), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(F.log("freq"), F.log("rank")), 6).alias("zipf_r2"),
        F.count(F.lit(1)).alias("n_terms"),
    )


def q95_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event_type and a fixed-width value
    band — the feature-selection / redundancy audit: MI(X;Y) =
    Σ p(x,y)·ln(p(x,y)/(p(x)p(y))). One groupBy over the fact table;
    the marginals derive from the tiny joint table (≤ |X|·|Y| rows), so
    everything after the first aggregate is broadcast-sized."""
    # MI is defined over observed (x, y) pairs: null/NaN values are not
    # observations (same discipline as q34/q60 — and floor(NaN) bins
    # differently per engine, so the filter is also oracle-portability).
    v = F.col("value")
    ev = (
        _t(spark, sf_dir, "events")
        .filter(v.isNotNull() & ~F.isnan(v))
        .select(
            "event_type",
            F.least(F.floor(v / 100), F.lit(4)).alias("value_band"),
        )
    )
    joint = ev.groupBy("event_type", "value_band").agg(
        F.count(F.lit(1)).alias("nxy")
    ).persist()
    mx = joint.groupBy("event_type").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("value_band").agg(F.sum("nxy").alias("ny"))
    tot = joint.agg(F.sum("nxy").alias("n"))
    terms = (
        joint.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "value_band")
        .crossJoin(F.broadcast(tot))
    )
    return terms.agg(
        F.round(
            F.sum(
                (F.col("nxy") / F.col("n"))
                * F.log((F.col("nxy") * F.col("n")) / (F.col("nx") * F.col("ny")))
            ),
            6,
        ).alias("mi_nats"),
        F.round(
            -F.sum(
                (F.col("nxy") / F.col("n")) * F.log(F.col("nxy") / F.col("n"))
            ),
            6,
        ).alias("joint_entropy_nats"),
        F.max("n").alias("n_events"),
    )


def q96_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent PRIOR click/view (one IGNORE NULLS window per user over
    (ts_ns, event_id) order — no self-join), then rolled up per
    attributed channel with the average touch→purchase gap. Purchases
    with no prior touch land in the 'none' channel."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts_ns DIV 1000").alias("ts_us"),
        "event_type",
    )
    is_touch = F.col("event_type").isin("click", "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.withColumn(
        "touch_type", F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w)
    ).withColumn(
        "touch_ts", F.last(F.when(is_touch, F.col("ts_us")), ignorenulls=True).over(w)
    )
    purchases = tagged.filter(F.col("event_type") == "purchase")
    return purchases.groupBy(
        F.coalesce("touch_type", F.lit("none")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(
            F.avg((F.col("ts_us") - F.col("touch_ts")) / 60_000_000.0), 4
        ).alias("avg_gap_minutes"),
    )


def q97_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids → pairwise cosine between labels —
    the class-separation audit for an embedding space. posexplode →
    (label, dim) average (one shuffle of |labels|·|dims| partials via
    map-side combine), then centroid dot products as a dim-keyed
    equi-join over the tiny centroid table. No arrays in the output, so
    the result is canonicalizer-safe (the q29 lesson)."""
    emb = _emb(spark, sf_dir)
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("c"))
        .persist()
    )
    norms = cent.groupBy("label").agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm"))
    a, b = cent.alias("a"), cent.alias("b")
    dots = (
        a.join(b, on=[F.col("a.pos") == F.col("b.pos"), F.col("a.label") < F.col("b.label")])
        .groupBy(F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b"))
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("dot"))
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("nrm").alias("nrm_a"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("nrm").alias("nrm_b"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.round(F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")), 6).alias("cosine"),
        )
    )


def q98_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: typed JSON extraction from the events
    ``props`` column with from_json + an explicit schema (the
    Catalyst-native path — stays in codegen, prunes to the requested
    field, no Python), aggregated per event_type. Malformed/missing
    JSON parses to null and is counted, the schema-drift smell test."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.from_json("props", "k bigint").alias("p")
    )
    k = F.col("p.k")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        count_if(k.isNull()).alias("n_null_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )


def q99_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / CDC-apply (operators.relational.apply_changes): a
    deterministic change batch derived from orders — per-customer order
    totals as updates, every 10th key a delete, keys above the base's
    700-key slice arriving as inserts — applied to the customer base in
    one full-outer-join pass. The incremental-table-maintenance
    primitive of every lakehouse pipeline."""
    from .operators.relational import apply_changes

    base = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 700)
    changes = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("c_acctbal"))
        .withColumn(
            "op",
            F.when(F.col("c_custkey") % 10 == 0, F.lit("D")).otherwise(F.lit("U")),
        )
    )
    merged = apply_changes(base, changes, key="c_custkey")
    return merged.select(
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )


def q100_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read semi-structured path: parse props ONCE into a
    Spark 4 VARIANT (try_parse_json — binary shredded form, not a
    string reparse per access) and extract typed paths with
    try_variant_get. The contrast to q98's fixed-schema from_json: no
    schema declared up front, unparseable payloads and missing keys
    audited separately — the ingest shape for payloads that drift."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.try_parse_json("props").alias("v")
    )
    k = F.try_variant_get("v", "$.k", "bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        count_if(F.col("v").isNull()).alias("n_unparsed"),
        count_if(k.isNull()).alias("n_missing_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


def q101_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII REDACTION (operators.curation.pii_scan) — the
    transform, not just q54's audit: emails → [EMAIL], IPv4 → [IP],
    phone-like runs → [PHONE], applied in that order. Pure regexp
    codegen, zero shuffles; output restricted to documents that had a
    hit so the result is the redaction worklist. The synthetic corpus
    carries no natural PII, so both sides first append deterministic
    email/IP/phone fragments to every 7th/11th/13th doc — the oracle
    then verifies the actual redaction work, not a vacuous empty set."""
    from .operators import curation

    d = F.col("doc_id")
    enriched = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 7 == 0,
                F.concat(
                    F.lit(" contact: user"), d.cast("string"), F.lit("@example.com")
                ),
            ).otherwise(""),
            F.when(
                d % 11 == 0,
                F.concat(F.lit(" host 10."), (d % 256).cast("string"), F.lit(".0.1")),
            ).otherwise(""),
            F.when(
                d % 13 == 0,
                F.concat(F.lit(" call +1 555 0"), d.cast("string"), F.lit(" 99")),
            ).otherwise(""),
        ).alias("text"),
    )
    scanned = curation.pii_scan(enriched)
    return scanned.filter(
        F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones") > 0
    ).select(
        "doc_id",
        (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones"))
        .cast("long")
        .alias("n_pii"),
        F.col("redacted_text"),
    )


def q102_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative ELECTION BY QUALITY — the step after
    fuzzy dedup (q38): within each multi-document near-dup cluster,
    keep the highest-quality_score document (text.quality_features;
    ties to the lowest doc_id) instead of q38's arbitrary min-id rep.
    This is how production dedup keeps the best copy of boilerplate
    families rather than the first-crawled one. Cost beyond q38: one
    join of the (tiny) cluster table against per-doc quality + one
    window over clusters — the pair graph, never the corpus.

    SIDE EFFECT: dup_clusters' pair-graph persist (pair-sized, tiny)
    stays cached after return, exactly as its docstring states; the
    corpus-sized shingle cache is RELEASED here once the pair graph
    is materialized."""
    docs = _t(spark, sf_dir, "documents")
    sets = dedup.shingle_sets(docs).persist()
    bands = dedup.minhash_bands(docs, sets=sets)
    cand = dedup.minhash_candidate_pairs(bands)
    verified = (
        dedup.ngram_jaccard_pairs(docs, cand, sets=sets)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    # No size filter needed: dup_clusters only emits nodes that appear
    # in the pair graph, so every cluster has >= 2 members already.
    clusters = dedup.dup_clusters(verified)
    # dup_clusters eagerly counts its persisted pair graph, so by now
    # the corpus-sized shingle cache has served its last consumer —
    # release it here (the bfs_layers pattern) rather than leaking a
    # corpus-scale cache entry into long-lived sessions. The clusters
    # result reads from the CACHED pairs, never back through sets.
    sets.unpersist()
    quality = text.quality_features(docs).select("doc_id", "quality_score")
    w = Window.partitionBy("cluster").orderBy(F.desc("quality_score"), F.col("doc_id"))
    return (
        clusters.join(quality, on="doc_id")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "cluster",
            F.col("doc_id").alias("kept_doc"),
            "cluster_size",
            F.col("quality_score").alias("kept_quality"),
        )
    )


def q103_batch_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN retrieval join (operators.similarity.batch_ann_topk):
    every 100th vector is a query, resolved in ONE bucket-equi-join
    (corpus-derived sign-LSH plane count, literal ±1 matrix so the
    oracle replays bucketing exactly) + one per-query top-3 window —
    the many-queries-at-once shape retrieval pipelines actually run,
    vs q28's single-vector probe. The query set here is
    corpus-PROPORTIONAL (every 100th vector), so the batch is joined
    WITHOUT the broadcast hint — at 100 TB a 1% query set is itself
    TB-scale and the join must shuffle both sides on the bucket;
    broadcast_queries=True is the right call only for bounded request
    batches (the operator documents both modes). The plane count is
    derived from the corpus size INSIDE the plan (lsh_bucket_auto),
    pinning bucket occupancy at ~1024 rows: per-query candidate work
    stays ~constant and the batch total ~linear as the corpus grows —
    a fixed dial made it n²/2^planes (r7-verdict lead item)."""
    emb = _emb(spark, sf_dir)
    buckets = similarity.lsh_bucket_auto(emb, dim=_emb_dim(sf_dir))
    queries = buckets.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "lsh_bucket"
    )
    out = similarity.batch_ann_topk(buckets, queries, k=3, broadcast_queries=False)
    return out.select(
        "query_id",
        "vec_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("int").alias("rank"),
    )


def q104_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, cluster-then-prune (SemDeDup shape): coarse
    k-means clusters (the q30 sampled-Lloyd quantizer — fit is one
    bounded collect) partition the corpus; near-duplicate pairs are
    found ONLY within a cluster (pairwise_cosine_within, Σ|cluster|²
    work, never |N|²); within a pair the higher vec_id is dropped.
    Output is the per-cluster funnel: vectors assigned, dropped,
    kept. The same plan at 100 TB uses more lists (k scales with
    corpus) so cluster occupancy — and the pairwise term — stays
    bounded."""
    from .plans.kmeans import IVF_QUANTIZER, assign_clusters, lloyd_kmeans_sample

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    centroids = lloyd_kmeans_sample(emb, "vec_id", "embedding", **IVF_QUANTIZER)
    assigned = assign_clusters(emb, centroids, "embedding", out_col="cluster")
    # assigned feeds BOTH the pair graph and the final funnel base —
    # persist it so the corpus is scanned+assigned once (the shared-
    # subtree convention of q38's shingle sets; harnesses clear the
    # cache between queries, library callers own cleanup). The dropped
    # set joins WITHOUT a broadcast hint: semantic dedup drops a
    # corpus-proportional fraction by design, so AQE must pick the
    # strategy from its measured size.
    assigned = assigned.persist()
    pairs = similarity.pairwise_cosine_within(
        assigned, "cluster", id_col="vec_id", threshold=0.35
    )
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return (
        assigned.join(dropped.withColumn("__d", F.lit(True)), on="vec_id", how="left")
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.col("__d").isNotNull().cast("long")).alias("n_dropped"),
            F.sum(F.col("__d").isNull().cast("long")).alias("n_kept"),
        )
    )


def q105_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-curation funnel (operators.curation.
    curation_pipeline): quality rules → exact dedup → benchmark
    decontamination (eval = doc_id % 97 == 0, held out) → per-domain
    cap, reported as per-stage surviving rows and tokens. Every stage
    is a cumulative FLAG inside one projection — two windows + one
    hit join + ONE conditional aggregate; no per-stage
    materialization at any corpus size."""
    from .operators import curation

    docs = _t(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return curation.curation_pipeline(train, eval_docs, cap=30)


def q106_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 more-like-this retrieval (operators.retrieval.
    bm25_more_like_this): the eval split (doc_id % 97 == 0, same split
    convention as q51/q105) queries the train corpus with its distinct
    token set; top-5 per query by the Lucene-form BM25. One term-keyed
    postings join bounded by the document-frequency cutoff (the shared
    BM25_Q106_DF_RATIO — see its comment for why this corpus needs a
    looser cut than the 0.5 production default) — never corpus ×
    queries; scores rounded before ranking so the oracle's cut is
    bit-identical."""
    from .operators import retrieval

    docs = _t(spark, sf_dir, "documents")
    queries_df = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return retrieval.bm25_more_like_this(
        corpus, queries_df, k=5, max_df_ratio=retrieval.BM25_Q106_DF_RATIO
    )


def q107_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity-proxy filtering (operators.text.
    unigram_nll): unigram LM trained ON the corpus, each document
    scored by per-token negative log-likelihood, outliers flagged
    above the shared UNIGRAM_NLL_OUTLIER threshold (applied to the
    ROUNDED score on both engines). Zero-token documents score 0.0 —
    the engine-wide "no tokens is a fact, not a NULL" invariant."""
    docs = _t(spark, sf_dir, "documents")
    return text.unigram_nll(docs)


def q108_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over events (functions.
    morton_key): interleave user_id with the event's epoch-day, bucket
    by the key's high bits, and report per-bucket occupancy + key
    ranges — the layout audit a table maintainer runs before adopting
    a multi-dimensional sort. The write path + partition-pruning proof
    (2-D rectangle reads touch only their bucket range) lives in
    sources/layout.write_zordered and tests/test_layout.py. Pure
    shift/mask codegen; one hash aggregate; no window."""
    ev = _t(spark, sf_dir, "events")
    # floor(double-division): epoch_us < 2^53 is double-exact, so this
    # is identical arithmetic to the oracle's floor(epoch_us/86400e6).
    day = F.floor(fx.epoch_us("ts") / F.lit(86400000000)).cast("long")
    z = fx.morton_key(F.col("user_id"), day)
    return (
        ev.select(
            F.shiftright(z, fx.ZORDER_BUCKET_SHIFT).alias("zbucket"),
            z.alias("zkey"),
            "user_id",
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("zkey").alias("z_min"),
            F.max("zkey").alias("z_max"),
        )
    )


def q109_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training primitive (operators.text.
    bpe_merge_candidates): corpus-wide adjacent character-pair counts
    inside lowercased alphabetic words — the first BPE merge round
    (real BPE loops this job with the winning pair merged, a bounded
    driver loop like PageRank's). Exact integer counts; the shuffle
    carries at most the ~26² pair dictionary per partition."""
    docs = _t(spark, sf_dir, "documents")
    return text.bpe_merge_candidates(docs, top_n=20)


def q110_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-register HyperLogLog distinct count of orders.o_custkey
    (operators.sketches.hll_registers/hll_estimate): md5-defined
    registers any engine can rebuild or MERGE (max over 256 rows), the
    auditable counterpart to approx_count_distinct's engine-private
    HLL++ state. The register sum is assembled in exact integer space
    (Σ 2^(53−r) as bigint), so the estimate is order-independent and
    bit-replayable — only the linear-counting branch touches ln, and
    the output rounds at 4dp."""
    from .operators import sketches

    orders = _t(spark, sf_dir, "orders")
    return sketches.hll_estimate(sketches.hll_registers(orders, "o_custkey"))


def q111_hll_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped HLL: distinct users PER event_type from one pass over
    events — the per-tenant/per-day cardinality-monitoring shape. Each
    group's register state is independently bounded at 256 rows and
    independently mergeable across shards/days; the whole sketch table
    is |groups|·256 rows regardless of corpus size."""
    from .operators import sketches

    ev = _t(spark, sf_dir, "events")
    regs = sketches.hll_registers(ev, "user_id", group_cols=["event_type"])
    return sketches.hll_estimate(regs, group_cols=["event_type"])


def q112_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators.retrieval.rrf_fuse): the eval split
    (id % 97 == 0, the q51/q106 convention) queries BOTH ways — BM25
    over the train documents (q106's lexical path, top-10) and batch
    sign-LSH ANN over the embeddings (q103's dense path, top-10, with
    vec_id standing in for doc_id: the synthetic tables are id-aligned
    1:1, the usual doc↔embedding contract) — fused by reciprocal rank
    (1/(60+rank), k from the shared RRF_K), top-5 per query. The
    fusion itself is candidate-bounded: one full-outer join of two
    ≤10-row-per-query lists + one window, never the corpus."""
    from .operators import retrieval

    docs = _t(spark, sf_dir, "documents")
    lex = retrieval.bm25_more_like_this(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        ),
        k=10,
        max_df_ratio=retrieval.BM25_Q106_DF_RATIO,
    )
    emb = _emb(spark, sf_dir)
    # corpus-derived plane count, zero plan-construction jobs (dim
    # from the parquet footer, count as an in-plan broadcast scalar)
    buckets = similarity.lsh_bucket_auto(emb, dim=_emb_dim(sf_dir))
    dense = similarity.batch_ann_topk(
        buckets,
        buckets.filter(F.col("vec_id") % 97 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding", "lsh_bucket"
        ),
        k=10,
        broadcast_queries=False,
    ).withColumnRenamed("vec_id", "doc_id")
    return retrieval.rrf_fuse(lex, dense, k=5)


def q113_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes lang-id (operators.ml.
    naive_bayes_confusion): train on doc_id % 97 != 0 with the corpus
    ``lang`` labels, score the eval split, return the confusion
    matrix. The model is a (vocab × classes) dictionary-scale table —
    broadcastable at any corpus size; scoring is one postings⋈model
    join + a C-rows-per-doc argmax window."""
    from .operators import ml

    return ml.naive_bayes_confusion(_t(spark, sf_dir, "documents"))


def q114_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware ROC-AUC (operators.ml.roc_auc) of document length as
    a predictor of lang='en' — the scoring-rule-evaluation primitive
    (quality-classifier AUC at corpus scale). Rank statistic over the
    DISTINCT score values (cardinality-bounded window), never a
    global per-row sort."""
    from .operators import ml

    docs = _t(spark, sf_dir, "documents")
    return ml.roc_auc(docs, F.col("n_chars"), F.col("lang") == "en")


def q115_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared term-class association (operators.ml.chi2_terms):
    top-5 most lang-discriminative terms per language by document
    frequency — the feature-selection / slice-vocabulary scan. Three
    dictionary-scale aggregates, no dense (term × class) grid."""
    from .operators import ml

    return ml.chi2_terms(_t(spark, sf_dir, "documents"))


def q116_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency score (operators.ml.bigram_nll): corpus-
    trained add-k bigram model, per-doc mean NLL over STRICT adjacent
    token pairs — catches shuffled/templated word salad that q107's
    unigram NLL cannot see."""
    from .operators import ml

    return ml.bigram_nll(_t(spark, sf_dir, "documents"))


def q117_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud (operators.ml.
    pca_label_projection): distributed second-moment pass (shuffle =
    d² keys, the corpus never moves), driver-side power iteration on
    the rounded d×d covariance (bounded by dim², like the k-means
    centroid collect), distributed projection with per-label
    mean/variance — the drift/slice-separation scan."""
    from .operators import ml

    return ml.pca_label_projection(_emb(spark, sf_dir))


def q118_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (operators.retrieval.mmr_diversify):
    q112's dense ANN leg (4-plane sign-LSH, %97 queries, top-10)
    re-ranked by maximal marginal relevance to a diversified top-5 —
    the de-redundancy step between retrieval and a context window.
    Every post-ANN stage is candidate-bounded (≤10 rows per query);
    the greedy runs as a cogrouped Arrow-batched applyInPandas, one
    of the engine's documented Python stages."""
    from .operators import retrieval

    emb = _emb(spark, sf_dir)
    # corpus-derived plane count, zero plan-construction jobs (dim
    # from the parquet footer, count as an in-plan broadcast scalar)
    buckets = similarity.lsh_bucket_auto(emb, dim=_emb_dim(sf_dir))
    cand = similarity.batch_ann_topk(
        buckets,
        buckets.filter(F.col("vec_id") % 97 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding", "lsh_bucket"
        ),
        k=10,
        broadcast_queries=False,
    ).select(
        "query_id", F.col("vec_id").alias("doc_id"), F.col("cos_sim").alias("rel")
    )
    return retrieval.mmr_diversify(cand, emb, k=5)


def q119_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (operators.ml.calibration_bins): a
    pseudo-probability score ((n_chars mod 1000)/1000) against
    lang='en', 10 equal-width bins — the where-is-my-classifier-
    miscalibrated scan complementing q114's global AUC. One
    ≤10-key hash aggregate."""
    from .operators import ml

    docs = _t(spark, sf_dir, "documents")
    score = F.pmod(F.col("n_chars"), F.lit(1000)) / F.lit(1000.0)
    return ml.calibration_bins(docs, score, F.col("lang") == "en", bins=10)


def q120_ecdf_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-CDF annotation (operators.profile.ecdf_transform):
    every event's value mapped to its global and per-event-type CDF
    position — rank-based normalization without a per-row sort
    (distinct-value windows at 4dp resolution, the q114 discipline)."""
    from .operators import profile

    return profile.ecdf_transform(_t(spark, sf_dir, "events"))


def q121_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped market share: the 7-table join tree (lineitem
    ⋈ orders ⋈ customer ⋈ nation ⋈ region on the demand side,
    ⋈ supplier ⋈ nation on the supply side, ⋈ part for the segment
    filter) → per-(year, supplier-nation) revenue and share-of-year.
    Every dimension side is broadcast-sized; the only real shuffle is
    the final (year, nation) aggregate; the share window runs over
    years × nations (bounded). Reference parity: the widest
    join-planning shape its relational surface implies (SURVEY §2.3),
    exercised the way Catalyst should plan it — fact-table scans
    filtered and pruned, dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    asia_cust = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    nation["n_regionkey"] == region["r_regionkey"],
                ).select("n_nationkey")
            ),
            cust["c_nationkey"] == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), "n_name")),
        supp["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    rev = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(asia_cust, orders["o_custkey"] == asia_cust["c_custkey"])
        .join(F.broadcast(supp_nation), li["l_suppkey"] == supp_nation["s_suppkey"])
        .groupBy(
            F.year("o_orderdate").cast("int").alias("o_year"), "supp_nation"
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
        )
    )
    w = Window.partitionBy("o_year")
    return rev.select(
        "o_year",
        "supp_nation",
        F.round("__rev", 2).alias("revenue"),
        F.round(F.col("__rev") / F.sum("__rev").over(w), 6).alias("share"),
    )


def q122_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top-20 part pairs appearing in the
    same order (support counts) — the frequent-itemset primitive.
    The self-join is keyed on the basket id, so pair blowup is
    Σ C(|basket|,2) per order (TPC-H baskets are ≤7 items); a viral
    basket is AQE-skew territory, and the distinct() pre-pass
    guarantees a part counted once per basket. Shuffles: one distinct,
    one basket-keyed join, one pair aggregate, one bounded top-k.
    The top-20 cut is orderBy().limit() — TakeOrderedAndProject, a
    per-partition heap + 20-row merge — and the rank window runs over
    the 20 survivors only (the q94 pattern), never a single-partition
    sort of the pair dictionary, which grows ~quadratically with
    basket size."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b")
    )
    counts = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    top = counts.orderBy(F.desc("support"), "part_a", "part_b").limit(20)
    w = Window.orderBy(F.desc("support"), "part_a", "part_b")
    return top.select(
        "part_a",
        "part_b",
        "support",
        F.row_number().over(w).cast("int").alias("rank"),
    )


BOOTSTRAP_REPS = 60  # one bit per replicate from ONE 60-bit row hash


def q123_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic half-sample bootstrap CI for the per-type mean
    event value: 60 replicates whose memberships are the BITS of one
    salted 60-bit md5 per row (row r ∈ replicate b iff bit b of
    md5_hash60('boot:' || event_id) is set) — layout-independent,
    engine-replayable randomness at ONE digest per row instead of one
    per (row × replicate); each bit is an independent fair coin.
    Replicate means collapse to (type, replicate) keys with map-side
    combine; the CI is the 5th/95th percentile BY RANK over each
    group's ≤60 means (integer indices, no interpolation — nothing to
    drift). The explode is the CPU dial: B× cheap integer filters per
    row, shuffle still bounded by groups×B."""
    from .operators.dedup import md5_hash60

    ev = _t(spark, sf_dir, "events")
    base = ev.select("event_id", "event_type", "value").filter(
        F.col("value").isNotNull()
    )
    rep = (
        base.withColumn(
            "__h", md5_hash60(F.concat(F.lit("boot:"), F.col("event_id").cast("string")))
        )
        .select(
            "event_type",
            "value",
            "__h",
            F.explode(F.sequence(F.lit(0), F.lit(BOOTSTRAP_REPS - 1))).alias("b"),
        )
        .filter(F.expr("(shiftrightunsigned(__h, b) & 1) = 1"))
    )
    # Round each replicate mean to 6dp BEFORE the rank window: the
    # rank decides which replicate becomes ci_lo/ci_hi, and per-engine
    # fp summation order can leave two near-equal unrounded means one
    # ulp apart — rounding first makes ties land on the deterministic
    # b tie-break identically in Spark and the oracle.
    means = rep.groupBy("event_type", "b").agg(
        F.round(F.sum("value") / F.count(F.lit(1)), 6).alias("m")
    )
    wrk = Window.partitionBy("event_type").orderBy("m", "b")
    wall = Window.partitionBy("event_type")
    ranked = means.withColumn("rk", F.row_number().over(wrk)).withColumn(
        "n_b", F.count(F.lit(1)).over(wall)
    )
    lo_idx = F.greatest(F.lit(1), F.floor(F.col("n_b") * 0.05).cast("int"))
    hi_idx = F.least(F.col("n_b"), F.ceil(F.col("n_b") * 0.95).cast("int"))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n_b").alias("n_reps"),
            F.round(F.sum("m") / F.count(F.lit(1)), 6).alias("boot_mean"),
            F.round(F.max(F.when(F.col("rk") == lo_idx, F.col("m"))), 6).alias(
                "ci_lo"
            ),
            F.round(F.max(F.when(F.col("rk") == hi_idx, F.col("m"))), 6).alias(
                "ci_hi"
            ),
        )
        .select("event_type", "n_reps", "boot_mean", "ci_lo", "ci_hi")
    )


def q124_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level vocabulary overlap (operators.dedup.
    minhash_group_similarity): each source's distinct token set
    sketched to a 12-slot MinHash signature, every source pair's
    Jaccard estimated from slot agreement — the slice-redundancy map
    over data sources that doc-level dedup can't see. The pairwise
    stage is a |sources|² join of signature rows, never documents."""
    docs = _t(spark, sf_dir, "documents")
    elements = docs.select(
        "source", F.explode(fx.whitespace_tokens(F.lower(F.col("text")))).alias("term")
    ).distinct()
    return dedup.minhash_group_similarity(elements)


def q125_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped shipping priority: unshipped BUILDING-segment
    orders as of a cutoff date, ranked by outstanding revenue, top 10.
    Plan shape: both date filters are pushed to the parquet scans
    (orderdate < D prunes orders, shipdate > D prunes lineitem BEFORE
    either join), customer is reduced to a one-column key set by the
    segment filter before joining, and the top-10 is
    TakeOrderedAndProject — never a global sort. The ordering key is
    the 2dp-ROUNDED revenue (then orderkey): rounding first makes the
    cross-engine sort deterministic where raw double ULPs are not."""
    cutoff = F.to_timestamp(F.lit("1998-03-15"))
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    agg = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        agg.orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
    )


def q126_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped local supplier volume: revenue by nation for
    1997 ASIA orders where the supplier and customer share a nation.
    The c_nationkey = s_nationkey equality rides the join chain as a
    post-join filter on two broadcast-joined dimension columns; the
    year filter prunes the orders scan; region→nation→(customer,
    supplier) are all broadcast. The only fact-fact shuffle is
    lineitem⋈orders — exactly the one that would bucket-co-locate in
    a real deployment. Output is a ≤|nations|-row aggregate."""
    y0, y1 = F.to_timestamp(F.lit("1997-01-01")), F.to_timestamp(F.lit("1998-01-01"))
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= y0) & (F.col("o_orderdate") < y1)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("n_name", "revenue")
    )


def q127_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume customers: orders whose total
    quantity exceeds 300, with their customer. The HAVING pre-pass
    collapses lineitem to (orderkey, total_qty) with map-side combine
    and THEN filters — so the expensive joins see only the handful of
    qualifying orders (p99 basket qty is ~262 on this data; >300 is
    the selective tail). No top-k limit: the qualifying set IS the
    answer, and returning it all avoids double-tie sort hazards."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            F.col("l_orderkey").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("__qty", 2).alias("total_qty"),
        )
    )


def q128_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: customers ranked by
    revenue lost to returns (l_returnflag = 'R') on Q4-1997 orders,
    top 20 with their nation. The quarter filter prunes the orders
    scan and the flag filter prunes lineitem before the fact-fact
    join; nation is broadcast; the customer join shuffles on custkey
    because grouping BY customer is the semantics — that shuffle also
    serves the aggregate. Ordering: 2dp-rounded revenue then custkey
    (deterministic cross-engine), TakeOrderedAndProject."""
    q0, q1 = F.to_timestamp(F.lit("1997-10-01")), F.to_timestamp(F.lit("1998-01-01"))
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= q0) & (F.col("o_orderdate") < q1)
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    agg = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        agg.orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
            "revenue",
        )
    )


def q129_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations over the corpus (operators.text.
    pmi_collocations): strict adjacent pairs, pair-table marginals,
    min-count floor 5 — the phrase-discovery scan a tokenizer/
    vocabulary pipeline runs before merging multiword units."""
    return text.pmi_collocations(_t(spark, sf_dir, "documents"))


def q130_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 event-type trigram paths per the user timeline
    (operators.temporal.event_path_trigrams) — the sequence-mining
    primitive behind funnel discovery (q45 checks ONE known path;
    this finds which paths to check)."""
    from .operators.temporal import event_path_trigrams

    return event_path_trigrams(_t(spark, sf_dir, "events"))


def q131_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile of lineitem.l_suppkey (operators.profile.
    key_skew_audit): max-key share, top-10 concentration, entropy,
    Gini — the one-row scan that decides broadcast vs salt vs plain
    shuffle before any big join ships data."""
    from .operators.profile import key_skew_audit

    return key_skew_audit(_t(spark, sf_dir, "lineitem"), "l_suppkey")


def q132_cross_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-encoder-style second-stage rerank (operators.retrieval.
    cross_rerank): the q106 lexical top-10 ∪ q103 dense top-10
    candidate union per %97 eval query, re-scored by the pluggable
    pair scorer (default: token-set Jaccard of the FULL query and
    candidate texts — a genuine both-texts-at-once function, JVM
    builtins only), top-5 per query. Completes the retrieval stack's
    production shape: retrieve (q106/q103) → fuse (q112) → rerank
    (q132) → diversify (q118). Every post-retrieval stage is
    candidate-bounded; the corpus text attaches through ONE broadcast
    hash join where the corpus side streams."""
    from .operators import retrieval

    docs = _t(spark, sf_dir, "documents")
    lex = retrieval.bm25_more_like_this(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        ),
        k=10,
        max_df_ratio=retrieval.BM25_Q106_DF_RATIO,
    )
    emb = _emb(spark, sf_dir)
    # corpus-derived plane count, zero plan-construction jobs (dim
    # from the parquet footer, count as an in-plan broadcast scalar)
    buckets = similarity.lsh_bucket_auto(emb, dim=_emb_dim(sf_dir))
    dense = similarity.batch_ann_topk(
        buckets,
        buckets.filter(F.col("vec_id") % 97 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding", "lsh_bucket"
        ),
        k=10,
        broadcast_queries=False,
    ).withColumnRenamed("vec_id", "doc_id")
    cand = lex.select("query_id", "doc_id").unionByName(
        dense.select("query_id", "doc_id")
    )
    return retrieval.cross_rerank(
        cand,
        docs,
        docs.filter(F.col("doc_id") % 97 == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        ),
        k=5,
    )


def q133_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (operators.sampling.dsir_importance):
    the %97 eval split plays the TARGET distribution, the rest is the
    RAW pool; every raw doc scores Σ tf·(ln p_target − ln p_raw) under
    add-one-smoothed unigram LMs over the union vocabulary, top-20 by
    per-token importance. Dictionary-scale LM join, bounded scalars,
    TakeOrderedAndProject cut — the corpus never collects."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.dsir_importance(docs, F.col("doc_id") % 97 == 0)


def q134_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mix (operators.sampling.
    temperature_mixture, T=2): p_s ∝ n_s^(1/2) over per-source token
    counts, with effective-epoch accounting at a 1M-token budget —
    the UniMax/Pile sampling-weight recipe, computed (unlike q42,
    which APPLIES given weights) from the corpus itself. One
    dictionary aggregate + a 1-row broadcast normalizer."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.temperature_mixture(docs)


def q135_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook audit (operators.similarity.
    pq_codebook_stats, PQ_CONFIG = 4 subspaces × 8 codes): per-
    (subspace, code) occupancy and mean squared distortion — the
    embedding-store compression decision table. Fit is driver-side on
    one bounded sample (the q30 FAISS discipline); assignment is one
    map-only corpus pass against the broadcast codebook tensor; stats
    are an m·k-key aggregate."""
    return similarity.pq_codebook_stats(_emb(spark, sf_dir))


def q136_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty / memorization audit (operators.
    dedup.ngram_novelty, distinct 5-gram shingles): the fraction of a
    doc's shingles that appear in ≥2 corpus documents — the
    fragmentary-duplication lens exact/MinHash dedup misses. One
    shingle-keyed aggregate + exchange-reusing join; no windows."""
    from .operators.dedup import ngram_novelty

    return ngram_novelty(_t(spark, sf_dir, "documents"))


def q137_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-level referential-integrity audit (operators.validate.
    fk_audit): orphan counts for the doc↔embedding 1:1 contract (both
    directions) and the orders→customer / lineitem→orders foreign
    keys — the cross-table companion to q65's single-table
    constraints. One left-anti join + two 1-row aggregates per
    relationship."""
    from .operators.validate import fk_audit

    docs = _t(spark, sf_dir, "documents")
    emb = _emb(spark, sf_dir)
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    return fk_audit(
        [
            ("doc_to_emb", docs, "doc_id", emb, "vec_id"),
            ("emb_to_doc", emb, "vec_id", docs, "doc_id"),
            ("order_to_cust", orders, "o_custkey", cust, "c_custkey"),
            ("item_to_order", li, "l_orderkey", orders, "o_orderkey"),
        ]
    )


def q138_join_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-strategy advisor (operators.relational.
    join_advisor): per join pair, both sides' non-null-key row counts
    + heaviest-key shares → broadcast / salted_shuffle / shuffle_hash
    recommendation — the decision table you run BEFORE shipping a
    100 TB join. One key aggregate per side, no joins, no windows."""
    from .operators.relational import join_advisor

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    cust = _t(spark, sf_dir, "customer")
    docs = _t(spark, sf_dir, "documents")
    emb = _emb(spark, sf_dir)
    return join_advisor(
        [
            ("item_x_order", li, "l_orderkey", orders, "o_orderkey"),
            ("item_x_part", li, "l_partkey", part, "p_partkey"),
            ("order_x_cust", orders, "o_custkey", cust, "c_custkey"),
            ("doc_x_emb", docs, "doc_id", emb, "vec_id"),
        ]
    )


def q139_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup (operators.dedup.exact_substring_dedup, Lee
    et al. 2022): REMOVE every duplicated run of >= 15 consecutive
    tokens corpus-wide (first occurrence kept, min (doc_id, pos)
    election) and rebuild each document from its surviving tokens —
    the primitive that completes the dedup family (q16 whole-doc,
    q17/q24 near-doc, q77 fixed segments, q136 flags-but-cannot-excise).

    Scale shape: sliding windows explode to one md5 per token position
    (the run text never travels), ONE hash-shuffle election window,
    per-doc position fold, codegen token filter. Production run length
    is 50 BPE tokens; 15 exercises removals on this corpus."""
    return dedup.exact_substring_dedup(_t(spark, sf_dir, "documents"))


def q140_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE inference twin of q109's training round (plans.bpe.
    bpe_encode): apply the fixed BPE_FIXED_MERGES list in order via
    the pure-codegen greedy fold, then report per-document token
    accounting — (doc_id, n_words, n_tokens, fertility 6dp), fertility
    = tokens/word, the tokenizer-quality dial a corpus mix is tuned
    against. Encoding is DICTIONARY work (the distinct-word table,
    Heaps' law), never corpus work; the corpus only joins the
    word→token-count dictionary back on the word key."""
    from .plans.bpe import BPE_FIXED_MERGES, bpe_encode

    return bpe_encode(_t(spark, sf_dir, "documents"), BPE_FIXED_MERGES)


def q141_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC search over the PQ-encoded corpus (operators.similarity.
    pq_search): the retrieval half of the q135 compression loop —
    corpus represented ONLY by its m one-byte codes (dim·4 → m bytes
    per vector), queries keep exact vectors, distance = Σ per-subspace
    sqdist(query slice, assigned centroid). Query batch = the 5
    smallest-id valid vectors (broadcast); one map-only encode pass +
    one projection of the ADC terms + a per-query bounded rank window.
    At real scale, route each query through an IVF stage (q30) first
    so it scores one probe list, not the corpus."""
    return similarity.pq_search(_emb(spark, sf_dir))


def q142_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of PQ ADC search vs the exact squared-euclidean top-k
    (operators.similarity.pq_recall_audit) — the retrieval-quality
    price of the m-byte representation, the number that decides
    compress-or-don't (q135 prices distortion, q141 runs the search,
    this closes the audit). Two corpus-streaming scored passes, two
    bounded rank windows, one candidate-bounded join."""
    return similarity.pq_recall_audit(_emb(spark, sf_dir))


def q143_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (operators.similarity.
    matryoshka_recall): recall@k of prefix-d cosine top-k (d = 8, 16,
    32) against full-dim top-k — how short the vectors can get before
    retrieval degrades. ONE corpus pass scores every prefix + the full
    dim in a single projection; ranks are per-(prefix, query) bounded
    windows; the vector store shrinks by dim/d if recall holds."""
    return similarity.matryoshka_recall(_emb(spark, sf_dir))


def q144_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence from the corpus LM
    (operators.sampling.source_kl_divergence) — the which-source-is-
    an-outlier audit for mixture design, complementary to q133 (DSIR
    scores documents against a target, this scores sources against
    the pool) and q134 (which weights by SIZE, blind to content).
    Full-vocab sum with the absent-term block collapsed to a closed
    form — everything after one tokenize is dictionary work."""
    return sampling.source_kl_divergence(_t(spark, sf_dir, "documents"))


def q145_distribution_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-matching downsample audit (operators.sampling.
    distribution_match_sample): derive per-bucket acceptance rates
    that keep the LARGEST deterministic subset matching a target
    length mixture (short/medium/long = 25/50/25), then report
    realized kept counts under the layout-independent salted-hash
    membership — q39 samples at GIVEN rates, this computes them from
    the mixture. Dictionary-scale aggregates + broadcast rates; the
    corpus never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.when(F.col("n_chars") < 150, "short")
        .when(F.col("n_chars") < 350, "medium")
        .otherwise("long")
    )
    return sampling.distribution_match_sample(
        docs, bucket, {"short": 0.25, "medium": 0.5, "long": 0.25}
    )


def q146_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio half of the multimodal plumbing (the q29 twin): opaque
    binary payload → Arrow-batched mapInPandas → per-clip feature rows.
    Runs the DEFAULT deterministic stub kernel — payload-derived, fully
    replayable in SQL, so this has a real DuckDB oracle; the REAL
    RIFF/WAVE PCM kernel (stdlib wave/array, r7) keeps its exact-value
    tests in tests/test_multimodal.py (generated WAV bytes can't live
    in an oracle). Projects the env array head to a hashable scalar,
    same canonicalizer discipline as q29."""
    from .operators import multimodal

    media = multimodal.synthetic_media(spark, n=300, partitions=4)
    feats = multimodal.audio_features(media)
    return feats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        F.round("duration_sec", 6).alias("duration_sec"),
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
        F.round("zcr", 6).alias("zcr"),
        # env is array<float>: round in DOUBLE — 0.427451 has no exact
        # float32 representation, so a float-typed round re-widens to
        # 0.4274510145... in the canonicalizer and hash-mismatches
        F.round(F.element_at("env", 1).cast("double"), 6).alias("env0"),
    )


def q147_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-routed ADC search (FAISS IVF-PQ shape) — the r6-verdict's
    option (a) made a first-class registry op: q141 bounds the reduce
    side with the salted cut; this ALSO bounds the map side by scoring
    only the nprobe probed inverted lists per query. One corpus pass
    computes PQ codes + IVF list together; the candidate join is a
    broadcast equi-join on the list id. Oracle replays quantizer fit
    (q30's bounded-sample Lloyd CTEs), per-subspace PQ fit (q135's),
    probe routing, and the candidate-restricted ADC top-k."""
    from .operators.similarity import ivf_pq_search

    return ivf_pq_search(_emb(spark, sf_dir))


def q148_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of IVF-routed ADC (q147) vs the exact euclidean top-k
    — the ROUTING-LOSS dial: q142's recall minus this one is what
    nprobe routing costs on top of PQ quantization (raise nprobe until
    they match, then stop paying for more lists)."""
    from .operators.similarity import ivf_pq_recall_audit

    return ivf_pq_recall_audit(_emb(spark, sf_dir))


def q149_charset_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source charset/shape audit (ftfy-class detection as codegen
    regexes): mojibake / control-char / U+FFFD / non-ASCII doc flags +
    ALL-CAPS and all-digit token fractions. One scan, |sources|-row
    shuffle."""
    from .operators.text import charset_audit

    return charset_audit(_t(spark, sf_dir, "documents"))


def q150_embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health profile (dead/degenerate
    dimension audit): count, mean, population std, min/max, exact zero
    fraction per 1-based dim. One posexplode scan into a dim-keyed
    map-side-combining aggregate."""
    from .operators.profile import embedding_dim_profile

    return embedding_dim_profile(_emb(spark, sf_dir))


def q151_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy (Ethayarajh 2019): expected pairwise
    cosine of unit vectors = ||mean(û)||² — the n² pairwise mean in
    closed form via one per-dim mean pass. Degenerate-space dial before
    building any index."""
    from .operators.similarity import anisotropy_audit

    return anisotropy_audit(_emb(spark, sf_dir))


def _verified_dup_pairs(docs: DataFrame) -> DataFrame:
    """The q38 verified near-dup edge list (shingle → MinHash-LSH
    candidates → exact Jaccard ≥ 0.5), shared by the cluster-consuming
    queries (q153/q154) so their oracles replay ONE well-tested CTE."""
    sets = dedup.shingle_sets(docs).persist()
    bands = dedup.minhash_bands(docs, sets=sets)
    cand = dedup.minhash_candidate_pairs(bands)
    return (
        dedup.ngram_jaccard_pairs(docs, cand, sets=sets)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )


def q152_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing / MOSS fingerprint overlap pairs (operators.dedup.
    winnow_overlap_pairs): robust-winnowed k-gram digests (guaranteed
    hit for any shared run of ≥ w+k-1 tokens, density 2/(w+1)), df-cut
    fingerprint self-join, shared-count + fingerprint-jaccard per
    pair — the fuzzy-substring dup detector between MinHash (whole
    doc) and ExactSubstr (exact runs)."""
    from .operators.dedup import winnow_overlap_pairs

    return winnow_overlap_pairs(_t(spark, sf_dir, "documents"))


def q153_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split audit (operators.sampling.
    cluster_safe_split): whole dup clusters (q38's verified closure)
    are assigned to one split by a salted hash of the cluster
    representative, and the cross-split near-dup pair count is
    MEASURED against the final assignment (0 by construction — the
    leakage q71 can only detect, prevented)."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.cluster_safe_split(docs, _verified_dup_pairs(docs))


def q154_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup accounting (operators.sampling.soft_dedup_weights):
    weight every doc 1/|dup cluster| so each distinct content unit
    contributes 1 — per-source raw vs effective doc counts and the
    dedup ratio that corrects mixture shares (q42/q145 consume)."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.soft_dedup_weights(docs, _verified_dup_pairs(docs))


def q155_standardization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization what-if (operators.similarity.
    standardization_audit): anisotropy of the raw space vs the
    mean-centered / std-scaled space in one row — does whitening-lite
    fix the cone collapse q151 measures? Fully relational (exploded
    rows + broadcast d-row stats), no corpus-scale sorts."""
    from .operators.similarity import standardization_audit

    return standardization_audit(_emb(spark, sf_dir))


def q156_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators.similarity.hard_negative_
    mining): per anchor (every 100th id, q103's convention) the top-3
    most-similar DIFFERENT-label vectors — the contrastive-training
    pairs that actually move the loss. Bounded anchor broadcast +
    salted two-phase top-k."""
    from .operators.similarity import hard_negative_mining

    return hard_negative_mining(_emb(spark, sf_dir))


def q157_adaptive_quality_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive quality filter (operators.sampling.
    adaptive_quality_cutoff): drop each group's worst 10% by quality
    score with the cutoff from the group's own quantized-score count
    histogram — exact-integer type-1 quantile, corpus collapses to a
    bounded histogram before any ordered window."""
    return sampling.adaptive_quality_cutoff(_t(spark, sf_dir, "documents"))


def q158_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (operators.text.chunk_documents): 64-token
    windows, 16-token overlap, per-chunk md5 fingerprint — the RAG /
    context-prep step; map-side only (one narrow posexplode, zero
    shuffles)."""
    from .operators.text import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"))


def q159_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped bilateral trade volume: revenue shipped between
    a nation PAIR (both directions) by ship year. The classic
    two-dimension join tree: both nation legs and the filtered
    supplier/customer key sets broadcast; lineitem⋈orders carries the
    only big shuffle; the date filter pushes to the lineitem scan."""
    pair = ("NATION_1", "NATION_2")
    n1 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(n1.select(F.col("n_nationkey").alias("__nk2"), F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("__nk2"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("ship_year")
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q160_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped order-priority check, adapted to this schema
    (no l_commitdate: "late" = shipped > 60 days after order date):
    orders from one quarter that had at least one late line item,
    counted by priority — the LEFT SEMI join shape (EXISTS), the one
    classic join strategy q35's NOT-EXISTS anti-join family didn't
    cover. One hash semi-join on the order key with the lateness
    comparison as the join residual; the quarter filter pushes to the
    orders scan."""
    lo = F.to_timestamp(F.lit("1996-04-01"))
    hi = F.to_timestamp(F.lit("1996-07-01"))
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q161_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual kNN pairs (operators.similarity.mutual_knn_pairs): edges
    where each endpoint is in the OTHER's top-4 within the q103 LSH
    bucket structure — the reciprocity filter that kills hubness
    artifacts; kNN list built once (every vector a query,
    non-broadcast bucket join), then one edge-list self-join. The
    plane count is corpus-derived (planes="auto", the r7-verdict lead
    item): candidate scoring is ~n·target_bucket_rows instead of the
    n²/16 the old fixed 4-plane dial cost; dim comes from the parquet
    footer so building the plan launches no Spark job."""
    from .operators.similarity import mutual_knn_pairs

    emb = _emb(spark, sf_dir)
    return mutual_knn_pairs(emb, k=4, planes="auto", dim=_emb_dim(sf_dir))


def q162_exact_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size per-group sample (operators.sampling.exact_group_
    sample): exactly min(30, n) docs per language by salted-hash order
    — the eval-set contract Bernoulli sampling only meets in
    expectation; per-group cut via the salted two-phase top-k."""
    return sampling.exact_group_sample(_t(spark, sf_dir, "documents"))


def q163_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration (operators.dedup.minhash_
    calibration): signature-estimated vs exact Jaccard over the LSH
    candidate pairs, binned by exact deciles — the is-K-hashes-enough
    audit (the dedup counterpart of q142's PQ recall)."""
    from .operators.dedup import minhash_calibration

    return minhash_calibration(_t(spark, sf_dir, "documents"))


def q164_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL streaming gate entry (streaming/gate.py — r7-verdict
    item 5): readStream over the replayable synthetic_events Python
    data source, a complete-mode streaming aggregation, writeStream →
    memory sink under trigger(availableNow=True), restarted from the
    same checkpoint until the capped offset is drained. The returned
    DataFrame is the final state table; the oracle replays it in
    closed form over generate_series because source rows are a pure
    md5 function of event_id — so this is the one registry row whose
    execution path is micro-batch planning + state store, not a batch
    twin. ``sf_dir`` is unused (the source is the generator, not the
    testdata) but kept for the registry signature."""
    from .streaming.gate import stream_event_rollup

    return stream_event_rollup(spark)


def q165_banded_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-OR mutual kNN (operators.similarity.banded_mutual_knn):
    two INDEPENDENT auto-dialed LSH bucketings (plane seeds 0/1)
    each propose in-bucket candidates, the union is scored once, then
    q161's reciprocal top-4 filter. The recall amplifier for the
    corpus-derived occupancy dial: a pair sliced by one plane set
    survives in the other (miss probability decays geometrically in
    bands) while candidate volume stays ~bands·n·target — linear."""
    from .operators.similarity import banded_mutual_knn

    emb = _emb(spark, sf_dir)
    return banded_mutual_knn(emb, k=4, bands=2, dim=_emb_dim(sf_dir))


def q166_cc_twostar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by alternating large-star/small-star
    (operators.dedup.cc_two_star, Kiveris et al. SoCC'14) over the q38
    verified near-dup pair graph — the all-DataFrame CC strategy whose
    round count is O(log²n) regardless of component DIAMETER, where
    min-label propagation pays one join per diameter hop (a chain-
    shaped dup cluster at 100 TB = a scheduler stall). Same output
    contract as q38 (min-id cluster, size, representative), so the
    recursive-CTE oracle replays both."""
    docs = _t(spark, sf_dir, "documents")
    sets = dedup.shingle_sets(docs).persist()
    bands = dedup.minhash_bands(docs, sets=sets)
    cand = dedup.minhash_candidate_pairs(bands)
    verified = (
        dedup.ngram_jaccard_pairs(docs, cand, sets=sets)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    return dedup.cc_two_star(verified)


def q167_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promotion effect: per ship month of H1-1996,
    the % of discounted revenue from PROMO-type parts. Narrow dim side
    (part is |parts|-row) broadcasts; the lineitem date filter pushes
    to the scan, so the join input is one scan-pruned pass."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.month("l_shipdate").cast("int").alias("ship_month"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q168_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval-set decontamination (operators.similarity.
    semantic_decontamination): max cosine of every corpus vector
    against the broadcast eval slice (id % 199 == 0 — eval sets are
    fixed-size artifacts, so the corpus side streams map-side, linear),
    flagged at the 6dp-rounded 0.30 threshold, rolled up per label.
    The semantic complement of q51's n-gram decontamination — the scan
    paraphrased leakage actually requires."""
    from .operators.similarity import semantic_decontamination

    return semantic_decontamination(_emb(spark, sf_dir))


def q169_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive predicate join: lineitem ⋈
    broadcast(part) under an OR-of-ANDs mixing columns from BOTH
    sides — the shape that exercises Catalyst's CNF conversion (the
    part-only / lineitem-only conjuncts of each disjunct are pushed
    below the join; the residual cross-side OR evaluates post-join).
    One-row global aggregate out."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type", "p_size")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    pred = (
        (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 30))
    )
    return joined.filter(pred).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q170_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped supplier diversity: distinct suppliers per
    (brand, type), EXCLUDING suppliers in bad standing (s_acctbal < 0)
    via a broadcast anti-join — the NOT-IN decorrelation shape. The
    count-distinct is the real shuffle (two-phase hash agg on
    (brand, type, suppkey)); the anti-join side is |bad suppliers|-row
    and broadcasts."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), on="l_suppkey", how="left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q171_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped top supplier: per-supplier Q1-1996 revenue,
    keep the supplier(s) hitting the global max — the scalar-subquery
    decorrelation shape. The max arrives as a broadcast ONE-ROW
    aggregate joined back (the allowlisted keyless-agg BNLJ pattern),
    so nothing corpus-scale ever sorts; comparison is on the 2dp-
    rounded revenue (the cross-engine double-sum convention)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("total_revenue"),
        )
    )


def q172_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit (operators.text.token_fertility):
    BPE-ish pieces per whitespace word, by language — the multilingual
    tokenizer-fairness diagnostic (2× fertility = 2× context budget
    per word, so document-space mixture weights under-represent the
    language in token space). One scan, |langs|-row aggregate."""
    return text.token_fertility(_t(spark, sf_dir, "documents"))


def q173_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail perplexity thirds per language
    (operators.text.perplexity_buckets): corpus unigram NLL (q107's
    proxy) quantized onto a histogram, integer-third boundaries on the
    cumulative counts — the no-corpus-sort version of CCNet's
    bucketing, per-(lang, bucket) funnel out."""
    return text.perplexity_buckets(_t(spark, sf_dir, "documents"))


def q174_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra (operators.sketches.kmv_set_ops):
    distinct users who clicked, purchased, either (pooled-union
    sketch), and BOTH via inclusion–exclusion — the mergeable-sketch
    answer to distinct-intersection that never shuffles the key
    universe. One row."""
    from .operators.sketches import kmv_set_ops

    return kmv_set_ops(
        _t(spark, sf_dir, "events"),
        key="user_id",
        set_col="event_type",
        set_a="click",
        set_b="purchase",
    )


def q175_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped sole-blame analysis: per supplier, the number
    of multi-supplier orders where THEIR lineitem was the only late
    one (shipped > 60 days after order date — this schema's q160
    lateness rule). The EXISTS + NOT-EXISTS double correlation of Q21
    decorrelates into one (order, supplier)-level aggregate + one
    order-level aggregate + a join — two hash shuffles on the
    lineitem join key, no self-BNLJ anywhere."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
                ).cast("int")
            ).alias("__is_late")
        )
    )
    per_order = late.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_supp"), F.sum("__is_late").alias("__n_late")
    )
    return (
        late.join(per_order, on="l_orderkey")
        .filter(
            (F.col("__is_late") == 1)
            & (F.col("__n_supp") >= 2)
            & (F.col("__n_late") == 1)
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("n_sole_late_orders"))
    )


def q176_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped important-stock scan: parts whose total traded
    value (Σ price·qty) exceeds 1.5× the mean part value — the
    scalar-subquery-over-the-same-aggregate decorrelation, realized as
    a broadcast ONE-ROW aggregate joined back (the allowlisted
    keyless-agg pattern; nothing re-scans and nothing sorts). The
    threshold is RELATIVE (×mean), so the query is scale-free where
    Q11's fixed fraction empties out as the part universe grows; the
    comparison runs in exact integer cents (2·cents·n > 3·Σcents) —
    a float threshold on a double sum flips membership on
    cross-engine last-ulp noise."""
    li = _t(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_partkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")) * 100, 0)
            .cast("bigint")
            .alias("__cents")
        )
    )
    tot = pv.agg(
        F.sum("__cents").cast("decimal(38,0)").alias("__total_cents"),
        F.count(F.lit(1)).alias("__n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("__cents").cast("decimal(38,0)") * 2 * F.col("__n_parts")
            > F.col("__total_cents") * 3
        )
        .select(
            "l_partkey",
            (F.col("__cents") / 100.0).alias("part_value"),
        )
    )


def q177_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink → source round-trip: documents serialized to
    line-delimited JSON (`to_json` struct per line, the interchange
    format every ingestion pipeline speaks), written, read back with
    an EXPLICIT schema (schema inference on JSON is a full extra pass
    at 100 TB — never in a pipeline), and audited per source:
    row count, distinct ids, char totals. The oracle computes the
    same audit straight off the parquet — a lossy round-trip (dropped
    rows, mangled nulls, re-typed columns) diverges immediately."""
    import hashlib
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"bdhrs_jsonl_roundtrip_{tag}")
    (
        docs.select(
            F.to_json(
                F.struct("doc_id", "text", "lang", "source", "n_chars")
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars int"
    ).json(path)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("doc_id").alias("n_ids"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).cast("bigint").alias("total_chars"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).cast("bigint").alias(
            "total_text_len"
        ),
    )


def q178_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (plans.graph.kcore_peel): iterative peeling
    of the SPARSE slice of the part-supplier graph (lineitems with
    quantity ≤ 2) to its 3-core — the graph-curation primitive that
    isolates the densely-connected subgraph. One degree aggregate +
    two semi-joins per round on a monotonically shrinking edge list;
    the oracle replays exactly max_rounds unrolled peels (idempotent
    at the fixpoint)."""
    from .plans.graph import kcore_peel

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 2)
    edges = li.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    return kcore_peel(edges, k=3, max_rounds=20)


def q179_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted near-dup verification (operators.dedup.
    idf_weighted_jaccard_pairs): the q17 LSH candidates re-scored with
    ln(N/df) shingle weights, so template/boilerplate shingles stop
    manufacturing near-dups — the web-corpus fix plain Jaccard needs.
    Candidate-bounded joins only; df table is one aggregate over the
    exploded shingle stream the pipeline already builds."""
    docs = _t(spark, sf_dir, "documents")
    sets = dedup.shingle_sets(docs).persist()
    bands = dedup.minhash_bands(docs, sets=sets)
    cand = dedup.minhash_candidate_pairs(bands)
    return dedup.idf_weighted_jaccard_pairs(docs, cand, sets=sets).filter(
        F.col("weighted_jaccard") >= 0.3
    )


def q180_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-window EWMA smoothing per user (5-event lookback,
    α=0.5): the time-series denoiser for event-stream features. Pure
    lag-window arithmetic (5 lag() terms + null-aware renormalization)
    — one window per user, no UDF, no unbounded state; the recursive
    EWMA is deliberately truncated at 5 terms (weight 1/32 ≈ gone) so
    the operator is a fixed-size window, replayable in any engine."""
    # µs ordering, not ns: the oracle reads raw parquet where DuckDB's
    # epoch_us truncates any ns component — same-µs ties must break on
    # event_id in BOTH engines (the q74 convention)
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts_ns DIV 1000").alias("__ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("__ts_us", "event_id")
    q = 0.5
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i in range(5):
        v = F.col("value") if i == 0 else F.lag("value", i).over(w)
        wt = F.lit(q**i)
        num = num + F.when(v.isNotNull(), v * wt).otherwise(F.lit(0.0))
        den = den + F.when(v.isNotNull(), wt).otherwise(F.lit(0.0))
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round("value", 4).alias("value"),
            F.when(den > 0, F.round(num / den, 4)).alias("ewma5"),
        )
    )


def q181_negative_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-edge sampling for link-prediction
    training data: for every part (src node), one hash-picked supplier
    that it has NO lineitem with — the non-edge class a link predictor
    trains against. The supplier dictionary is dimension-sized: its
    row_number index is a broadcast-scale window and the candidate
    join is an equi-join on the hash-derived index; real edges are
    removed with one anti-join. Per-node determinism comes from the
    salted 60-bit md5 (the sampling-family primitive), so the oracle
    replays every pick."""
    from .operators.sampling import hash_uniform

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey")
    n_supp = supp.agg(F.count(F.lit(1)).alias("__ns"))
    indexed = supp.select(
        "s_suppkey",
        (F.row_number().over(Window.orderBy("s_suppkey")) - 1).alias("__idx"),
    )
    parts = li.select(F.col("l_partkey").alias("src")).distinct()
    picked = (
        parts.crossJoin(F.broadcast(n_supp))
        .select(
            "src",
            F.floor(hash_uniform(F.col("src"), "negedge:") * F.col("__ns"))
            .cast("int")
            .alias("__idx"),
        )
        .join(F.broadcast(indexed), on="__idx")
        .select("src", F.col("s_suppkey").alias("dst"))
    )
    real = li.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    ).distinct()
    return picked.join(real, on=["src", "dst"], how="left_anti")


def q182_dup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: the q17 verified near-dup
    pairs (exact Jaccard ≥ 0.5 over LSH candidates) rolled up by
    (source_a, source_b) — the curation diagnostic that tells you
    WHICH feeds re-publish each other (dedup within a crawl vs dedup
    across mirrored feeds are different policies). Pair-bounded joins
    + a |sources|²-row aggregate."""
    docs = _t(spark, sf_dir, "documents")
    sets = dedup.shingle_sets(docs).persist()
    bands = dedup.minhash_bands(docs, sets=sets)
    cand = dedup.minhash_candidate_pairs(bands)
    verified = (
        dedup.ngram_jaccard_pairs(docs, cand, sets=sets)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    src = docs.select("doc_id", "source")
    labeled = (
        verified.join(
            src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa")),
            on="id_a",
        )
        .join(
            src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb")),
            on="id_b",
        )
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
    )
    return labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_dup_pairs")
    )


def q183_matched_controls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-matched control pairing: for each document from the
    TREATED source ('src0'), the lowest-id SAME-QUALITY-BUCKET doc
    from the CONTROL source ('src1') — the propensity-style matching
    step an ablation ("did source X help?") needs so the comparison
    set has the same quality profile. Scores quantize to a 2dp bucket
    (the q157 histogram trick), controls collapse to ONE min-id row
    per bucket BEFORE the join (|buckets|-row build side, broadcast),
    so the match is an equi-join, never a nearest-neighbor sort."""
    scored = text.quality_features(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        F.floor(F.col("quality_score") * 100 + 1e-7).cast("bigint").alias("__qb"),
    )
    treated = scored.filter(F.col("source") == "src0").select(
        F.col("doc_id").alias("treated_id"), "__qb"
    )
    controls = (
        scored.filter(F.col("source") == "src1")
        .groupBy("__qb")
        .agg(F.min("doc_id").alias("control_id"))
    )
    return (
        treated.join(F.broadcast(controls), on="__qb")
        .select(
            "treated_id",
            "control_id",
            (F.col("__qb") / 100.0).alias("quality_bucket"),
        )
    )


def q184_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-type mean
    event value — the one-pass distributed bootstrap (Chamandy et al.,
    Google): each row joins B=32 replica ids and contributes with a
    DETERMINISTIC hash-derived Poisson(1) weight, so no replica ever
    materializes a resampled dataset; replica means collapse map-side
    and the CI is the [2.5%, 97.5%] span of the 32 means via the
    nearest-rank rule on exact integer ranks. Everything is salted-md5
    + a CASE inverse-CDF ladder — any engine replays it bit-exactly.

    The fact side is spread before the ×B replica expansion: a
    single-split events scan would evaluate all |events|·B salted
    md5s in ONE task (guide §2.5 — 30× CPU under-use on local[32];
    guarded no-op at real scale where file splits parallelize)."""
    ev = fx.spread_small_input(
        _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    )
    B = 32
    reps = spark.range(B).select(F.col("id").cast("int").alias("__rep"))
    u = F.col("__u")
    # Poisson(1) inverse CDF: P(0)=.3679 P(≤1)=.7358 P(≤2)=.9197
    # P(≤3)=.9810 P(≤4)=.9963 else 5
    pois = (
        F.when(u < 0.36787944117144233, 0)
        .when(u < 0.7357588823428847, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .when(u < 0.9963401531726563, 4)
        .otherwise(5)
    )
    from .operators.sampling import hash_uniform

    weighted = (
        ev.select("event_id", "event_type", "value")
        .crossJoin(F.broadcast(reps))
        .select(
            "event_type",
            "__rep",
            "value",
            hash_uniform(
                F.concat(F.col("event_id").cast("string"), F.lit(":"), F.col("__rep")),
                "boot:",
            ).alias("__u"),
        )
        .select("event_type", "__rep", "value", pois.alias("__w"))
    )
    means = (
        weighted.groupBy("event_type", "__rep")
        .agg(
            F.sum(F.col("value") * F.col("__w")).alias("__vw"),
            F.sum("__w").alias("__sw"),
        )
        # an all-zero-weight replica resampled no rows: no mean — and
        # the guard must be on Σw, not null-ness (0.0/0 is NaN, which
        # isNotNull keeps)
        .filter(F.col("__sw") > 0)
        .select("event_type", "__rep", (F.col("__vw") / F.col("__sw")).alias("__mean"))
    )
    w = Window.partitionBy("event_type").orderBy("__mean")
    ranked = means.select(
        "event_type",
        "__mean",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("__nb"),
    )
    # nearest-rank CI bounds: lo = ceil(0.025·B), hi = ceil(0.975·B)
    return (
        ranked.groupBy("event_type")
        .agg(
            F.round(F.avg("__mean"), 4).alias("boot_mean"),
            F.round(
                F.min(F.when(F.col("__rn") == F.ceil(F.col("__nb") * 0.025).cast("int"), F.col("__mean"))),
                4,
            ).alias("ci_lo"),
            F.round(
                F.min(F.when(F.col("__rn") == F.ceil(F.col("__nb") * 0.975).cast("int"), F.col("__mean"))),
                4,
            ).alias("ci_hi"),
        )
    )


def q185_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling bars: per (event_type, hour), the open / high /
    low / close of `value` — the time-series downsampling shape every
    metrics store needs. Open/close are min/max over a STRUCT ordered
    by (ts_us, event_id, value): one hash aggregate, total order, no
    window sort; the value rides as the struct's last field and ties
    on the time key break on event_id in both engines."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bar_hour"),
            F.expr("ts_ns DIV 1000").alias("__ts_us"),
            "event_id",
            "value",
        )
    )
    key = F.struct("__ts_us", "event_id", F.col("value").alias("v"))
    return ev.groupBy("event_type", "bar_hour").agg(
        F.round(F.min(key).getField("v"), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.max(key).getField("v"), 4).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q186_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: declared `lang` × q21's heuristic
    prediction — the label-quality audit that tells you whether a
    source's language metadata can be trusted before mixture weights
    key on it. One scan, |langs×classes|-row aggregate."""
    pred = text.lang_id_heuristic(_t(spark, sf_dir, "documents"))
    return pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def q187_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-style noisy counts: per-language doc counts + seeded Laplace
    noise (ε=1, sensitivity 1 → scale b=1) — the release-safe
    aggregate a privacy pipeline publishes instead of raw counts. The
    "noise" is DETERMINISTIC (salted-hash uniform → inverse-CDF
    Laplace) so the oracle replays it bit-for-bit; a production run
    swaps the salt for a secret per-release seed — the mechanism,
    sensitivity bound, and post-processing are what this op pins.
    |langs|-row aggregate; noise is O(groups) work."""
    from .operators.sampling import hash_uniform

    counts = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    u = hash_uniform(F.col("lang"), "dp:")
    # Laplace(b=1) inverse CDF on u∈(0,1): -sign(u-.5)·ln(1-2|u-.5|),
    # |u-.5| clamped below .5 so the log argument never hits 0
    c = F.least(F.abs(u - 0.5), F.lit(0.5 - 1e-12))
    noise = -F.signum(u - 0.5) * F.log(1 - 2 * c)
    return counts.select(
        "lang",
        "true_count",
        F.round(F.col("true_count") + noise, 4).alias("noisy_count"),
    )


def q188_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search ("table part", exact adjacency): the
    retrieval primitive BM25's bag-of-words postings cannot answer.
    A positional posting (doc_id, token, pos) stream self-joined on
    (doc, pos+1) — at 100 TB the postings are written once and both
    phrase legs are partition-pruned token lookups, never a corpus
    rescan. Output: per-doc match count + first match position."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(fx.whitespace_tokens(F.lower(F.col("text")))).alias(
            "__pos", "__tok"
        ),
    )
    w1 = toks.filter(F.col("__tok") == "table").select("doc_id", "__pos")
    w2 = toks.filter(F.col("__tok") == "part").select(
        "doc_id", (F.col("__pos") - 1).alias("__pos")
    )
    hits = w1.join(w2, on=["doc_id", "__pos"])
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("__pos").cast("int").alias("first_pos"),
    )


def q189_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-layout round-trip + pruned read: events written
    Hive-partitioned by event_type (sources.layout.write_partitioned),
    read back with a partition filter — the scan touches ONE
    directory, a partition-pruning assertion the 100 TB layout story
    rests on (PLANS.md shows the pruned scan). Output: per-day
    purchase value totals, oracle-checked against the raw table."""
    import hashlib
    import tempfile

    ev = _t(spark, sf_dir, "events")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"bdhrs_part_events_{tag}")
    from .sources.layout import write_partitioned

    write_partitioned(
        ev.select("event_id", "ts", "user_id", "event_type", "value"),
        path,
        ["event_type"],
    )
    back = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    # ISO string, not DATE: Spark dates collect as datetime.date while
    # the oracle's surface through pandas as datetime64 (the q64 lesson)
    return back.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def q190_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: per user, seconds from FIRST view to the
    first purchase strictly after it; global p50/p90 + converter
    count — the funnel-health metric (q45 tells you WHO converts,
    this tells you HOW FAST). Two conditional min-aggregates per user
    (one shuffle), then exact percentiles over the |converters|-row
    latency table (the q36 convention: user-level aggregates are
    orders smaller than the event stream)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns DIV 1000").alias("__ts_us")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("__ts_us"))).alias(
            "__first_view"
        ),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("__ts_us").alias("__pts")
    )
    lat = (
        purch.join(per_user, on="user_id")
        .filter(F.col("__pts") > F.col("__first_view"))
        .groupBy("user_id")
        .agg(
            ((F.min("__pts") - F.min("__first_view")) / 1_000_000.0).alias("__lat_s")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.round(F.percentile(F.col("__lat_s"), F.lit(0.5)), 4).alias("p50_latency_s"),
        F.round(F.percentile(F.col("__lat_s"), F.lit(0.9)), 4).alias("p90_latency_s"),
    )


def q191_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality classifier (operators.ml.logreg_quality_classifier):
    full-batch logistic regression distilling the rule-based quality
    label (length + stopword-density threshold) into a smooth scorer —
    the classic fasttext/logreg LLM-curation stage. Each of the
    LOGREG_ITERS gradient steps is ONE d-bounded hash aggregate over
    the cached design matrix (exact decimal partials, the q117
    driver-optimizer convention); eval = accuracy + tie-aware AUC on
    the quantized margin (q114 discipline). The oracle replays the
    identical weight trajectory as unrolled CTEs."""
    from .operators import ml

    return ml.logreg_quality_classifier(_t(spark, sf_dir, "documents"))


def q192_url_host_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/host canonicalization + host-level dedup + per-host caps —
    the CommonCrawl triple (operators.curation.canonical_urls +
    operators.sampling.cap_per_group). The documents table carries no
    URL column, so the query SYNTHESIZES a deterministic messy URL per
    doc (scheme/WWW/port/tracking-param/fragment noise keyed on doc_id
    mod classes — the same expression the oracle builds), then:
    canonicalize (one regexp projection), exact-dedup on the canonical
    key (groupBy min doc_id — two crawls of one page collapse), cap
    each host at CAP survivors (cap_per_group's salted-hash election).
    Output: per-host funnel (n_raw → n_canonical → n_kept) + the
    canonical sample, one row per host."""
    from .operators import curation

    cap = 5
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, "HTTPS://").otherwise("http://"),
            F.when(F.col("doc_id") % 3 == 0, "WWW.").otherwise(""),
            F.lit("Host"),
            (F.col("doc_id") % 23).cast("string"),
            F.lit(".Example.COM"),
            F.when(F.col("doc_id") % 2 == 0, ":443")
            .when(F.col("doc_id") % 5 == 1, ":8080")
            .otherwise(""),
            F.lit("/articles/"),
            (F.col("doc_id") % 7).cast("string"),
            F.when(F.col("doc_id") % 4 == 0, "/").otherwise(""),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit("?utm_source=feed&id="),
                    (F.col("doc_id") % 13).cast("string"),
                    F.lit("&utm_campaign=x"),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 1,
                F.concat(F.lit("?id="), (F.col("doc_id") % 13).cast("string")),
            )
            .otherwise(""),
            F.when(F.col("doc_id") % 6 == 0, "#section-2").otherwise(""),
        ).alias("url"),
    )
    canon = curation.canonical_urls(urls).filter(F.col("canonical_url").isNotNull())
    deduped = canon.groupBy("canonical_url").agg(
        F.min("doc_id").alias("doc_id"), F.min("host").alias("host")
    )
    kept = sampling.cap_per_group(deduped, "host", cap=cap)
    raw_per_host = canon.groupBy("host").agg(F.count(F.lit(1)).alias("n_raw"))
    uniq_per_host = deduped.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_canonical"),
        F.min("canonical_url").alias("sample_canonical"),
    )
    kept_per_host = kept.groupBy("host").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        raw_per_host.join(uniq_per_host, on="host")
        .join(kept_per_host, on="host")
        .select("host", "n_raw", "n_canonical", "n_kept", "sample_canonical")
    )


def q193_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the forecasting-revenue-change scan — one pure
    filter+aggregate over the fact with EVERY predicate pushed to the
    parquet reader (shipdate year, discount band, quantity cap); no
    join, no shuffle beyond the one-row final aggregate. Completes the
    classic family's simplest shape (the pushdown benchmark)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q194_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped product-type profit by nation and year. The
    testdata carries no partsupp, so supply cost is the documented
    proxy 0.6·p_retailprice (a fixed margin — the join tree and the
    amount expression keep Q9's exact shape: two dimension broadcasts
    + the lineitem⋈orders fact shuffle, profit = revenue − cost·qty,
    grouped by (nation, order year)). Part filter: p_name contains
    'red' (Q9's '%green%' analogue on this part vocabulary)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q195_late_priority_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped late-shipment priority audit. No
    shipmode/commitdate/receiptdate columns exist, so the documented
    adaptation keeps Q12's shape — one fact⋈fact equi-join feeding
    CASE-conditional counts grouped by a low-cardinality line
    attribute: a line is LATE when it ships >60 days after its order
    date; lines shipped in 1997 group by l_returnflag with
    high-priority (1-URGENT/2-HIGH) vs lower-priority late counts."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("returnflag")
    )


def q196_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the customer order-count distribution — LEFT OUTER
    join customers to a filtered orders stream (priority <> '5-LOW'
    stands in for Q13's comment NOT-LIKE filter on this schema), count
    per customer INCLUDING zero-order customers, then histogram the
    counts. The double aggregate is the shape: per-customer count (one
    fact shuffle), then a |distinct-counts|-row rollup."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q197_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped small-quantity-order revenue: average yearly
    revenue lost if small orders (below 20% of a part's own average
    order quantity) were not taken, for one brand. The correlated
    scalar subquery decorrelates into ONE per-part aggregate joined
    back to the fact — the threshold compares exactly-representable
    doubles (integral quantities, exact sums/counts ≤ 2^53), so the
    0.2·avg cut is engine-identical without rounding tricks."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#17")
    fact = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("__pk"))
        .agg((F.sum("l_quantity") / F.count(F.lit(1))).alias("__avg_qty"))
    )
    return (
        fact.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("__avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


def q198_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped minimum-cost supplier. No partsupp table, so the
    observed average sale price per (part, supplier) from lineitem is
    the price list — Q2's correlated MIN subquery then decorrelates
    into a per-part min aggregate joined back on exact price equality
    (both sides are the same sum/count quotient of
    exactly-representable doubles, so equality is engine-safe). For
    size-15 parts in region ASIA: the cheapest supplier(s) per
    part with supplier/nation detail, Q2's ordering (acctbal desc,
    nation, supplier, part)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sup_in_region = (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    price_list = (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup_in_region), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg((F.sum("l_extendedprice") / F.count(F.lit(1))).alias("__avg_price"))
    )
    min_price = price_list.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("__avg_price").alias("__min_price")
    )
    return (
        price_list.join(
            F.broadcast(min_price),
            (F.col("p_partkey") == F.col("__pk"))
            & (F.col("__avg_price") == F.col("__min_price")),
        )
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            F.col("n_name").alias("nation"),
            F.round("__avg_price", 2).alias("min_avg_price"),
        )
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
    )


def q199_supplier_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped dominant-supplier audit. No partsupp availqty,
    so the documented adaptation keeps Q20's semi-join chain: suppliers
    who shipped MORE THAN 20% of some 'red'-prefixed part's total
    shipped quantity (the single-source-risk list — Q20's excess-stock
    semantics inverted onto observed flow; 100 suppliers share each
    part's ~30 lines, so >20% is the meaningful dominance bar where
    Q20's >50% is vacuous). Per-(part, supplier) quantity vs a
    per-part total (integral sums, exact — sq·5 > tq in integers),
    then ONE distinct supplier semi-join out to the dimension with
    nation detail."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    flow = li.join(
        F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    )
    per_ps = flow.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("__sq")
    )
    per_p = flow.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("l_quantity").alias("__tq")
    )
    dominant = (
        per_ps.join(F.broadcast(per_p), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("__sq") * 5 > F.col("__tq"))
        .select(F.col("l_suppkey").alias("__sk"))
        .distinct()
    )
    return (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(dominant, F.col("s_suppkey") == F.col("__sk"), "left_semi")
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


def q200_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped global sales opportunity: customers with
    above-average POSITIVE account balance and no RECENT order (none
    since 2000-01-01 — Q22's seven-year dormancy window on this
    data's 1995-2001 span; every customer has SOME order here, so the
    literal never-ordered cut is vacuous), anti-joined and rolled up
    by market segment (the phone-country-code proxy on this schema).
    The scalar average is the allowlisted one-row broadcast
    aggregate; the anti-join streams the customer side. Money totals
    round to 2dp (q01 convention)."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum("c_acctbal") / F.count(F.lit(1))).alias("__avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("segment")
    )


def q201_knn_label_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-consistency IR metrics
    (operators.similarity.knn_label_metrics): every 25th vector is a
    benchmark query, exact cosine ranking is the system, same-label =
    relevant; per label: mean nDCG@10 / MRR@10 / P@10 / recall@10.
    The q142/q143 recall audits grade an ANN index against exact
    search — this grades the EMBEDDING SPACE itself against its
    labels, the eval that decides whether a near-dup/classifier stage
    can trust cosine at all. Bounded query set broadcasts; corpus
    streams once; salted two-phase top-k; DCG/IDCG from literal
    decimal discount tables so both engines sum exactly (no libm
    log2 at query time)."""
    return similarity.knn_label_metrics(_emb(spark, sf_dir))


def q202_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the co-purchase graph
    (plans.graph.link_prediction_scores): edges = part pairs
    co-ordered in >= 2 distinct orders (q122's basket self-join with
    a support floor — single co-occurrence is noise), candidates =
    non-adjacent pairs sharing a wedge pivot, scored by AA / common
    neighbors / neighborhood Jaccard, top-30 by exact-decimal AA.
    The hub cap (LP_HUB_CAP) bounds the wedge join at sum(deg^2)
    over sub-cap pivots — the scale dial that keeps a celebrity part
    from exploding the candidate set."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("__s"))
        .filter(F.col("__s") >= 2)
        .select("u", "v")
    )
    return graph_plans.link_prediction_scores(edges)


def q203_backoff_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff bigram LM held-out scoring
    (operators.ml.stupid_backoff_scores): raw counts trained on the
    even-id half of the corpus score the odd-id half, backing off
    seen-bigram ML to alpha*unigram — Brants et al.'s web-scale LM
    filter, the no-smoothing sibling of q116's add-k NLL. Per
    held-out doc: n_bigrams, n_backoff, mean score; exact-decimal
    sums over portable-rounded IEEE terms (no libm in scoring)."""
    from .operators import ml

    return ml.stupid_backoff_scores(_t(spark, sf_dir, "documents"))


def q204_survival_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier user-lifetime survival curve
    (operators.temporal.kaplan_meier_curve): censoring-aware
    retention — the statistic q64's cohort grid approximates wrongly
    whenever the window truncates active users. One per-user shuffle,
    one calendar-bounded day aggregate, one documented single-row
    ordered fold for the survival product (IEEE multiply in day
    order; the oracle replays it via list_reduce over the same
    ordered list — no exp(sum(log)))."""
    from .operators import temporal

    return temporal.kaplan_meier_curve(_t(spark, sf_dir, "events"))


def q205_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND real streaming gate entry
    (streaming.gate.stream_session_windows): q164 proves
    complete-mode hash aggregation + checkpoint replay; this one
    proves the APPEND-mode watermark machinery — F.session_window
    state merge, event-time watermark advance, emission on watermark
    pass, far-future flush markers to close the tail, and an
    exactly-once parquet FILE sink resumed across restart legs. The
    oracle replays the emitted union in closed form (gaps-and-islands
    over the md5-pure id range); ``sf_dir`` unused (the source is the
    generator), kept for the registry signature."""
    from .streaming.gate import stream_session_windows

    return stream_session_windows(spark)


def q206_pit_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 enrichment — the composition q72 and q43
    exist for: derive a loyalty-tier CHANGE LOG from cumulative
    purchase counts (bronze < 3 <= silver < 6 <= gold, ordered by
    (ts, event_id)), collapse it to state transitions
    (operators.temporal.scd2_history), then attach to every click the
    tier valid AT ITS TIMESTAMP (operators.temporal.asof_join — one
    union+window pass, never an inequality range join). Clicks before
    a user's first purchase read tier 'none'. Output per tier:
    n_versions (SCD2 rows), n_clicks, sum_click_value (2dp, exact
    decimal addition)."""
    from .operators import temporal

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tiers = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("__cum", F.count(F.lit(1)).over(w))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("__cum") >= 6, "gold")
            .when(F.col("__cum") >= 3, "silver")
            .otherwise("bronze")
            .alias("tier"),
        )
    )
    hist = temporal.scd2_history(
        tiers, key="user_id", ts="ts", value_cols=["tier"], tiebreak="event_id"
    )
    versions = hist.groupBy("tier").agg(F.count(F.lit(1)).alias("n_versions"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    enriched = temporal.asof_join(
        clicks,
        tiers.select("user_id", "ts", "event_id", "tier").withColumnRenamed(
            "event_id", "__chg_id"
        ),
        on="user_id",
        ts="ts",
        tiebreak="__chg_id",
    )
    by_tier = enriched.select(
        F.coalesce("tier", F.lit("none")).alias("tier"), "value"
    ).groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
        ).alias("sum_click_value"),
    )
    return by_tier.join(versions, on="tier", how="left").select(
        "tier",
        F.coalesce("n_versions", F.lit(0)).cast("bigint").alias("n_versions"),
        "n_clicks",
        "sum_click_value",
    )


def q207_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets — q122's support counts
    finished into the full a→b rule metrics: confidence =
    supp(a,b)/supp(a) and lift = confidence * n_baskets / supp(b),
    min pair support 2, top-20 by lift. Every number derives from
    exact integer counts through IEEE division/multiplication in ONE
    spelled order (s_ab/s_a*n/s_b), so the ordering doubles are
    bit-identical across engines. Plan: the q122 basket self-join,
    two dictionary-bounded support aggregates, one one-row broadcast
    scalar (n_baskets), a TakeOrderedAndProject top-k."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_baskets = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("__n")
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = items.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("pa") != F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    item_supp = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("__s"))
    sa = item_supp.select(F.col("l_partkey").alias("pa"), F.col("__s").alias("__sa"))
    sb = item_supp.select(F.col("l_partkey").alias("pb"), F.col("__s").alias("__sb"))
    scored = (
        pairs.join(sa, on="pa")
        .join(sb, on="pb")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            F.col("pa").alias("antecedent"),
            F.col("pb").alias("consequent"),
            "support",
            (F.col("support").cast("double") / F.col("__sa")).alias("__conf"),
            (
                F.col("support").cast("double")
                / F.col("__sa")
                * F.col("__n")
                / F.col("__sb")
            ).alias("__lift"),
        )
    )
    return (
        scored.orderBy(
            F.desc("__lift"), F.desc("__conf"), "antecedent", "consequent"
        )
        .limit(20)
        .select(
            "antecedent",
            "consequent",
            "support",
            F.round("__conf", 6).alias("confidence"),
            F.round("__lift", 6).alias("lift"),
        )
    )


def q208_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over orders: the orders no other
    order beats on BOTH earlier-or-equal date and higher-or-equal
    price (one strict) — the classic multi-criteria OLAP operator
    Spark has no primitive for, expressed as a sort-free two-level
    plan: (1) per-DATE max price (hash aggregate — the fact table
    never sorts), (2) a running strictly-previous max over the
    date-level table (bounded calendar dictionary — the only window,
    a few thousand rows at ANY corpus size), (3) broadcast the
    surviving dates back against the facts (price == its date's max
    AND that max strictly exceeds every earlier date's). Ties on
    (date, price) stay in the skyline (neither dominates)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy("o_orderdate").agg(
        F.max("o_totalprice").alias("__dmax")
    )
    wprev = Window.orderBy("o_orderdate").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_dates = daily.withColumn(
        "__prev_max", F.max("__dmax").over(wprev)
    ).filter(
        F.col("__prev_max").isNull() | (F.col("__dmax") > F.col("__prev_max"))
    )
    return (
        orders.join(
            F.broadcast(frontier_dates), on="o_orderdate"
        )
        .filter(F.col("o_totalprice") == F.col("__dmax"))
        .select(
            "o_orderkey",
            (fx.epoch_us(F.col("o_orderdate")) / 1_000_000)
            .cast("long")
            .alias("order_date_s"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


def q209_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair mining for reward-model / DPO training data
    (operators.curation.preference_pairs): within each
    (source, length-bucket) stratum, pair the i-th best with the i-th
    worst document by quality score (margin floor 0.05) — the
    "same kind of document, better vs worse execution" contrast a
    preference model needs, constructed from the rule-based scorer
    q20 already ships. One stratum shuffle feeds both rank windows;
    the rank-on-rank self-join is stratum-local."""
    from .operators import curation

    return curation.preference_pairs(_t(spark, sf_dir, "documents"))


def q210_walk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk-style training-pair generation with deterministic
    walks (plans.graph.deterministic_walk_pairs) over the q202
    co-purchase graph: hop choice = portable-md5(node, step) mod
    degree on the sorted adjacency, 3 hops from every node, skip-gram
    window-2 co-occurrence counts, top-30. Per step the adjacency
    first reduces to a |V|-row next-hop table, so walks advance with
    |V|-vs-|V| equi-joins — no per-walk RNG, no adjacency
    expansion."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = items.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("v")
    )
    edges = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("__s"))
        .filter(F.col("__s") >= 2)
        .select("u", "v")
    )
    return graph_plans.deterministic_walk_pairs(edges)


def q211_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH (bands, rows) parameter sweep against measured
    similarities (operators.dedup.lsh_tuning_curve): the S-curve
    P = 1-(1-s^r)^b — explicit IEEE multiply chains, no libm pow —
    evaluated at the q18 consecutive-pair exact Jaccards and summed
    per config: expected caught pairs, expected recall, confident
    (P >= 0.5) count for every split of the K=16 signature budget.
    The pair table is scanned ONCE (configs are literal struct legs
    of one projection)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = docs.select(F.col("doc_id").alias("id_a")).join(
        docs.select(F.col("doc_id").alias("id_b")),
        on=[F.col("id_b") == F.col("id_a") + 1],
    )
    return dedup.lsh_tuning_curve(docs, pairs)


def q212_seq_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-allowed sequential-pattern support over user event
    histories (operators.temporal.sequential_pattern_support) — the
    PrefixSpan support notion q74/q130 cannot see (they count only
    ADJACENT steps): pattern (a,b,c) is supported by a user iff a, b,
    c occur in order with ANY gaps. Greedy containment closes the
    whole 125-pattern lattice in three dictionary-bounded aggregates
    + two joins; top-20 by support."""
    from .operators import temporal

    return temporal.sequential_pattern_support(_t(spark, sf_dir, "events"))


def q213_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The THIRD real streaming gate
    (streaming.gate.stream_dedup_rollup): cross-batch dropDuplicates
    state — every key's duplicate arrives in a LATER micro-batch
    behind a checkpoint restart, hits the persisted key state, and
    drops; the run asserts the exact emit/drop split before returning
    the per-type rollup of the deduped stream. Completes the stateful
    trio: q164 = complete-mode aggregation state, q205 = append
    session-window watermark state, q213 = dedup key state. ``sf_dir``
    unused (the source is the generator), kept for the registry
    signature."""
    from .streaming.gate import stream_dedup_rollup

    return stream_dedup_rollup(spark)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering is deliberate — the driver's gate checks the FIRST 50
    # entries only, so lead with whichever block has the least driver
    # history. r9 rotation (the r8 verdict's item 2): the two
    # zero-history entries added this session (q191 quality classifier,
    # q192 URL/host dedup) lead, then the ENTIRE r5-stale block the
    # verdict flagged — q25-q62 + q133-q138 (44 queries, last
    # driver-checked in round 5, incl. the heavily-reused q38/q39/q43
    # primitives and the q38 family whose dispatcher changed this
    # round) — then four r6-green fillers (q63-q66) complete the
    # window. Deferred: r8-green q161-q190 + the ANN family, r7-green
    # q01-q10/q110-q131/q146-q160, r6-green q67-q105/q139-q145,
    # r8-green q11-q24 flagships.
    return {
        "q191_quality_classifier": q191_quality_classifier,
        "q192_url_host_dedup": q192_url_host_dedup,
        "q25_sessionize": q25_sessionize,
        "q26_windowed_events": q26_windowed_events,
        "q27_embedding_neardup": q27_embedding_neardup,
        "q28_lsh_ann": q28_lsh_ann,
        "q29_media_features": q29_media_features,
        "q30_ivf_ann": q30_ivf_ann,
        "q31_rollup": q31_rollup,
        "q32_quantized_packing": q32_quantized_packing,
        "q33_greedy_packing": q33_greedy_packing,
        "q34_anomaly_flags": q34_anomaly_flags,
        "q35_customers_without_orders": q35_customers_without_orders,
        "q36_value_percentiles": q36_value_percentiles,
        "q37_event_pivot": q37_event_pivot,
        "q38_dup_clusters": q38_dup_clusters,
        "q39_stratified_sample": q39_stratified_sample,
        "q40_token_budget": q40_token_budget,
        "q41_deterministic_shuffle": q41_deterministic_shuffle,
        "q42_mixture_weights": q42_mixture_weights,
        "q43_asof_join": q43_asof_join,
        "q44_interval_join": q44_interval_join,
        "q45_funnel": q45_funnel,
        "q46_kmv_distinct": q46_kmv_distinct,
        "q47_tfidf_top_terms": q47_tfidf_top_terms,
        "q48_unpivot": q48_unpivot,
        "q49_trailing_window": q49_trailing_window,
        "q50_salted_join": q50_salted_join,
        "q51_decontaminate": q51_decontaminate,
        "q52_gopher_quality": q52_gopher_quality,
        "q53_repetition": q53_repetition,
        "q54_pii_audit": q54_pii_audit,
        "q55_chunking": q55_chunking,
        "q56_boilerplate": q56_boilerplate,
        "q57_quantize": q57_quantize,
        "q58_bloom_prune": q58_bloom_prune,
        "q59_incremental_dedup": q59_incremental_dedup,
        "q60_histogram_quantiles": q60_histogram_quantiles,
        "q61_heavy_hitters": q61_heavy_hitters,
        "q62_domain_cap": q62_domain_cap,
        "q133_dsir_selection": q133_dsir_selection,
        "q134_temperature_mixture": q134_temperature_mixture,
        "q135_pq_codebook": q135_pq_codebook,
        "q136_ngram_novelty": q136_ngram_novelty,
        "q137_fk_audit": q137_fk_audit,
        "q138_join_advisor": q138_join_advisor,
        # r9 batch-3/4 flagships complete the window: four zero-
        # driver-history entries (the second real streaming gate, the
        # IR-metrics eval, Kaplan-Meier, skyline) take the filler
        # slots the r6-green q63-q66 held — the stale-block rotation
        # above is untouched, and the most-visible new operators get
        # driver evidence THIS round instead of next.
        "q201_knn_label_metrics": q201_knn_label_metrics,
        "q204_survival_retention": q204_survival_retention,
        "q205_stream_sessions": q205_stream_sessions,
        "q208_skyline": q208_skyline,
        # -------- driver window boundary: the 50 entries end here ----
        "q63_snapshot_diff": q63_snapshot_diff,
        "q64_retention_cohorts": q64_retention_cohorts,
        "q65_data_quality": q65_data_quality,
        "q66_k_anonymity": q66_k_anonymity,
        "q193_forecast_revenue": q193_forecast_revenue,
        "q194_profit_by_nation_year": q194_profit_by_nation_year,
        "q195_late_priority_audit": q195_late_priority_audit,
        "q196_customer_order_distribution": q196_customer_order_distribution,
        "q197_small_qty_revenue": q197_small_qty_revenue,
        "q198_min_cost_supplier": q198_min_cost_supplier,
        "q199_supplier_part_promotion": q199_supplier_part_promotion,
        "q200_sales_opportunity": q200_sales_opportunity,
        "q202_link_prediction": q202_link_prediction,
        "q203_backoff_lm": q203_backoff_lm,
        "q206_pit_enrichment": q206_pit_enrichment,
        "q207_assoc_rules": q207_assoc_rules,
        "q209_preference_pairs": q209_preference_pairs,
        "q210_walk_pairs": q210_walk_pairs,
        "q211_lsh_tuning": q211_lsh_tuning,
        "q212_seq_patterns": q212_seq_patterns,
        "q213_stream_dedup": q213_stream_dedup,
        "q166_cc_twostar": q166_cc_twostar,
        "q167_promo_revenue": q167_promo_revenue,
        "q168_semantic_decontamination": q168_semantic_decontamination,
        "q169_disjunctive_join": q169_disjunctive_join,
        "q170_supplier_diversity": q170_supplier_diversity,
        "q171_top_supplier": q171_top_supplier,
        "q172_token_fertility": q172_token_fertility,
        "q173_perplexity_buckets": q173_perplexity_buckets,
        "q174_kmv_set_ops": q174_kmv_set_ops,
        "q175_waiting_orders": q175_waiting_orders,
        "q176_important_parts": q176_important_parts,
        "q177_jsonl_roundtrip": q177_jsonl_roundtrip,
        "q178_kcore": q178_kcore,
        "q179_weighted_jaccard": q179_weighted_jaccard,
        "q180_ewma": q180_ewma,
        "q181_negative_edges": q181_negative_edges,
        "q182_dup_cross_source": q182_dup_cross_source,
        "q183_matched_controls": q183_matched_controls,
        "q184_bootstrap_ci": q184_bootstrap_ci,
        "q185_ohlc_bars": q185_ohlc_bars,
        "q186_lang_confusion": q186_lang_confusion,
        "q187_dp_counts": q187_dp_counts,
        "q188_phrase_search": q188_phrase_search,
        "q189_partition_prune": q189_partition_prune,
        "q190_conversion_latency": q190_conversion_latency,
        "q164_stream_rollup": q164_stream_rollup,
        "q165_banded_mutual_knn": q165_banded_mutual_knn,
        "q161_mutual_knn": q161_mutual_knn,
        "q103_batch_ann": q103_batch_ann,
        "q112_hybrid_rrf": q112_hybrid_rrf,
        "q118_mmr_rerank": q118_mmr_rerank,
        "q132_cross_rerank": q132_cross_rerank,
        "q11_window_running": q11_window_running,
        "q12_out_degrees": q12_out_degrees,
        "q13_pagerank": q13_pagerank,
        "q14_triangles": q14_triangles,
        "q15_kmeans": q15_kmeans,
        "q16_dedup_exact": q16_dedup_exact,
        "q17_minhash_pairs": q17_minhash_pairs,
        "q18_jaccard_consecutive": q18_jaccard_consecutive,
        "q19_similarity_topk": q19_similarity_topk,
        "q106_bm25_search": q106_bm25_search,
        "q107_unigram_nll": q107_unigram_nll,
        "q108_zorder_stats": q108_zorder_stats,
        "q109_bpe_merges": q109_bpe_merges,
        "q20_text_quality": q20_text_quality,
        "q21_lang_id": q21_lang_id,
        "q22_token_counts": q22_token_counts,
        "q23_fingerprint": q23_fingerprint,
        "q24_simhash_pairs": q24_simhash_pairs,
        "q152_winnow_overlap": q152_winnow_overlap,
        "q153_cluster_safe_split": q153_cluster_safe_split,
        "q154_soft_dedup_weights": q154_soft_dedup_weights,
        "q155_standardization_audit": q155_standardization_audit,
        "q156_hard_negatives": q156_hard_negatives,
        "q157_adaptive_quality_cutoff": q157_adaptive_quality_cutoff,
        "q158_chunk_documents": q158_chunk_documents,
        "q159_nation_trade_volume": q159_nation_trade_volume,
        "q160_order_priority_check": q160_order_priority_check,
        "q162_exact_group_sample": q162_exact_group_sample,
        "q163_minhash_calibration": q163_minhash_calibration,
        "q146_audio_features": q146_audio_features,
        "q147_ivf_pq_search": q147_ivf_pq_search,
        "q148_ivf_pq_recall": q148_ivf_pq_recall,
        "q149_charset_audit": q149_charset_audit,
        "q150_embedding_dim_profile": q150_embedding_dim_profile,
        "q151_anisotropy": q151_anisotropy,
        "q110_hll_distinct": q110_hll_distinct,
        "q111_hll_by_group": q111_hll_by_group,
        "q113_naive_bayes": q113_naive_bayes,
        "q114_roc_auc": q114_roc_auc,
        "q115_chi2_terms": q115_chi2_terms,
        "q116_bigram_nll": q116_bigram_nll,
        "q117_pca_projection": q117_pca_projection,
        "q119_calibration": q119_calibration,
        "q120_ecdf_transform": q120_ecdf_transform,
        "q121_market_share": q121_market_share,
        "q122_copurchase_pairs": q122_copurchase_pairs,
        "q123_bootstrap_ci": q123_bootstrap_ci,
        "q124_source_overlap": q124_source_overlap,
        "q125_shipping_priority": q125_shipping_priority,
        "q126_local_supplier_volume": q126_local_supplier_volume,
        "q127_large_volume_customers": q127_large_volume_customers,
        "q128_returned_items": q128_returned_items,
        "q129_pmi_collocations": q129_pmi_collocations,
        "q130_path_trigrams": q130_path_trigrams,
        "q131_key_skew_audit": q131_key_skew_audit,
        "q01_pricing_summary": q01_pricing_summary,
        "q02_region_revenue": q02_region_revenue,
        "q03_topk_orders": q03_topk_orders,
        "q04_quality_stats": q04_quality_stats,
        "q05_bucketize": q05_bucketize,
        "q06_group_2keys": q06_group_2keys,
        "q07_cleansing": q07_cleansing,
        "q08_composite_scores": q08_composite_scores,
        "q09_union_distinct": q09_union_distinct,
        "q10_window_rank": q10_window_rank,
        "q139_exact_substring_dedup": q139_exact_substring_dedup,
        "q140_bpe_encode": q140_bpe_encode,
        "q141_pq_search": q141_pq_search,
        "q142_pq_recall": q142_pq_recall,
        "q143_matryoshka_recall": q143_matryoshka_recall,
        "q144_source_kl": q144_source_kl,
        "q145_distribution_match": q145_distribution_match,
        "q67_above_avg_orders": q67_above_avg_orders,
        "q68_weighted_sample": q68_weighted_sample,
        "q69_feature_corr": q69_feature_corr,
        "q70_char_entropy": q70_char_entropy,
        "q71_split_leakage": q71_split_leakage,
        "q72_scd2_history": q72_scd2_history,
        "q73_resample_ffill": q73_resample_ffill,
        "q74_transitions": q74_transitions,
        "q75_profile": q75_profile,
        "q76_normalize_text": q76_normalize_text,
        "q77_segment_dedup": q77_segment_dedup,
        "q78_robust_outliers": q78_robust_outliers,
        "q79_sparse_cosine": q79_sparse_cosine,
        "q80_equidepth_bins": q80_equidepth_bins,
        "q81_grouped_trend": q81_grouped_trend,
        "q82_psi_drift": q82_psi_drift,
        "q83_frame_sample": q83_frame_sample,
        "q84_cube": q84_cube,
        "q85_entity_resolution": q85_entity_resolution,
        "q86_personalized_pagerank": q86_personalized_pagerank,
        "q87_ab_test": q87_ab_test,
        "q88_hits": q88_hits,
        "q89_set_ops": q89_set_ops,
        "q90_gaps_islands": q90_gaps_islands,
        "q91_merge_moments": q91_merge_moments,
        "q92_bfs_hops": q92_bfs_hops,
        "q93_containment_pairs": q93_containment_pairs,
        "q94_zipf_fit": q94_zipf_fit,
        "q95_mutual_info": q95_mutual_info,
        "q96_attribution": q96_attribution,
        "q97_centroid_cosine": q97_centroid_cosine,
        "q98_json_extract": q98_json_extract,
        "q99_merge_upsert": q99_merge_upsert,
        "q100_variant_extract": q100_variant_extract,
        "q101_pii_redact": q101_pii_redact,
        "q102_dedup_keep_best": q102_dedup_keep_best,
        "q104_semdedup": q104_semdedup,
        "q105_corpus_pipeline": q105_corpus_pipeline,
    }
