"""Similarity search: brute-force cosine vs numpy oracle; LSH bucket
path consistent with brute force; blocked pairwise near-dups."""

import numpy as np
from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import similarity


def _emb(spark, n=50, dim=16):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[10] = vecs[0] * 2.0  # same direction as 0 -> cosine 1
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_cosine_topk_matches_numpy(spark):
    df, vecs = _emb(spark)
    q = [float(x) for x in vecs[0]]
    got = [(r["vec_id"], r["cos_sim"])
           for r in similarity.cosine_topk(df, q, k=5).collect()]
    v = vecs.astype(np.float64)
    sims = (v @ v[0]) / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    want = sorted(range(len(sims)), key=lambda i: (-sims[i], i))[:5]
    assert [g[0] for g in got] == want
    for vid, cs in got:
        assert abs(cs - sims[vid]) < 1e-9
    assert got[0][0] in (0, 10) and abs(got[0][1] - 1.0) < 1e-9


def test_lsh_bucket_deterministic_and_topk_consistent(spark):
    df, vecs = _emb(spark)
    b1 = similarity.lsh_bucket(df, planes=6, dim=16)
    b2 = similarity.lsh_bucket(df, planes=6, dim=16)
    assert (
        b1.orderBy("vec_id").select("lsh_bucket").collect()
        == b2.orderBy("vec_id").select("lsh_bucket").collect()
    )
    buckets = b1.persist()
    q = [float(x) for x in vecs[0]]
    ann = similarity.lsh_topk(buckets, q, k=5, planes=6)
    rows = ann.collect()
    # query 0's own bucket contains 0 itself -> top hit is exact
    assert rows[0]["vec_id"] in (0, 10)
    assert abs(rows[0]["cos_sim"] - 1.0) < 1e-9
    # every returned candidate really is in the query's bucket
    qb = {r["vec_id"] for r in buckets.collect()
          if r["lsh_bucket"] == [x for x in buckets.filter(F.col("vec_id") == 0).collect()][0]["lsh_bucket"]}
    assert {r["vec_id"] for r in rows} <= qb
    buckets.unpersist()


def test_pairwise_cosine_within_block(spark):
    df, vecs = _emb(spark)
    blocked = df.withColumn("blk", F.lit(1))  # single block: all pairs
    pairs = similarity.pairwise_cosine_within(blocked, "blk", threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(0, 10)}


def test_ivf_ann_recall(spark):
    df, vecs = _emb(spark)
    q = [float(x) for x in vecs[0]]
    indexed, centroids = similarity.ivf_index(df, n_lists=4)
    assert len(centroids) == 4 and len(centroids[0]) == 16
    # probing ALL lists must reproduce the exact brute-force top-k
    exact = [r["vec_id"] for r in similarity.cosine_topk(df, q, k=5).collect()]
    full = [r["vec_id"] for r in similarity.ivf_topk(indexed, centroids, q, k=5, nprobe=4).collect()]
    assert full == exact
    # probing 1 list still finds the exact-direction duplicate (top-1)
    top1 = similarity.ivf_topk(indexed, centroids, q, k=2, nprobe=1).collect()
    assert top1[0]["vec_id"] in (0, 10)


def test_quantize_embeddings_roundtrip(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    # scale = max|v|/127; components quantize to round(v/scale)
    assert abs(out[1].scale - 1.0 / 127) < 1e-9
    assert out[1].qvec == [127, -63, 32]  # floor(x/scale+0.5): -63.5→-63, 31.75→32
    assert out[1].max_abs_err <= out[1].scale / 2 + 1e-9
    assert out[1].cos_recon > 0.9999
    # zero vector: scale 0, all-zero qvec, zero error, undefined cosine
    assert out[2].scale == 0.0 and out[2].qvec == [0, 0, 0]
    assert out[2].max_abs_err == 0.0
    assert out[2].cos_recon is None


def test_quantize_zero_shuffle_plan(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.similarity import (
        quantize_embeddings,
    )
    from big_data_hdfs_ray_vs_spark_spark.sources.layout import physical_plan

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    assert "Exchange" not in physical_plan(quantize_embeddings(df))


def test_cosine_ops_survive_zero_vectors(spark):
    """A zero-magnitude embedding (failed embedding job) must not abort
    the query under ANSI mode: cosine is NULL/undefined there, so topk
    ranks it last and pairwise near-dup skips it."""
    from big_data_hdfs_ray_vs_spark_spark.operators import similarity

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = similarity.cosine_topk(df, [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in top[:2]] == [1, 2]  # zero vector never wins
    bdf = df.select(F.lit(1).alias("b"), "vec_id", "embedding")
    pairs = similarity.pairwise_cosine_within(bdf, "b", threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_batch_ann_topk_exact(spark):
    """One-bucket corpus with hand-checkable cosines: the batch join
    must rank by cosine, exclude self, and drop zero vectors."""
    import math

    from big_data_hdfs_ray_vs_spark_spark.operators import similarity

    m = [[1, 1]]  # every non-negative vector lands in bucket 1
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    buckets = similarity.lsh_bucket(df, planes=1, dim=2, matrix=m)
    queries = buckets.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding", "lsh_bucket"
    )
    out = sorted(
        similarity.batch_ann_topk(buckets, queries, k=3).collect(),
        key=lambda r: r["rank"],
    )
    # zero vector (id 4) dropped, self (id 1) excluded -> exactly 2 rows
    assert [(r["query_id"], r["vec_id"], r["rank"]) for r in out] == [
        (1, 2, 1),
        (1, 3, 2),
    ]
    assert abs(out[0]["cos_sim"] - 0.9 / math.sqrt(0.82)) < 1e-9
    assert abs(out[1]["cos_sim"]) < 1e-12


def test_batch_ann_topk_bucket_confinement(spark):
    """A query only retrieves candidates from its own bucket."""
    from big_data_hdfs_ray_vs_spark_spark.operators import similarity

    m = [[1, 0]]  # bucket = sign of x-coordinate
    rows = [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    buckets = similarity.lsh_bucket(df, planes=1, dim=2, matrix=m)
    queries = buckets.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding", "lsh_bucket"
    )
    got = similarity.batch_ann_topk(buckets, queries, k=10).collect()
    # id 3 is in the negative-halfspace bucket: never a candidate
    assert {r["vec_id"] for r in got} == {2}


def test_batch_ann_topk_external_query_ids(spark):
    """exclude_self=False: an EXTERNAL query batch whose ids happen to
    collide with corpus ids must NOT lose the colliding neighbor."""
    from big_data_hdfs_ray_vs_spark_spark.operators import similarity

    m = [[1, 1]]
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    buckets = similarity.lsh_bucket(df, planes=1, dim=2, matrix=m)
    # external query reuses id 1 but is a DIFFERENT vector
    queries = similarity.lsh_bucket(
        spark.createDataFrame(
            [(1, [0.8, 0.2])], "query_id long, embedding array<double>"
        ),
        planes=1,
        dim=2,
        matrix=m,
    )
    got = similarity.batch_ann_topk(buckets, queries, k=5, exclude_self=False)
    assert {r["vec_id"] for r in got.collect()} == {1, 2}
    # default (corpus-drawn ids) still drops the collision
    got_default = similarity.batch_ann_topk(buckets, queries, k=5)
    assert {r["vec_id"] for r in got_default.collect()} == {2}


# --------------------------------------------------- PQ codebook (q135)
def test_pq_codebook_hand_fixture(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.similarity import (
        pq_codebook_stats,
    )

    # dim 4, m=2 subspaces of 2, k=2, 1 Lloyd iter over all 4 vectors.
    # Hand-run of the first-k-by-id recurrence gives symmetric stats:
    # each subspace ends with one tight code (mean sq 1.0) and one code
    # holding the [1,1]-pulled centroid (mean sq 370/18).
    vecs = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 10.0, 10.0]),
            (1, [1.0, 1.0, 11.0, 11.0]),
            (2, [10.0, 10.0, 0.0, 0.0]),
            (3, [11.0, 11.0, 1.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = pq_codebook_stats(vecs, m=2, k=2, iters=1, sample_n=10).collect()
    got = [(r.subspace, r.code, r.n_vecs, r.mean_sqdist) for r in rows]
    loose = round(370 / 18, 6)
    assert got == [
        (0, 0, 2, 1.0),
        (0, 1, 2, loose),
        (1, 0, 2, loose),
        (1, 1, 2, 1.0),
    ]


def test_pq_codebook_rejects_indivisible_dim(spark):
    import pytest

    from big_data_hdfs_ray_vs_spark_spark.operators.similarity import (
        pq_codebook_stats,
    )

    vecs = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="divisible"):
        pq_codebook_stats(vecs, m=2, k=2, iters=1, sample_n=10)


def test_pq_codebook_excludes_offdim_vectors(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.similarity import (
        pq_codebook_stats,
    )

    vecs = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [4.0, 4.0]), (2, [1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = pq_codebook_stats(vecs, m=1, k=2, iters=1, sample_n=10).collect()
    # the truncated vector is not a point in the space
    assert sum(r.n_vecs for r in rows) == 2


def test_pq_codebook_modal_dim_survives_oversized_outlier(spark):
    """One corrupt 6-dim vector among 4-dim data: the MODAL dim wins,
    so the outlier is excluded — it must neither abort the audit
    (6 % 4 != 0 would) nor become the space that filters out the
    valid corpus."""
    from big_data_hdfs_ray_vs_spark_spark.operators.similarity import (
        pq_codebook_stats,
    )

    vecs = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 1.0, 1.0]),
            (1, [2.0, 2.0, 3.0, 3.0]),
            (2, [4.0, 4.0, 5.0, 5.0]),
            (3, [9.0] * 6),  # corrupt outlier
        ],
        "vec_id long, embedding array<double>",
    )
    rows = pq_codebook_stats(vecs, m=2, k=2, iters=1, sample_n=10).collect()
    assert sum(r.n_vecs for r in rows) == 6  # 3 valid vectors x 2 subspaces


def test_pq_encode_codes_shape(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes, dim, sub, books = similarity.pq_encode(
        df, m=4, k=4, iters=2, sample_n=32
    )
    assert (dim, sub) == (8, 2)
    got = codes.collect()
    assert len(got) == 64
    for r in got:
        assert len(r.codes) == 4
        assert all(0 <= c < 4 for c in r.codes)


def test_pq_search_adc_matches_numpy(spark):
    # ADC ground truth recomputed in numpy from the operator's own
    # codebooks: encode = per-subspace argmin, dist = sum of squared
    # distances from the query slice to the assigned centroid
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.randn(40, 8)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m, k, iters, sample_n, nq, topk = 4, 4, 2, 32, 3, 5
    got = similarity.pq_search(
        df, n_queries=nq, topk=topk, m=m, k=k, iters=iters, sample_n=sample_n
    ).collect()
    _, dim, sub, books = similarity.pq_encode(
        df, m=m, k=k, iters=iters, sample_n=sample_n
    )
    v64 = np.asarray(vecs, dtype=np.float64).astype(np.float32).astype(np.float64)
    books = np.array(books)  # m × k × sub
    codes = np.stack(
        [
            np.argmin(
                ((v64[:, None, mi * sub : (mi + 1) * sub] - books[mi][None]) ** 2).sum(-1),
                axis=1,
            )
            for mi in range(m)
        ],
        axis=1,
    )  # n × m
    expect = {}
    for q in range(nq):
        dists = []
        for v in range(len(v64)):
            if v == q:
                continue
            d = sum(
                ((v64[q, mi * sub : (mi + 1) * sub] - books[mi][codes[v, mi]]) ** 2).sum()
                for mi in range(m)
            )
            dists.append((round(d, 6), v))
        dists.sort()
        for rank, (d, v) in enumerate(dists[:topk], 1):
            expect[(q, v)] = (d, rank)
    assert len(got) == nq * topk
    for r in got:
        ed, er = expect[(r.query_id, r.vec_id)]
        assert abs(r.adc_dist - ed) < 1e-6 and r.rank == er, (r, ed, er)


def test_pq_recall_audit_matches_numpy(spark):
    # recall recomputed in numpy: exact euclidean top-k (rounded-dist
    # + id ties) vs the operator's own ADC top-k
    import numpy as np

    rng = np.random.RandomState(23)
    vecs = rng.randn(40, 8)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m, k, iters, sample_n, nq, topk = 4, 4, 2, 32, 3, 5
    got = {
        r.query_id: (r.n_matched, r.recall)
        for r in similarity.pq_recall_audit(
            df, n_queries=nq, topk=topk, m=m, k=k, iters=iters, sample_n=sample_n
        ).collect()
    }
    adc = {
        (r.query_id, r.vec_id)
        for r in similarity.pq_search(
            df, n_queries=nq, topk=topk, m=m, k=k, iters=iters, sample_n=sample_n
        ).collect()
    }
    v64 = np.asarray(vecs, dtype=np.float64).astype(np.float32).astype(np.float64)
    assert len(got) == nq
    for q in range(nq):
        d = [
            (round(((v64[q] - v64[v]) ** 2).sum(), 6), v)
            for v in range(len(v64))
            if v != q
        ]
        d.sort()
        exact = {v for _, v in d[:topk]}
        expect = len(exact & {v for qq, v in adc if qq == q})
        assert got[q] == (expect, round(expect / topk, 6)), q


def test_matryoshka_recall_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(31)
    vecs = rng.randn(30, 16)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    nq, topk, prefixes = 3, 5, [4, 8]
    got = {
        (r.prefix_dim, r.query_id): (r.n_matched, r.recall)
        for r in similarity.matryoshka_recall(
            df, prefixes=prefixes, n_queries=nq, topk=topk
        ).collect()
    }
    v64 = np.asarray(vecs, dtype=np.float64).astype(np.float32).astype(np.float64)

    def topset(q, d):
        scored = []
        for v in range(len(v64)):
            if v == q:
                continue
            a, b = v64[q][:d], v64[v][:d]
            na, nb = np.sqrt((a * a).sum()), np.sqrt((b * b).sum())
            if na > 0 and nb > 0:
                # (-cos, id) sort == cos desc, id asc
                scored.append((-round(float(a @ b) / (na * nb), 6), v))
        scored.sort()
        return {v for _, v in scored[:topk]}

    assert len(got) == nq * len(prefixes)
    for q in range(nq):
        truth = topset(q, 16)
        for d in prefixes:
            m = len(topset(q, d) & truth)
            assert got[(d, q)] == (m, round(m / topk, 6)), (d, q)
    # sanity: truncation must not be vacuous — some prefix loses recall
    assert any(v[1] < 1.0 for v in got.values())


def test_matryoshka_prefixes_at_or_above_dim_are_dropped(spark):
    rows = [(i, [float(i), 1.0, 2.0, 3.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.matryoshka_recall(df, prefixes=[2, 4, 8], n_queries=2, topk=3)
    assert {r.prefix_dim for r in out.collect()} == {2}


def test_ivf_pq_search_probe_all_equals_pq_search(spark):
    # with nprobe = k_lists every list is probed, so IVF routing must
    # change NOTHING: exact same rows/dists/ranks as pq_search
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    cfg = dict(m=4, k=4, iters=2, sample_n=32)
    full = similarity.ivf_pq_search(
        df, n_queries=3, topk=5, nprobe=4, ivf={"k": 4, "iters": 2, "sample_n": 32}, **cfg
    ).collect()
    ps = similarity.pq_search(df, n_queries=3, topk=5, **cfg).collect()
    a = sorted((r.query_id, r.vec_id, r.adc_dist, r.rank) for r in full)
    b = sorted((r.query_id, r.vec_id, r.adc_dist, r.rank) for r in ps)
    assert a == b


def test_ivf_pq_search_routing_restricts_candidates(spark):
    # with nprobe < k_lists, every returned neighbor must belong to one
    # of the query's probed lists (recomputed independently in numpy
    # from the operator's own quantizer), and dists must equal the
    # unrouted ADC dists for the same (query, vec) pairs
    import numpy as np

    from big_data_hdfs_ray_vs_spark_spark.plans.kmeans import lloyd_kmeans_sample

    rng = np.random.RandomState(13)
    vecs = rng.randn(60, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    ivf = {"k": 4, "iters": 2, "sample_n": 32}
    cfg = dict(m=4, k=4, iters=2, sample_n=32)
    got = similarity.ivf_pq_search(
        df, n_queries=3, topk=5, nprobe=2, ivf=ivf, **cfg
    ).collect()
    base = df.selectExpr("vec_id as id", "cast(embedding as array<double>) as v")
    cents = np.array(lloyd_kmeans_sample(base, "id", "v", **ivf))
    v64 = np.asarray(vecs, dtype=np.float64).astype(np.float32).astype(np.float64)
    assign = np.argmin(((v64[:, None] - cents[None]) ** 2).sum(-1), axis=1)
    unrouted = {
        (r.query_id, r.vec_id): r.adc_dist
        for r in similarity.pq_search(df, n_queries=3, topk=60, **cfg).collect()
    }
    assert len(got) > 0
    for r in got:
        qd = ((v64[r.query_id][None] - cents) ** 2).sum(-1)
        probed = set(np.argsort(qd, kind="stable")[:2])
        assert assign[r.vec_id] in probed, (r, assign[r.vec_id], probed)
        assert r.adc_dist == unrouted[(r.query_id, r.vec_id)]


def test_anisotropy_symmetric_set_is_zero(spark):
    # ±e1, ±e2: mean unit vector = 0 -> anisotropy 0; norms all 2
    df = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [-2.0, 0.0]), (3, [0.0, 2.0]), (4, [0.0, -2.0]),
         (5, [0.0, 0.0])],  # zero vector dropped
        "vec_id long, embedding array<float>",
    )
    r = similarity.anisotropy_audit(df).first()
    assert (r.n_vecs, r.mean_norm, r.anisotropy) == (4, 2.0, 0.0)


def test_anisotropy_collapsed_cone_is_one(spark):
    # identical directions: mean û is a unit vector -> anisotropy 1
    df = spark.createDataFrame(
        [(i, [3.0, 4.0]) for i in range(5)], "vec_id long, embedding array<float>"
    )
    r = similarity.anisotropy_audit(df).first()
    assert (r.n_vecs, r.mean_norm, r.anisotropy) == (5, 5.0, 1.0)


def test_ivf_pq_recall_probe_all_equals_pq_recall(spark):
    import numpy as np

    rng = np.random.RandomState(23)
    vecs = rng.randn(40, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    cfg = dict(m=4, k=4, iters=2, sample_n=32)
    a = sorted(
        (r.query_id, r.n_matched, r.recall)
        for r in similarity.ivf_pq_recall_audit(
            df, n_queries=3, topk=5, nprobe=4,
            ivf={"k": 4, "iters": 2, "sample_n": 32}, **cfg
        ).collect()
    )
    b = sorted(
        (r.query_id, r.n_matched, r.recall)
        for r in similarity.pq_recall_audit(df, n_queries=3, topk=5, **cfg).collect()
    )
    assert a == b
