"""Round-8 second batch: two-star connected components and semantic
decontamination.

cc_two_star must be bit-identical to dup_clusters (both paths) on any
pair graph — the three CC strategies are interchangeable by contract,
they differ only in scaling regime (union-find: small pair graphs;
min-label propagate: huge graphs, O(diameter) rounds; two-star: huge
graphs with long-diameter components, O(log²) rounds, zero Python
stages).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.operators.dedup import (
    cc_two_star,
    dup_clusters,
)
from big_data_hdfs_ray_vs_spark_spark.operators.similarity import (
    semantic_decontamination,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cc_two_star_matches_unionfind(spark):
    # mixed shapes: a chain, a star, a triangle-with-tail, disjoint pairs
    pairs = (
        [(i, i + 1) for i in range(10)]  # chain 0..10
        + [(100, v) for v in (101, 102, 103, 104)]  # star at 100
        + [(200, 201), (201, 202), (202, 200), (202, 203)]  # tri + tail
        + [(300, 301), (400, 401)]
    )
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = _rows(cc_two_star(df))
    want = _rows(dup_clusters(df))
    assert got == want
    # spot-pin the chain collapsed to min label 0 with size 11
    by_doc = {r[0]: r for r in got}
    assert by_doc[10][1] == 0 and by_doc[10][2] == 11


def test_cc_two_star_long_chain_beats_diameter(spark):
    # an 80-node chain: diameter 80, but two-star converges well inside
    # max_iter=30 — the O(log^2) bound this strategy exists for.
    pairs = [(i, i + 1) for i in range(80)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = cc_two_star(df, max_iter=30)
    rows = out.collect()
    assert len(rows) == 81
    assert all(r["cluster"] == 0 and r["cluster_size"] == 81 for r in rows)
    assert sum(r["is_rep"] for r in rows) == 1


def test_cc_two_star_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    out = cc_two_star(df)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "cluster",
        "cluster_size",
        "is_rep",
    ]


def test_cc_two_star_reversed_and_duplicate_edges(spark):
    # same component expressed with reversed/duplicated/self edges
    pairs = [(2, 1), (1, 2), (3, 2), (3, 3), (5, 4)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = _rows(cc_two_star(df))
    want = _rows(dup_clusters(df))
    assert got == want
    clusters = {r[0]: r[1] for r in got}
    assert clusters[1] == clusters[2] == clusters[3] == 1
    assert clusters[4] == clusters[5] == 4


def test_semantic_decontamination_flags_eval_twins(spark):
    # ids divisible by 199 form the eval set. vec 1 equals eval vec 0
    # (cos 1.0 → contaminated); vec 2 is orthogonal (cos 0 → clean);
    # vec 3 is the zero vector (dropped); vec 4 is NULL (dropped).
    rows = [
        (0, [1.0, 0.0, 0.0], "a"),  # eval
        (1, [2.0, 0.0, 0.0], "a"),  # corpus, parallel to eval → cos 1
        (2, [0.0, 1.0, 0.0], "b"),  # corpus, orthogonal → cos 0
        (3, [0.0, 0.0, 0.0], "b"),  # zero norm → dropped
        (4, None, "b"),  # null → dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = {r["label"]: r for r in semantic_decontamination(df, eval_mod=199).collect()}
    assert out["a"]["n_vecs"] == 1 and out["a"]["n_contaminated"] == 1
    assert out["a"]["max_cos"] == pytest.approx(1.0)
    assert out["b"]["n_vecs"] == 1 and out["b"]["n_contaminated"] == 0
    assert out["b"]["contamination_frac"] == 0.0


def test_semantic_decontamination_empty_eval(spark):
    # no id % 199 == 0 → empty eval set → empty output (nothing is
    # scorable), not a crash: the degenerate-corpus convention.
    rows = [(1, [1.0, 0.0], "a"), (2, [0.0, 1.0], "b")]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    assert semantic_decontamination(df, eval_mod=199).count() == 0


def test_token_fertility_counts(spark):
    rows = [
        (1, "hello world", "en"),       # 2 words, pieces: hello,world = 2
        (2, "it's here!", "en"),        # 2 words, pieces: it,',s,here,! = 5
        (3, "", "de"),                  # zero words: excluded from ratios
        (4, "abc123", "de"),            # 1 word, pieces: abc,123 = 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from big_data_hdfs_ray_vs_spark_spark.operators.text import token_fertility

    out = {r["lang"]: r for r in token_fertility(df).collect()}
    en, de = out["en"], out["de"]
    assert en["n_docs"] == 2 and en["total_words"] == 4 and en["total_pieces"] == 7
    assert en["avg_fertility"] == pytest.approx((2 / 2 + 5 / 2) / 2)
    assert en["corpus_fertility"] == pytest.approx(7 / 4)
    assert de["n_docs"] == 2 and de["avg_fertility"] == pytest.approx(2.0)
    # zero-word doc contributes nothing to the weighted ratio
    assert de["corpus_fertility"] == pytest.approx(2.0)


def test_perplexity_buckets_thirds(spark):
    # 6 docs in one lang: rare-token docs must land in 'tail'
    rows = [
        (1, "the the the", "en"),
        (2, "the the the", "en"),
        (3, "the the of", "en"),
        (4, "the of of", "en"),
        (5, "of zz the", "en"),
        (6, "qq zz xx", "en"),  # all rare → highest NLL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from big_data_hdfs_ray_vs_spark_spark.operators.text import perplexity_buckets

    out = {r["bucket"]: r for r in perplexity_buckets(df).collect()}
    assert set(out) == {"head", "middle", "tail"}
    assert sum(r["n_docs"] for r in out.values()) == 6
    # monotone: head avg < middle avg < tail avg
    assert out["head"]["avg_nll"] < out["middle"]["avg_nll"] < out["tail"]["avg_nll"]


def test_kmv_set_ops_exact_below_k(spark):
    # below k the sketch is exact: A={1..10}, B={6..15} → union 15, inter 5
    rows = [(u, "click") for u in range(1, 11)] + [
        (u, "purchase") for u in range(6, 16)
    ] + [(99, "view"), (None, "click")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    from big_data_hdfs_ray_vs_spark_spark.operators.sketches import kmv_set_ops

    r = kmv_set_ops(df, "user_id", "event_type", "click", "purchase", k=64).collect()[0]
    assert (r["est_a"], r["est_b"], r["est_union"], r["est_intersection"]) == (
        10,
        10,
        15,
        5,
    )


def test_kcore_peel_triangle_plus_tail(spark):
    # triangle {1,2,3} is the 2-core; the tail 3-4-5 peels away
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    from big_data_hdfs_ray_vs_spark_spark.plans.graph import kcore_peel

    out = {r["node"]: r["core_degree"] for r in kcore_peel(df, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_peel_empty_core(spark):
    # a path graph has no 2-core
    edges = [(1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    from big_data_hdfs_ray_vs_spark_spark.plans.graph import kcore_peel

    assert kcore_peel(df, k=2).count() == 0


def test_kcore_peel_nonconvergence_raises(spark):
    # max_rounds=1 on a graph needing 2 peels must raise, not return
    # a non-core (the oracle contract: loud failure over silent drift)
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    from big_data_hdfs_ray_vs_spark_spark.plans.graph import kcore_peel

    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_peel(df, k=2, max_rounds=1)


def test_idf_weighted_jaccard_discounts_boilerplate(spark):
    # docs 1/2 share ONLY the boilerplate prefix (in all four docs →
    # ln(4/4)=0 weight); docs 3/4 also share a rare tail. Plain
    # Jaccard scores both pairs equally; IDF-weighting zeroes the
    # boilerplate-only pair.
    boiler = "terms of service apply to all users"
    rare = "quantum entanglement of purple elephants"
    rows = [
        (1, boiler + " alpha beta gamma delta"),
        (2, boiler + " epsilon zeta eta theta"),
        (3, boiler + " " + rare + " one"),
        (4, boiler + " " + rare + " two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    from big_data_hdfs_ray_vs_spark_spark.operators.dedup import (
        idf_weighted_jaccard_pairs,
    )

    out = {(r["id_a"], r["id_b"]): r["weighted_jaccard"]
           for r in idf_weighted_jaccard_pairs(df, pairs).collect()}
    assert out[(3, 4)] > out[(1, 2)]
    # the shared-boilerplate-only pair keeps SOME weight (shingles
    # crossing the boiler/suffix boundary are rare) but far less than
    # the rare-content pair
    assert out[(3, 4)] > 0.2


def test_ewma_shape(spark):
    # constant series → ewma equals the constant at every position
    rows = [(1, i, float(1000 + i), 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts double, value double")
    # emulate the query's window arithmetic directly via SQL expr
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("event_id")
    q = 0.5
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i in range(5):
        v = F.col("value") if i == 0 else F.lag("value", i).over(w)
        num = num + F.when(v.isNotNull(), v * F.lit(q**i)).otherwise(F.lit(0.0))
        den = den + F.when(v.isNotNull(), F.lit(q**i)).otherwise(F.lit(0.0))
    out = df.select((num / den).alias("e")).collect()
    assert all(abs(r["e"] - 5.0) < 1e-12 for r in out)
