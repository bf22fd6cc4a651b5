"""Sequence packing: quantized chunking vs greedy first-fit, with a
pure-Python packing oracle."""

from big_data_hdfs_ray_vs_spark_spark.operators import packing
from big_data_hdfs_ray_vs_spark_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    rows = [
        # (doc_id, text, source): token counts 3, 4, 2, 6, 1
        (1, "a b c", "s1"),
        (2, "a b c d", "s1"),
        (3, "a b", "s1"),
        (4, "a b c d e f", "s1"),
        (5, "x", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_greedy_packing_semantics(spark):
    # capacity 8: s1 → doc1(3)+doc2(4)=7 fit bin0; doc3(2) overflows → bin1;
    # doc4(6) overflows bin1 (2+6=8 fits! 2+6=8 <= 8) → stays bin1.
    got = {
        (r["source"], r["doc_id"]): r["bin_id"]
        for r in packing.greedy_packing(_docs(spark), capacity=8).collect()
    }
    assert got == {("s1", 1): 0, ("s1", 2): 0, ("s1", 3): 1, ("s1", 4): 1, ("s2", 5): 0}


def test_greedy_packing_matches_python_oracle(spark):
    docs = load_table(spark, SF, "documents")
    cap = 512
    got = {
        (r["source"], r["doc_id"]): r["bin_id"]
        for r in packing.greedy_packing(docs, capacity=cap).collect()
    }
    rows = sorted(
        (r["source"], r["doc_id"], len(r["text"].split()))
        for r in docs.select("source", "doc_id", "text").collect()
    )
    want, used, cur, prev_src = {}, 0, 0, None
    for src, did, n in rows:
        if src != prev_src:
            used, cur, prev_src = 0, 0, src
        if used > 0 and used + n > cap:
            cur, used = cur + 1, 0
        want[(src, did)] = cur
        used += n
    assert got == want


def test_quantized_vs_greedy_bin_counts(spark):
    # greedy never straddles, so it uses >= as many bins per stream
    docs = load_table(spark, SF, "documents")
    q = packing.quantized_packing(docs, capacity=512)
    g = packing.greedy_packing(docs, capacity=512)
    qb = {r["source"]: r["b"] for r in q.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["max"]).max("bin_id").alias("b")).collect()}
    gb = {r["source"]: r["b"] for r in g.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["max"]).max("bin_id").alias("b")).collect()}
    assert set(qb) == set(gb)
    assert all(gb[s] >= qb[s] for s in qb)
