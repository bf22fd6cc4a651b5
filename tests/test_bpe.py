"""Iterative BPE training (plans/bpe.py): hand-computed merge
sequence, greedy-leftmost merge semantics, early stop."""

from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.plans import bpe


def test_bpe_train_hand_computed(spark):
    """The HF-tutorial-style corpus: hug x4, pug, pun, bun, hugs.
    (u,g)=6 then (h,ug)=5 then (u,n)=2; every remaining pair is a
    singleton -> early stop before the requested 10 merges."""
    docs = spark.createDataFrame(
        [(1, "hug hug hug hug pug pun bun hugs")], "doc_id long, text string"
    )
    merges, table = bpe.bpe_train(docs, n_merges=10)
    assert merges == [("u", "g", 6), ("h", "ug", 5), ("u", "n", 2)]
    vocab = {tuple(r["symbols"]): r["n"] for r in table.collect()}
    assert vocab == {
        ("hug",): 4,
        ("p", "ug"): 1,
        ("p", "un"): 1,
        ("b", "un"): 1,
        ("hug", "s"): 1,
    }
    table.unpersist()


def test_bpe_merge_is_greedy_leftmost(spark):
    """aaa with pair (a,a) merges the LEFT occurrence: [aa, a] — the
    fused symbol never re-matches as the pair's left element."""
    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    merges, table = bpe.bpe_train(docs, n_merges=1)
    assert merges == [("a", "a", 4)]
    vocab = {tuple(r["symbols"]): r["n"] for r in table.collect()}
    assert vocab == {("aa", "a"): 2}
    table.unpersist()


def test_bpe_no_mergeable_pairs(spark):
    docs = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    merges, table = bpe.bpe_train(docs, n_merges=5)
    assert merges == []
    assert table.count() == 2
    table.unpersist()


def test_bpe_fold_stays_jvm_side(spark):
    """The merge fold is codegen — no Python evaluation nodes in the
    plan of a merged table."""
    from big_data_hdfs_ray_vs_spark_spark.sources.layout import physical_plan

    docs = spark.createDataFrame([(1, "hug hug")], "doc_id long, text string")
    table = bpe.word_symbol_table(docs)
    merged = bpe._merge_pair(table, "u", "g")
    plan = physical_plan(merged)
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
