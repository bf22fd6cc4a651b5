"""Segment-level cross-document dedup (rebuild semantics) and text
normalization: closed-form fixtures."""

from big_data_hdfs_ray_vs_spark_spark.operators import dedup, text


def test_segment_dedup_keeps_first_occurrence(spark):
    # seg_words=2 → doc 1: ["a b","c d"], doc 2: ["c d","e f"],
    # doc 3: ["a b"]. "c d" first occurs in doc 1, "a b" in doc 1.
    rows = [(1, "a b c d"), (2, "c d e f"), (3, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.segment_dedup(df, seg_words=2).collect()}
    assert out[1]["clean_text"] == "a b c d"
    assert (out[1]["n_segments"], out[1]["n_removed"]) == (2, 0)
    assert out[2]["clean_text"] == "e f"
    assert (out[2]["n_segments"], out[2]["n_removed"]) == (2, 1)
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_segments"], out[3]["n_removed"]) == (1, 1)


def test_segment_dedup_ragged_tail_segment(spark):
    # 5 tokens at seg_words=2 → segments "a b", "c d", "e" (short tail).
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    r = dedup.segment_dedup(df, seg_words=2).collect()[0]
    assert r["clean_text"] == "a b c d e"
    assert r["n_segments"] == 3


def test_normalize_text_keepset_and_collapse(spark):
    rows = [(1, "Hello,   WORLD!! #@$ it's 42"), (2, "clean text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.normalize_text(df).collect()}
    # '#','@','$' dropped (3 chars); case folded; space runs collapsed.
    assert out[1]["norm_text"] == "hello, world!! it's 42"
    assert out[1]["n_removed_chars"] == 3
    assert out[1]["changed"] is True
    assert out[2]["norm_text"] == "clean text"
    assert out[2]["changed"] is False
