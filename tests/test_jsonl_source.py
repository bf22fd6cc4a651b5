"""JSONL documents source: explicit-schema scan, corrupt-line
quarantine, write/read roundtrip."""

from big_data_hdfs_ray_vs_spark_spark.sources import (
    load_table,
    read_documents_jsonl,
    write_documents_jsonl,
)

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, path, partitions=4)
    # cache: Spark disallows querying ONLY _corrupt off a raw JSON scan
    back = read_documents_jsonl(spark, path).cache()
    assert back.filter("_corrupt IS NOT NULL").count() == 0
    a = sorted((r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect())
    b = sorted((r["doc_id"], r["text"]) for r in back.select("doc_id", "text").collect())
    assert a == b


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    path = tmp_path / "bad"
    path.mkdir()
    (path / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
    )
    df = read_documents_jsonl(spark, str(path)).cache()
    assert df.count() == 3
    assert df.filter("_corrupt IS NOT NULL").count() == 1
    assert df.filter("_corrupt IS NULL").count() == 2
