"""Custom Python DataSource tests (sources/pyds.py): executor-side
generation, positional determinism, and streaming offset replay."""

from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.sources.pyds import (
    _doc_row,
    register_python_sources,
)


def _read_docs(spark, n, parts):
    register_python_sources(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("n", n)
        .option("partitions", parts)
        .load()
    )


def test_synthetic_docs_batch_source(spark):
    df = _read_docs(spark, 100, 4)
    assert df.count() == 100
    assert df.rdd.getNumPartitions() == 4
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
    row = df.filter(F.col("doc_id") == 7).collect()[0]
    assert tuple(row) == _doc_row(7)
    # n_chars really is the text length (generator self-consistency)
    bad = df.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_synthetic_docs_partitioning_invariance(spark):
    """Same corpus at any partition count — the positional-determinism
    contract that makes the generator a valid scale-out source."""
    a = {tuple(r) for r in _read_docs(spark, 60, 2).collect()}
    b = {tuple(r) for r in _read_docs(spark, 60, 7).collect()}
    assert a == b and len(a) == 60


def test_synthetic_events_stream_source(spark, tmp_path):
    """availableNow drains the batches the capped offset exposes;
    content is the deterministic event_id function."""
    register_python_sources(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 50)
        .option("partitions", 3)
        .option("maxRows", 150)
        .load()
    )

    # One retry: under heavy host contention (e.g. a concurrent Spark
    # process) the first Python-worker launch can fail transiently.
    for attempt in (0, 1):
        q = (
            stream.writeStream.format("memory")
            .queryName("pyds_events")
            .option("checkpointLocation", str(tmp_path / f"ckpt{attempt}"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            break
        except Exception:
            if attempt:
                raise
    rows = spark.sql("select * from pyds_events").collect()
    assert len(rows) > 0 and len(rows) % 50 == 0
    got = {r["event_id"]: r for r in rows}
    from big_data_hdfs_ray_vs_spark_spark.sources.pyds import _event_row

    for eid in (0, 17, 49):
        assert tuple(got[eid]) == _event_row(eid)


def test_docs_source_empty_corpus(spark):
    from big_data_hdfs_ray_vs_spark_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    assert spark.read.format("synthetic_docs").option("n", 0).load().count() == 0


def test_stream_reader_offset_never_regresses_after_restart():
    """A fresh reader (checkpoint restart) must clamp its counter up to
    the restored offsets so already-committed ranges are never re-planned."""
    from big_data_hdfs_ray_vs_spark_spark.sources.pyds import _EventsStreamReader

    r = _EventsStreamReader({"rowsPerBatch": "100", "maxRows": "10000"})
    # restart: engine re-executes the last batch with restored offsets
    r.partitions({"offset": 4900}, {"offset": 5000})
    assert r.latestOffset()["offset"] == 5100  # continues, no regression to 100


def test_stream_reader_commit_clamps_for_fast_resume():
    """Restart where every batch was already committed: the engine may
    only call commit(end) — latestOffset must resume from the committed
    offset in ONE trigger, not re-climb from 0 in rowsPerBatch steps."""
    from big_data_hdfs_ray_vs_spark_spark.sources.pyds import _EventsStreamReader

    r = _EventsStreamReader({"rowsPerBatch": "100", "maxRows": "10000"})
    r.commit({"offset": 4900})
    assert r.latestOffset()["offset"] == 5000  # one step past committed
