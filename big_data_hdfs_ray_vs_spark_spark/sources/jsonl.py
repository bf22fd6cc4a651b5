"""JSONL document ingestion — the standard interchange format for
training-data corpora (one JSON object per line, splittable, so a
100 TB corpus scans in parallel like any text source).

Explicit schema always: schema inference over JSON at scale means a
full extra pass and unstable types (the reference's CSV inferSchema
habit, SURVEY §1.1, is the same bug — we fix it in both sources).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Scan a JSONL documents corpus with the declared schema.

    `mode=PERMISSIVE` + `columnNameOfCorruptRecord` quarantines bad
    lines into `_corrupt` instead of failing the job — at corpus scale
    some malformed lines are a certainty, and dropping them silently
    (DROPMALFORMED) hides data loss."""
    # StructType.add mutates in place — build a fresh copy per call.
    schema = T.StructType(
        list(DOCUMENTS_SCHEMA.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def write_documents_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write a documents table as JSONL (one object per line, gzip-less
    so downstream scans stay splittable)."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def write_jsonl_shards(
    df: DataFrame, path: str, max_records_per_file: int = 100_000
) -> None:
    """Training-data export: JSONL sharded by RECORD COUNT, not by
    partition — `maxRecordsPerFile` rolls files inside each write task,
    so shard size is bounded regardless of upstream partitioning (a
    skewed partition can't produce a 50 GB shard a downstream loader
    chokes on). No repartition: this adds zero shuffles to whatever
    plan feeds it."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .json(path)
    )
