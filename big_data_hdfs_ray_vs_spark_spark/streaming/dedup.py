"""Streaming exact dedup — the ingest-time twin of operators.dedup.

A training-data pipeline dedups at ingest, not only in batch sweeps:
documents arrive continuously and each content hash should be emitted
once. Structured Streaming's dropDuplicatesWithinWatermark keeps state
per content hash bounded by the event-time watermark — O(hashes within
the watermark horizon), not O(corpus) — which is the only state shape
that survives an unbounded stream. Late duplicates beyond the horizon
are a documented re-emission risk shared by every watermarked dedup;
the periodic batch sweep (exact_dedup) is the backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit the first-seen document per content hash within the
    watermark horizon. Works on a streaming DataFrame with an event-time
    column; the same call on a batch DataFrame degrades to plain
    dropDuplicates on the hash (Spark ignores watermarks in batch),
    which is exactly the batch-twin semantics tests compare against."""
    hashed = docs.withColumn("__h", F.md5(F.col(text_col)))
    if docs.isStreaming:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__h"]
        )
    return hashed.dropDuplicates(["__h"])
