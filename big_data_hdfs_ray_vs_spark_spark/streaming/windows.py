"""Structured Streaming surface over the events table.

The reference has no streaming (SURVEY §2.10); this is the idiomatic
Spark extension: the same operator library applied to a readStream with
event-time windows + watermark-bounded state. At scale the aggregation
state is per (window × event_type), so memory is bounded by the
watermark horizon regardless of input rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events_dir(
    spark: SparkSession, path: str, max_files: int = 10, schema=None
) -> DataFrame:
    """File-source stream over a directory of parquet files (defaults
    to the events schema; pass ``schema`` for any other layout)."""
    return (
        spark.readStream.schema(schema or EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_event_stats(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling event-time window aggregate with late-data bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def windowed_value_histogram(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    lo: float = 0.0,
    hi: float = 500.0,
    n_bins: int = 50,
) -> DataFrame:
    """Streaming form of the histogram-quantile sketch
    (operators.sketches.histogram_quantiles): per (window, event_type,
    bin) counts with watermark-bounded state.

    The emitted rows ARE the mergeable sketch state — a downstream
    reader derives any quantile with the same nearest-rank estimator,
    and shards/backfills merge by adding counts. State per window is
    bounded by n_bins × event_type cardinality regardless of rate, the
    property that makes percentile monitoring viable on an unbounded
    stream (an exact streaming percentile would need all values)."""
    width = (hi - lo) / n_bins
    bin_ = F.least(
        F.greatest(F.floor((F.col("value") - lo) / width), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    # Same null/NaN discipline as the batch sketch: greatest() skips
    # null arguments (nulls would count as bin-0 observations) and
    # floor(NaN) casts to bin 0 too — neither is an observation.
    return (
        events.filter(
            F.col("value").isNotNull() & ~F.isnan(F.col("value").cast("double"))
        )
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type", bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "bin",
            "n",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drain the stream into an in-memory table via availableNow (test/
    demo harness; production uses a parquet/Kafka sink + checkpoint)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
