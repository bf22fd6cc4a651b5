"""Data profiling operators: one-pass column profiles and grouped
robust (median/MAD) outlier detection.

Profiling is the step every ingest runs before trusting a new drop of
data; at 100 TB it must be ONE scan, not one scan per column. Both
operators here compile to a single aggregate pass:

- ``profile_columns``: every per-column statistic (nulls, distincts,
  min/max, average length) is an aggregate expression in one ``agg``;
  the wide 1-row result is unpivoted driver-side into the tidy
  (column, stat...) shape with a ``stack`` projection — no second scan.
- ``robust_outlier_stats``: exact per-group median and MAD via two
  grouped ``percentile`` passes (MAD needs the median first — an
  irreducible two-pass dependency), then a conditional count. Median/
  MAD is the outlier rule that survives the exact heavy tails that
  break mean/stddev z-scores on real telemetry.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile in ONE aggregate scan: row count, null count,
    exact distinct count, min/max (cast to string AFTER the typed
    min/max, so numeric ordering is preserved), and average string
    length (null for non-string columns).

    Returns (column, n_rows, n_null, n_distinct, min_value, max_value,
    avg_len). The single wide aggregate keeps map-side partial
    aggregation for every statistic; ``count_distinct`` over many
    columns is the one genuinely expensive piece (one hash set per
    column per partition) — at extreme widths switch callers to
    ``approx_count_distinct``, same shape.
    """
    cols = list(cols) if cols else df.columns
    str_cols = {name for name, dtype in df.dtypes if dtype == "string"}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
            (
                F.round(F.avg(F.length(F.col(c))), 6)
                if c in str_cols
                else F.lit(None).cast("double")
            ).alias(f"__len_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"__null_{c}"),
            F.col(f"__dist_{c}"),
            F.col(f"__min_{c}"),
            F.col(f"__max_{c}"),
            F.col(f"__len_{c}"),
        ]
    return wide.select(
        "n_rows",
        F.stack(
            F.lit(len(cols)),
            *stack_args,
        ).alias("column", "n_null", "n_distinct", "min_value", "max_value", "avg_len"),
    ).select("column", "n_rows", "n_null", "n_distinct", "min_value", "max_value", "avg_len")


def robust_outlier_stats(
    df: DataFrame,
    group: str | Sequence[str],
    value: str,
    z: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier summary via median/MAD: a row is an
    outlier when ``0.6745 * |x - median| / MAD > z`` (the modified
    z-score; 0.6745 scales MAD to σ under normality). Returns
    (group..., n, median_value, mad, n_outliers).

    Two grouped exact-percentile passes (median, then MAD over the
    residuals — the dependency is inherent to MAD) plus one conditional
    count; all three shuffle on the same group key, so AQE reuses the
    partitioning. Groups with MAD = 0 (constant-valued) report zero
    outliers rather than dividing by zero.
    """
    keys = [group] if isinstance(group, str) else list(group)
    # The per-group aggregates are k rows — persist them so each of the
    # three fact passes scans the fact table exactly once instead of
    # rebuilding the upstream aggregate (and re-scanning the fact) per
    # consumer. The caches are group-cardinality-sized and broadcast
    # into the fact joins; they are left cached (k rows) for the
    # result's lifetime.
    med = (
        df.groupBy(*keys)
        .agg(F.expr(f"percentile({value}, 0.5)").alias("median_value"))
        .persist()
    )
    stats = (
        df.join(F.broadcast(med), on=keys)
        .withColumn("__resid", F.abs(F.col(value) - F.col("median_value")))
        .groupBy(*keys, "median_value")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(__resid, 0.5)").alias("mad"),
        )
        .persist()
    )
    is_out = F.when(
        F.col("mad") > 0,
        (0.6745 * F.abs(F.col(value) - F.col("median_value")) / F.col("mad")) > z,
    ).otherwise(F.lit(False))
    counted = (
        df.join(F.broadcast(stats.select(*keys, "median_value", "mad")), on=keys)
        .groupBy(*keys)
        .agg(F.sum(is_out.cast("long")).alias("n_outliers"))
    )
    return stats.join(counted, on=keys).select(
        *keys,
        "n",
        F.round("median_value", 6).alias("median_value"),
        F.round("mad", 6).alias("mad"),
        "n_outliers",
    )
