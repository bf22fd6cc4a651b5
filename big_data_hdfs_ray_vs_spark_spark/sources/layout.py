"""Physical layout helpers for scale: bucketing and partitioned writes.

These are the two levers that remove shuffles/scans *before* a query
runs (SURVEY §7 scale notes):

- **Bucketing** co-locates join/agg keys at write time: two tables
  bucketed by the same key into the same bucket count sort-merge-join
  with NO Exchange on either side — at 100 TB that's the difference
  between a full-fact-table shuffle per join and none.
- **Partitioned layout** turns equality/range predicates on the
  partition column into directory pruning (PartitionFilters in the
  scan node) — a filter that prunes 99% of a 100 TB table reads 1 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Save as a bucketed (and bucket-sorted) table; requires the
    session catalog (bucketing metadata lives there, not in parquet)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Hive-style partitioned parquet layout (directory per value)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (for plan assertions)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()
