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


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``, leaving every other partition of the layout untouched —
    the idempotent daily-backfill write (re-running a day's job rewrites
    that day's directory, not the whole table). Static overwrite (the
    default) would truncate the entire root path first; at 100 TB that
    is the difference between rewriting one day and losing three years.

    The mode is a runtime SQL conf scoped to this write; the previous
    value is restored afterwards so the session's other writes keep
    their configured semantics.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set(key, prev)


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (for plan assertions)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into files of
    roughly ``target_bytes`` each.

    The operational chore every long-running ingest accumulates —
    thousands of kilobyte files from micro-batches or over-parallel
    writes turn a 100 TB scan into a metadata stampede (one task + one
    footer read per file). Compaction sizes the output by MEASURED
    input bytes (filesystem listing, no data read), then rewrites with
    a single narrow coalesce — no shuffle; the write is the only cost.

    Returns {"files_before", "bytes", "files_after"} for audit logs.
    Use repartition instead of coalesce only when the input is so
    skewed that merged-but-unbalanced outputs matter more than
    avoiding the shuffle.
    """
    import os

    sizes = [
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(src_path)
        for f in files
        if f.endswith(".parquet")
    ]
    if not sizes:
        # os.walk sees only the LOCAL filesystem: on a remote URI
        # (hdfs://, s3://) or a typo'd path it yields nothing, and
        # proceeding would funnel a dataset Spark can still read
        # through coalesce(1) as one giant single-task file. Refuse
        # loudly; remote layouts need the Hadoop FileSystem API for
        # the listing.
        raise ValueError(
            f"compact_files: no parquet files found under {src_path!r} via the "
            "local filesystem; for remote storage, size the input with the "
            "cluster filesystem API instead"
        )
    total = sum(sizes)
    n_out = max(1, -(-total // target_bytes))  # ceil
    df = spark.read.parquet(src_path)
    df.coalesce(n_out).write.mode("overwrite").parquet(dst_path)
    files_after = sum(
        1
        for _root, _dirs, files in os.walk(dst_path)
        for f in files
        if f.endswith(".parquet")
    )
    return {"files_before": len(sizes), "bytes": total, "files_after": files_after}


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    shift: int | None = None,
    bits: int | None = None,
) -> None:
    """Z-order-clustered layout: partition directories by the Morton
    key's high bits (``zbucket``), rows inside each partition sorted by
    the full key. A 2-D rectangle predicate then prunes to the bucket
    tiles the rectangle overlaps (PartitionFilters — directories never
    listed) and parquet min/max row-group stats on ``zkey`` localize
    the scan inside each file. This is the layout answer to "queries
    filter on BOTH user and time": a 1-D partitioning serves one
    dimension and smears the other across every partition.

    Columns ``zkey`` and ``zbucket`` are materialized into the layout
    so readers prune without recomputing the interleave."""
    from pyspark.sql import functions as F

    from ..functions import MORTON_BITS, ZORDER_BUCKET_SHIFT, morton_key

    if shift is None:
        shift = ZORDER_BUCKET_SHIFT
    if bits is None:
        bits = MORTON_BITS
    z = morton_key(F.col(x_col), F.col(y_col), bits)
    (
        df.withColumn("zkey", z)
        .withColumn("zbucket", F.shiftright(F.col("zkey"), shift))
        .repartition("zbucket")
        .sortWithinPartitions("zbucket", "zkey")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(path)
    )


def morton_py(x: int, y: int, bits: int | None = None) -> int:
    """Pure-Python replay of functions.morton_key, mask-first like the
    column version (driver-side bucket enumeration + the cross-engine
    pin test)."""
    from ..functions import MORTON_BITS

    if bits is None:
        bits = MORTON_BITS
    x &= (1 << bits) - 1
    y &= (1 << bits) - 1
    return sum(
        ((((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1)))
        for i in range(bits)
    )


def zorder_rectangle_buckets(
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    shift: int | None = None,
    bits: int | None = None,
) -> list[int]:
    """The exact set of zbucket values a 2-D rectangle query can touch.

    For an even ``shift``, zkey >> shift is itself the Morton key of
    the tile coordinates (x >> shift/2, y >> shift/2), so the candidate
    buckets are the interleaves of the tile grid the rectangle covers —
    O(overlapping tiles) driver work, no data touched. Feed the result
    to ``F.col("zbucket").isin(...)`` on a write_zordered layout and
    the scan prunes to those directories; re-apply the exact x/y
    predicate afterwards (z-tiles at the rectangle border contain rows
    just outside it)."""
    from ..functions import MORTON_BITS, ZORDER_BUCKET_SHIFT

    if shift is None:
        shift = ZORDER_BUCKET_SHIFT
    if bits is None:
        bits = MORTON_BITS
    if shift % 2:
        raise ValueError("shift must be even: a zbucket is then a square z-tile")
    h = shift // 2
    return sorted(
        {
            morton_py(tx, ty, bits - h)
            for tx in range(x_lo >> h, (x_hi >> h) + 1)
            for ty in range(y_lo >> h, (y_hi >> h) + 1)
        }
    )
