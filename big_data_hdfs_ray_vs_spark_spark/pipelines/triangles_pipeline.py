"""Triangle-count workload, reference CLI surface
(triangles_spark.py:59-65: -f/--datafile)."""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from ..plans.graph import triangle_count
from ..session import get_spark
from ..sources.reddit import reddit_edges
from .common import PhaseTimer, peak_rss_mb, resolve_input, write_report


def run(spark: SparkSession, datafile: str, partitions: int | None = None) -> dict:
    t = PhaseTimer()
    with t.time("load"):
        edges = reddit_edges(resolve_input(spark, datafile, partitions))
    with t.time("triangles"):
        total = triangle_count(edges)
    return {
        "phases": t.phases,
        "total_sec": t.total,
        "peak_rss_mb": round(peak_rss_mb(), 2),
        "triangles": total,
    }


def main(argv: list[str] | None = None) -> str:
    p = argparse.ArgumentParser(description="Triangle count (reference CLI surface)")
    p.add_argument("-f", "--datafile", required=True)
    p.add_argument("--partitions", type=int, default=None)
    args = p.parse_args(argv)
    spark = get_spark(app_name="triangles-pipeline")
    res = run(spark, args.datafile, args.partitions)
    lines = [
        "TRIANGLE COUNT RESULTS (spark engine)",
        f"dataset: {args.datafile}",
        f"total time: {res['total_sec']} s",
        f"peak memory: {res['peak_rss_mb']} MB",
        f"total triangles: {res['triangles']}",
    ]
    return write_report("triangles", args.datafile, lines)


if __name__ == "__main__":
    print(main())
