"""End-to-end ETL workload with the reference CLI surface
(etl_spark.py:292-303: -f/--datafile, --partitions) and its E/T/L
phase timing + report sink.

Differences from the reference, by design (SURVEY §7): explicit schema
(no inferSchema pass), and the transform's five separate actions fused
— categories/cleansing/scores are one cached plan, aggregates run off
it, so the input is scanned once instead of five times.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from ..operators import etl
from ..session import get_spark
from .common import PhaseTimer, peak_rss_mb, resolve_input, sample_display, write_report


def run(
    spark: SparkSession,
    datafile: str,
    partitions: int | None = None,
    output: str | None = None,
    show_sample: bool = True,
    output_files: int = 4,
) -> dict:
    """``output_files`` defaults to the reference's coalesce(4)
    (etl_spark.py:250) and is the right LOCAL plan too — the r7 write
    profile measured the 4-file write at 8.9 s min for 545 MB vs
    24-107 s for the natural 32-file write on this box's disk (the
    load phase is I/O-bound, and 32 concurrent writers thrash where 4
    stream). At cluster scale invert it: pass a size-targeted count
    (estimated bytes / 128 MB) — 4 writer tasks against a distributed
    store would serialize a TB-scale sink behind 4 executors."""
    t = PhaseTimer()
    with t.time("extract"):
        df = resolve_input(spark, datafile, partitions).cache()
        total_rows = df.count()
        sample = ""
        if show_sample:
            # Reference E-phase display (etl_spark.py:101-106): schema +
            # first 5 rows; part of the reference's timed extract. Kept
            # as a string so it reaches the report sink, not just stdout.
            sample = sample_display(df, 5)
            print(sample)
    with t.time("transform"):
        quality = etl.quality_stats(df).first().asDict()
        # transform feeds two consumers (fused agg + the load-phase
        # write): persist it. A/B at the 4M tier, steady state: 10.7 s
        # cached vs 14.5 s recomputed (an earlier opposite measurement
        # was JVM warm-up). At a scale where the transformed table
        # outgrows cache, MEMORY_AND_DISK spills instead of failing.
        transformed = etl.transform(df).persist()
        # one grouping-sets pass replaces the reference's four aggregate
        # actions (etl_spark.py:163-224,253-257): one scan, one shuffle
        fused = etl.fused_aggregations(transformed).cache()
        parts = etl.split_fused(fused)
        sentiment = [r.asDict() for r in parts["sentiment"].collect()]
        readability = [r.asDict() for r in parts["readability"].limit(10).collect()]
        final = {
            k: v for k, v in parts["final"].first().asDict().items()
        }
        # the fused pass already counted the cleansed table
        cleansed_rows = int(final["final_count"])
    with t.time("load"):
        if output:
            transformed.coalesce(output_files).write.mode("overwrite").parquet(
                output + "/transformed_data"
            )
            parts["summary"].coalesce(1).write.mode("overwrite").parquet(
                output + "/summary_stats"
            )
    fused.unpersist()
    transformed.unpersist()
    df.unpersist()
    return {
        "sample": sample,
        "phases": t.phases,
        "total_sec": t.total,
        "peak_rss_mb": round(peak_rss_mb(), 2),
        "total_rows": total_rows,
        "cleansed_rows": cleansed_rows,
        "removed_rows": total_rows - cleansed_rows,
        "quality": quality,
        "sentiment": sentiment,
        "readability": readability,
        "final": final,
    }


def report_lines(res: dict, datafile: str) -> list[str]:
    lines = [
        "ETL PIPELINE RESULTS (spark engine)",
        f"dataset: {datafile}",
        f"total time: {res['total_sec']} s "
        f"(E {res['phases'].get('extract')}/T {res['phases'].get('transform')}"
        f"/L {res['phases'].get('load')})",
        f"peak memory: {res['peak_rss_mb']} MB",
        f"rows: {res['total_rows']}  cleansed: {res['cleansed_rows']} "
        f"(removed {res['removed_rows']})",
        "quality: " + str(res["quality"]),
        "final metrics: " + str(res["final"]),
        "sentiment groups:",
    ]
    if res.get("sample"):
        lines[2:2] = ["input sample:", res["sample"]]
    lines += [f"  {r}" for r in res["sentiment"]]
    lines.append("top readability combos:")
    lines += [f"  {r}" for r in res["readability"]]
    return lines


def main(argv: list[str] | None = None) -> str:
    p = argparse.ArgumentParser(description="ETL pipeline (reference CLI surface)")
    p.add_argument("-f", "--datafile", required=True)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--output", default=None, help="parquet output dir (skip if absent)")
    args = p.parse_args(argv)
    spark = get_spark(app_name="etl-pipeline")
    res = run(spark, args.datafile, args.partitions, args.output)
    return write_report("etl", args.datafile, report_lines(res, args.datafile))


if __name__ == "__main__":
    print(main())
