"""PageRank workload, reference CLI surface (pagerank_spark.py:213-224:
-f, --partitions, --damping-factor, --max-iterations,
--convergence-threshold, --convergence-sample-size)."""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from ..plans.graph import pagerank, pagerank_topk
from ..session import get_spark
from ..sources.reddit import reddit_edges
from .common import PhaseTimer, peak_rss_mb, resolve_input, write_report


def run(
    spark: SparkSession,
    datafile: str,
    partitions: int | None = None,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    sample_size: int = 10_000,
) -> dict:
    t = PhaseTimer()
    with t.time("load"):
        posts = resolve_input(spark, datafile, partitions)
        edges = reddit_edges(posts)
    with t.time("pagerank"):
        # sample_fraction stays None: the library derives it as
        # min(1, sample_size/N) — the reference CLI's semantics.
        scores, iters = pagerank(
            edges,
            damping=damping,
            max_iter=max_iter,
            tol=tol,
            sample_size=sample_size,
        )
        top10 = [(r["node"], r["score"]) for r in pagerank_topk(scores, 10).collect()]
    return {
        "phases": t.phases,
        "total_sec": t.total,
        "peak_rss_mb": round(peak_rss_mb(), 2),
        "iterations": iters,
        "top10": top10,
    }


def main(argv: list[str] | None = None) -> str:
    p = argparse.ArgumentParser(description="PageRank (reference CLI surface)")
    p.add_argument("-f", "--datafile", required=True)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--damping-factor", type=float, default=0.85)
    p.add_argument("--max-iterations", type=int, default=20)
    p.add_argument("--convergence-threshold", type=float, default=1e-6)
    # Reference flag name/type (pagerank_spark.py:223-224): a sample
    # SIZE; the library derives the fraction from it per graph.
    p.add_argument("--convergence-sample-size", type=int, default=10_000)
    args = p.parse_args(argv)
    spark = get_spark(app_name="pagerank-pipeline")
    res = run(
        spark,
        args.datafile,
        args.partitions,
        args.damping_factor,
        args.max_iterations,
        args.convergence_threshold,
        args.convergence_sample_size,
    )
    lines = [
        "PAGERANK RESULTS (spark engine)",
        f"dataset: {args.datafile}",
        f"total time: {res['total_sec']} s  iterations: {res['iterations']}",
        f"peak memory: {res['peak_rss_mb']} MB",
        "top 10:",
    ] + [f"  {n}: {s:.6f}" for n, s in res["top10"]]
    return write_report("pagerank", args.datafile, lines)


if __name__ == "__main__":
    print(main())
