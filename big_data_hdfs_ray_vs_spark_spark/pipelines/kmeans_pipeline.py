"""K-means workload, reference CLI surface (kmeans_spark.py:176-185:
-f, --partitions, -k/--clusters, --max-iterations,
--convergence-tolerance, --random-seed)."""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from ..plans.kmeans import cluster_histogram, kmeans_fit
from ..schemas import KMEANS_FEATURES
from ..session import get_spark
from .common import PhaseTimer, peak_rss_mb, resolve_input, write_report


def run(
    spark: SparkSession,
    datafile: str,
    partitions: int | None = None,
    k: int = 3,
    max_iter: int = 20,
    tol: float = 1e-4,
    seed: int = 42,
) -> dict:
    t = PhaseTimer()
    with t.time("load"):
        df = resolve_input(spark, datafile, partitions)
    with t.time("kmeans"):
        centroids, assignments, _model = kmeans_fit(
            df, KMEANS_FEATURES, k=k, max_iter=max_iter, tol=tol, seed=seed
        )
        hist = {r["cluster"]: r["count"] for r in cluster_histogram(assignments).collect()}
        samples = [r.asDict() for r in assignments.select("cluster", "features").limit(5).collect()]
    return {
        "phases": t.phases,
        "total_sec": t.total,
        "peak_rss_mb": round(peak_rss_mb(), 2),
        "centroids": centroids,
        "histogram": hist,
        "samples": [str(s) for s in samples],
    }


def main(argv: list[str] | None = None) -> str:
    p = argparse.ArgumentParser(description="K-means (reference CLI surface)")
    p.add_argument("-f", "--datafile", required=True)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("-k", "--clusters", type=int, default=3)
    p.add_argument("--max-iterations", type=int, default=20)
    p.add_argument("--convergence-tolerance", type=float, default=1e-4)
    p.add_argument("--random-seed", type=int, default=42)
    args = p.parse_args(argv)
    spark = get_spark(app_name="kmeans-pipeline")
    res = run(
        spark,
        args.datafile,
        args.partitions,
        args.clusters,
        args.max_iterations,
        args.convergence_tolerance,
        args.random_seed,
    )
    lines = [
        "KMEANS RESULTS (spark engine)",
        f"dataset: {args.datafile}",
        f"total time: {res['total_sec']} s",
        f"peak memory: {res['peak_rss_mb']} MB",
        f"cluster histogram: {res['histogram']}",
        "centroids:",
    ] + [f"  {c}" for c in res["centroids"]]
    return write_report("kmeans", args.datafile, lines)


if __name__ == "__main__":
    print(main())
