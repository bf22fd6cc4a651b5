"""Scaling probe: time a set of headline queries across the three sf
tiers (10x data each step) and print a markdown table of seconds plus
the 0.01->0.1 growth factor. Near-1x factors at small tiers mean fixed
overhead dominates; the interesting signal is the largest tier's factor
staying well under the 10x data growth (sub-linear constants) and no
query blowing up super-linearly.

Usage: python tools/scale_probe.py [q... (default: headline set)]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from big_data_hdfs_ray_vs_spark_spark.queries import all_queries
from big_data_hdfs_ray_vs_spark_spark.session import get_spark

TIERS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
HEADLINE = [
    "q01_pricing_summary",
    "q13_pagerank",
    "q14_triangles",
    "q17_minhash_pairs",
    "q38_dup_clusters",
    "q43_asof_join",
    "q44_interval_join",
    "q47_tfidf_top_terms",
    "q49_trailing_window",
    "q50_salted_join",
]


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    qs = all_queries()
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen paths once so tier timings are comparable
    qs[names[0]](spark, TIERS[0]).collect()
    spark.catalog.clearCache()
    print("| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | 0.01→0.1 growth |")
    print("|---|---|---|---|---|")
    for name in names:
        secs = []
        for tier in TIERS:
            # min-of-2: single-shot tier timings on a shared host mix
            # in codegen warm-up and co-tenant steal (observed 3-4x
            # swings); the minimum is the de-noised throughput estimate.
            best = None
            for _ in range(2):
                t0 = time.time()
                # collect, NOT count: under count Catalyst prunes the
                # query's real work (a windowed projection loses its
                # whole Window node; aggregates lose their expressions)
                # and the table would time a bare row-count scan.
                qs[name](spark, tier).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                # Clear BETWEEN reps too: queries that persist
                # intermediates would otherwise replay rep 2 from rep
                # 1's cache and min-of-2 would record a cache hit.
                spark.catalog.clearCache()
            secs.append(best)
        growth = secs[2] / secs[1] if secs[1] > 0 else float("nan")
        print(
            f"| {name} | {secs[0]:.2f} | {secs[1]:.2f} | {secs[2]:.2f} |"
            f" {growth:.1f}x on 10x data |"
        )


if __name__ == "__main__":
    main()
