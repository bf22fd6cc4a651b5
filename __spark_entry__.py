"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``big_data_hdfs_ray_vs_spark_spark/``; this module
is a thin adapter over its query registry (queries.py) and oracle set
(oracles.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_hdfs_ray_vs_spark_spark.oracles import all_oracles
from big_data_hdfs_ray_vs_spark_spark.queries import all_queries, q01_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-shaped
    scan→filter→hash-aggregate pipeline (engine spine)."""
    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-data
    extensions). Each callable takes (spark, sf_dir) → DataFrame."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same aliases/rounding).
    Every queries() entry has an oracle: iterative algorithms are
    unrolled CTE chains, sequential recurrences are recursive CTEs or
    prefix windows, hash-based operators use engine-portable hashes."""
    return all_oracles()
