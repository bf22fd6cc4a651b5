"""Testdata table registry: parquet scans over /root/testdata/sf*/.

Scans are plain ``spark.read.parquet`` so predicate pushdown, column
pruning and partition-splitting are Catalyst's problem, not ours. At
100 TB these tables would be partitioned/bucketed; the reader API is the
same either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def _tune_local_session(spark: SparkSession) -> None:
    """Right-size shuffle parallelism for local sessions built without
    the engine's factory (session.py).

    A default session keeps Spark's 200 shuffle partitions. AQE cannot
    re-coalesce an exchange that feeds a cached plan
    (spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=false),
    so iterative queries (plans/iterate.py persists per round) would
    pay 200-task rounds on a 8–32-core local box. Runtime-settable, so
    align it at the point of use; sessions that already tuned the conf
    (any value but the untouched 200 default) are left alone."""
    try:
        master = spark.conf.get("spark.master", "")
        if master.startswith("local") and spark.conf.get(
            "spark.sql.shuffle.partitions"
        ) == "200":
            cores = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 8)))
    except Exception:
        pass  # never let tuning break a read


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    _tune_local_session(spark)
    if name == "events":
        # Some testdata generations write events.parquet with
        # TIMESTAMP(NANOS), which Spark rejects by default
        # (PARQUET_TYPE_ILLEGAL). The conf is a runtime-settable SQL
        # conf, so set it at the point of use — callers (including
        # harnesses that build their own default session) must not need
        # to know about it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events_ts(df)
        # An event without its identity dimensions — a timestamp, an
        # actor, a type — is malformed and rejected at ingest (the
        # sibling rule to the NULL-embedding guard below): every
        # event query keys, windows, or sessionizes on these, and a
        # NULL key group renders as nullable-int drift in the driver's
        # pandas hash. Oracles mirror this via the events shadow CTE
        # (oracles._guard_events).
        df = df.filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
        )
        # A NON-FINITE measurement is not an observation: ±Inf poisons
        # every sum/mean/percentile it touches (and DuckDB's quantile/
        # regr_* abort outright), and NaN's ordering inside exact
        # percentiles is engine-erratic (DuckDB quantile_cont returns
        # NaN for some input shapes and sorts it away in others, Spark
        # sorts it greatest — q78 diverged the moment a group's parity
        # made the median interpolate). The event itself is still
        # real — counts and sessions keep it — so nullify the value,
        # don't drop the row; NULL is the one non-observation token
        # both engines treat identically everywhere. Oracles mirror
        # via the __events guard's REPLACE(isfinite).
        v = F.col("value")
        df = df.withColumn(
            "value",
            F.when(~F.isnan(v) & (F.abs(v) != F.lit(float("inf"))), v),
        )
    if name == "embeddings":
        # A NULL embedding (failed embedding job) is not a vector, and
        # a vector without an id cannot be retrieved, deduped, or
        # joined — both are rejected at the load boundary (the
        # engine-wide invariant, enforced HERE so every consumer —
        # queries, register_views/spark.sql, future operators — gets it
        # without knowing). Oracles mirror this via the __embeddings
        # shadow CTE (oracles._guard_tables); a NULL id surviving to an
        # output column would also render as nullable-int float drift
        # through the driver's pandas hash.
        df = df.filter(F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())
        # A vector with a non-finite component is not a vector either:
        # one NaN/Inf element makes every dot product, norm, and
        # centroid it touches NaN — and NaN ordering differs enough
        # across engines to scramble top-k cuts. exists() on an empty
        # array is false, so zero-length vectors pass (the zero-vector
        # rule — no cosine — stays a query-layer concern).
        nonfinite = F.exists(
            "embedding",
            lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
        )
        df = df.filter(~nonfinite)
    if name == "documents":
        # Same identity rule for the corpus: a document without an id
        # is malformed at ingest — every dedup/similarity/curation op
        # keys on doc_id, and a NULL key group diverges between engines
        # (NULL joins match nowhere, NULL groups render as float drift).
        df = df.filter(F.col("doc_id").isNotNull())
    return df


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Stable contract for the events table regardless of how the ts
    column was physically written: ``ts`` is a timestamp usable in
    windows/session_windows, ``ts_ns`` is the exact epoch-nanosecond
    bigint for total ordering. Handles TIMESTAMP(NANOS)-as-long
    (nanosAsLong) and native micros (TIMESTAMP / TIMESTAMP_NTZ)."""
    from ..functions import epoch_us

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # NANOS read as long: keep the exact ns value for ordering and
        # expose a micros-truncated naive timestamp. Integer DIV — a
        # double division would lose precision at 1e18.
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts DIV 1000, TIMESTAMP_NTZ'1970-01-01')"),
        )
    if dt in ("timestamp", "timestamp_ntz"):
        return df.withColumn("ts_ns", epoch_us("ts") * F.lit(1000))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
