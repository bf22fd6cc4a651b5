"""Shared pipeline plumbing: input resolution, timing, and the
reference's text-report sink format (results/<task>_<engine>_results_
<dataset>_<ts>.txt — display_results in every reference script, e.g.
etl_spark.py:18-76)."""

from __future__ import annotations

import os
import resource
import time

from pyspark.sql import DataFrame, SparkSession

from ..schemas import REDDIT_POSTS
from ..sources.reddit import read_reddit_csv, read_snap_tsv, synthetic_reddit_posts

ENGINE = "spark"


def resolve_input(spark: SparkSession, datafile: str, partitions: int | None) -> DataFrame:
    """-f accepts a CSV path, a raw SNAP TSV path, a parquet path, or
    synthetic:<n_rows>."""
    if datafile.startswith("synthetic:"):
        n = int(datafile.split(":", 1)[1])
        return synthetic_reddit_posts(spark, n, partitions or 32)
    if datafile.endswith(".tsv"):
        return read_snap_tsv(spark, datafile, partitions)
    if datafile.endswith(".parquet") or os.path.isdir(datafile):
        df = spark.read.schema(REDDIT_POSTS).parquet(datafile)
        return df.repartition(partitions) if partitions else df
    return read_reddit_csv(spark, datafile, partitions)


def sample_display(df: DataFrame, n: int = 5) -> str:
    """The reference E-phase's exploration display (etl_spark.py:104-107:
    printSchema + show(5)) as a returned string, so pipelines can log it
    into the text report instead of stdout. Bounded collect: exactly
    ``n`` rows cross the driver boundary."""
    lines = ["root"]
    lines += [f" |-- {name}: {dtype} (nullable = true)" for name, dtype in df.dtypes]
    header = df.columns
    rows = [[str(v) if v is not None else "NULL" for v in r] for r in df.limit(n).collect()]
    widths = [max(len(h), *(len(r[i]) for r in rows)) if rows else len(h) for i, h in enumerate(header)]
    sep = "+" + "+".join("-" * w for w in widths) + "+"
    fmt = lambda vals: "|" + "|".join(v.ljust(w) for v, w in zip(vals, widths)) + "|"  # noqa: E731
    lines += [sep, fmt(header), sep, *[fmt(r) for r in rows], sep]
    return "\n".join(lines)


def peak_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def write_report(task: str, datafile: str, lines: list[str], out_dir: str = "results") -> str:
    dataset = os.path.splitext(os.path.basename(datafile.replace(":", "_")))[0]
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{task}_{ENGINE}_results_{dataset}_{int(time.time())}.txt")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


class PhaseTimer:
    def __init__(self) -> None:
        self.phases: dict[str, float] = {}

    def time(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self_inner):
                self_inner.t0 = time.time()
                return self_inner

            def __exit__(self_inner, *exc):
                timer.phases[name] = round(time.time() - self_inner.t0, 2)
                return False

        return _Ctx()

    @property
    def total(self) -> float:
        return round(sum(self.phases.values()), 2)
