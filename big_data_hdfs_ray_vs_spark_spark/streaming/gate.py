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

# Spawning the Python streaming-source runner (a fresh non-daemon
# worker per start()) intermittently exceeds the JVM's 15 s
# connect-back timeout on a loaded host and kills the leg with
# "Python worker failed to connect back". A leg that dies there
# committed nothing, and every gate leg resumes the same checkpoint
# under an exactly-once sink commit log — so replaying the leg is the
# restart semantics these gates exist to exercise, not a result change.
_SPAWN_ERR = "Python worker failed to connect back"


def _await_leg(start_fn, attempts: int = 5) -> None:
    """Run one availableNow leg (start + awaitTermination), replaying
    it on the flaky worker-spawn timeout above (bounded attempts; any
    other failure propagates unchanged). Backs off 2·i seconds between
    attempts: the spawn timeout comes from transient host-load spikes
    (fork+exec+import of a fresh interpreter under CPU steal), and
    immediate retries land inside the same spike — observed 4/4
    consecutive misses on a loaded box vs. first-retry success after a
    pause."""
    import time as _time

    from pyspark.errors import StreamingQueryException

    last: Exception | None = None
    for i in range(attempts):
        try:
            start_fn().awaitTermination()
            return
        except StreamingQueryException as e:
            if _SPAWN_ERR not in str(e):
                raise
            last = e
            _time.sleep(2 * (i + 1))
    raise last


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
    # Pin a bounded state-partition count BEFORE the checkpoint exists
    # (the q205/q213 convention this gate predates): the state store
    # runs one read/commit per partition per leg, and a measured leg is
    # 7.2 s at the session's 32 partitions vs 2.9 s at 8 for the same
    # |event_types|-row state. Restored after the drain loop.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
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
        _await_leg(
            lambda: agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        state = spark.sql(f"SELECT coalesce(sum(n_events), 0) AS n FROM {name}")
        drained = state.collect()[0]["n"]
        if drained >= max_rows:
            break
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
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


# Session-window gate dials, single-sourced with the q205 oracle
# (oracles._stream_sessions_sql). Event-time is DERIVED from the
# replayable source's event_id (ts = base + id seconds — monotone
# across batches, so the watermark advances cleanly); ids at and past
# SESSION_FLUSH_ID become far-future FLUSH markers whose only job is
# to push the final watermark past every real session's end+gap (an
# append-mode session aggregate emits a session only once the
# watermark passes it — without the marker the tail sessions would sit
# in the state store forever under availableNow). TWO flush waves, one
# micro-batch each (the wave split aligns to rows_per_batch): batch
# N's watermark is computed from batch N-1's data and emission happens
# DURING a batch, so wave A (+10M s) raises the watermark past every
# real session and wave B (+20M s) is the successor batch that
# actually emits under it — with a single wave the tail sessions
# would sit in the state store forever (a fresh availableNow leg with
# no new offsets never plans a batch, so there is no no-data batch to
# flush them).
SESSION_GATE_MAX_ROWS = 6000
SESSION_FLUSH_ID = 3000
SESSION_GATE_ROWS_PER_BATCH = 1500
SESSION_GAP_S = 60
SESSION_KEYS = 25
SESSION_BASE_TS = "2024-01-01 00:00:00"


def stream_session_windows(
    spark: SparkSession,
    checkpoint_dir: str | None = None,
    out_dir: str | None = None,
) -> DataFrame:
    """REAL micro-batch session-window aggregation — the second
    genuinely-streaming registry path (q164 proves complete-mode hash
    aggregation + checkpoint replay; this proves the APPEND-mode
    watermark machinery: F.session_window state merge, event-time
    watermark advance, late-emission on watermark pass, and an
    exactly-once FILE sink whose _spark_metadata survives restarts).

    The synthetic_events stream exposes one rows_per_batch micro-batch
    per start() leg, and an append session aggregate emits a session
    only when the watermark (computed from the PREVIOUS batch) passes
    session_end + gap — so the run is a genuine multi-leg restart
    loop: each leg resumes the same checkpoint, processes one batch,
    and emits the sessions the previous leg's data closed. Flush
    markers (ids >= SESSION_FLUSH_ID, session key -1) land in the last
    data batch and push the watermark past every real session; the
    loop drains until the sink holds all SESSION_FLUSH_ID real events.
    The flush session itself never closes (watermark stops AT its
    start) and is filtered by key.

    Returns one row per session: (skey, session_start_s,
    session_end_s, n_events, sum_value) with offsets in seconds from
    SESSION_BASE_TS. State bound: |open sessions| ≈ keys; at
    production scale the same plan runs continuous triggers against
    Kafka with the identical state shape."""
    import tempfile

    from ..sources.pyds import register_python_sources

    register_python_sources(spark)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="sess_gate_ckpt_")
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="sess_gate_sink_")
    # The state store partition count is frozen into the checkpoint at
    # first start and a default session still carries Spark's 200 —
    # 200 state partitions × 5 restart legs of per-partition fixed
    # cost for a |keys|-row state. Pin a bounded count for the gate
    # run and restore the caller's setting after (the q164 lesson,
    # applied before the checkpoint exists rather than after).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # Explicit batch schedule (3 legs instead of 4): every leg is
    # ~3 s of fixed micro-batch machinery (measured), so the two real-
    # event batches merge into one [0, FLUSH_ID) batch while each
    # flush wave keeps its own batch — emission still needs wave A's
    # watermark computed before wave B's batch runs. The session set
    # is a pure function of event TIMES (derived from event_id), so
    # the final emitted rows — and the closed-form oracle — are
    # batch-structure-independent; the wave formula below still keys
    # on SESSION_GATE_ROWS_PER_BATCH, unchanged.
    boundaries = (
        f"{SESSION_FLUSH_ID},"
        f"{SESSION_FLUSH_ID + SESSION_GATE_ROWS_PER_BATCH},"
        f"{SESSION_GATE_MAX_ROWS}"
    )
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", str(SESSION_GATE_ROWS_PER_BATCH))
        .option("batchBoundaries", boundaries)
        .option("partitions", "4")
        .option("maxRows", str(SESSION_GATE_MAX_ROWS))
        .load()
    )
    base = F.to_timestamp(F.lit(SESSION_BASE_TS))
    real = F.col("event_id") < SESSION_FLUSH_ID
    ev = stream.select(
        F.when(real, F.col("user_id") % SESSION_KEYS)
        .otherwise(F.lit(-1))
        .alias("skey"),
        F.when(
            real,
            F.timestamp_add("SECOND", F.col("event_id").cast("int"), base),
        )
        .otherwise(
            F.timestamp_add(
                "SECOND",
                (
                    F.lit(10_000_000)
                    * (
                        F.lit(1)
                        + (F.col("event_id") - F.lit(SESSION_FLUSH_ID))
                        / F.lit(SESSION_GATE_ROWS_PER_BATCH)
                    ).cast("int")
                ).cast("int"),
                base,
            )
        )
        .alias("ts"),
        F.col("value"),
    )
    agg = (
        ev.withWatermark("ts", "0 seconds")
        .groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w"), "skey"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact order-independent addition (the q26/q164 convention)
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "skey",
            F.col("w.start").alias("__start"),
            F.col("w.end").alias("__end"),
            "n_events",
            "sum_value",
        )
    )
    drained = 0
    for _leg in range(32):
        _await_leg(
            lambda: agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # Legs 1-2 provably emit nothing under the 3-boundary schedule
        # (a session emits only once a LATER batch's watermark passes
        # it: leg 1 is the real-event batch, leg 2 is wave A whose
        # watermark raise takes effect in leg 3) — skip their drain
        # checks (two parquet-scan jobs) and start verifying from the
        # first leg that can possibly complete. The loop still proves
        # drained >= FLUSH before returning, and still runs extra
        # checked legs if the schedule ever changed (r10 job-floor
        # pass; leg count and emitted rows unchanged).
        if _leg < 2:
            continue
        emitted = spark.read.parquet(out_dir).filter(F.col("skey") >= 0)
        drained = emitted.agg(
            F.coalesce(F.sum("n_events"), F.lit(0))
        ).collect()[0][0]
        if drained >= SESSION_FLUSH_ID:
            break
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if drained < SESSION_FLUSH_ID:
        raise RuntimeError(
            f"session gate emitted only {drained}/{SESSION_FLUSH_ID} events"
        )
    from ..functions import epoch_us

    base_col = F.to_timestamp(F.lit(SESSION_BASE_TS))
    out = spark.read.parquet(out_dir).filter(F.col("skey") >= 0)
    return out.select(
        F.col("skey").cast("long").alias("skey"),
        ((epoch_us(F.col("__start")) - epoch_us(base_col)) / 1_000_000)
        .cast("long")
        .alias("session_start_s"),
        ((epoch_us(F.col("__end")) - epoch_us(base_col)) / 1_000_000)
        .cast("long")
        .alias("session_end_s"),
        F.col("n_events").cast("long").alias("n_events"),
        F.round("sum_value", 2).alias("sum_value"),
    )


# Dedup-gate dials (q213), single-sourced with the oracle. Every id in
# [0, DEDUP_KEYS) appears exactly TWICE in the stream (as event_id k
# and k + DEDUP_KEYS), and the batch split guarantees the two copies
# land in DIFFERENT micro-batches — so the drop is a genuine
# cross-batch state lookup, not an in-batch distinct.
DEDUP_GATE_KEYS = 2000
DEDUP_GATE_MAX_ROWS = 4000


def stream_dedup_rollup(
    spark: SparkSession,
    checkpoint_dir: str | None = None,
    out_dir: str | None = None,
) -> DataFrame:
    """The THIRD real streaming gate: cross-batch ``dropDuplicates``
    state. q164 proves complete-mode aggregation state, q205 proves
    append session-window watermark state; this proves the dedup state
    store — first occurrence of each key emits, the duplicate arriving
    in a LATER micro-batch (after a checkpoint restart leg) hits the
    persisted key state and drops.

    dup_key = event_id mod DEDUP_GATE_KEYS; batch 1 carries ids
    [0, KEYS) (all first occurrences — every row emits to the
    exactly-once parquet sink), the restart leg's batch carries
    [KEYS, 2·KEYS) (all duplicates — ZERO rows emit; the run asserts
    both counts, so a dedup-state regression fails loudly rather than
    double-counting). State is |keys| rows — the documented bound; at
    production scale the same plan uses dropDuplicatesWithinWatermark
    for eviction, which this synthetic id-keyed stream cannot exercise
    without fake late data. Returns the per-type rollup of the
    deduped stream (first-copy attributes, exact decimal sums)."""
    import tempfile

    from ..sources.pyds import register_python_sources

    register_python_sources(spark)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="dedup_gate_ckpt_")
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="dedup_gate_sink_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", str(DEDUP_GATE_KEYS))
        .option("partitions", "4")
        .option("maxRows", str(DEDUP_GATE_MAX_ROWS))
        .load()
    )
    deduped = stream.select(
        (F.col("event_id") % DEDUP_GATE_KEYS).alias("dup_key"),
        "event_type",
        "value",
    ).dropDuplicates(["dup_key"])
    counts = []
    for _leg in range(32):
        _await_leg(
            lambda: deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        n = spark.read.parquet(out_dir).count()
        counts.append(n)
        if n >= DEDUP_GATE_KEYS and len(counts) >= 2:
            break
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if counts[-1] != DEDUP_GATE_KEYS:
        raise RuntimeError(
            f"dedup gate emitted {counts[-1]} rows, expected {DEDUP_GATE_KEYS} "
            f"(per-leg {counts}) — duplicate rows crossed the state store"
        )
    out = spark.read.parquet(out_dir)
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
        ).alias("sum_value"),
        F.min("dup_key").cast("long").alias("min_key"),
        F.max("dup_key").cast("long").alias("max_key"),
    )
