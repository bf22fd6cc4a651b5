"""Structured Streaming surface: windowed aggregate over a file-source
stream must equal the same aggregate computed in batch; sessionization
batch twin sanity."""

import pytest
from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.sources import load_table
from big_data_hdfs_ray_vs_spark_spark.streaming import (
    run_to_memory,
    session_stats,
    sessionize_batch,
    stream_events_dir,
    windowed_event_stats,
)

SF = "/root/testdata/sf0.001"


def test_windowed_stream_matches_batch(spark, tmp_path):
    events = load_table(spark, SF, "events").drop("ts_ns")
    src = str(tmp_path / "events_stream")
    events.repartition(4).write.parquet(src)  # 4 files → 4 micro-batch shards

    stream = stream_events_dir(spark, src, max_files=2)
    run_to_memory(windowed_event_stats(stream), "win_stats", output_mode="append")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_stats").collect()
    }

    batch = windowed_event_stats(events)  # same op on a batch df
    max_ts = events.agg(F.max("ts")).first()[0]
    want = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
        # append mode only emits windows closed by the watermark; the
        # final open window stays in state — exclude it from the batch side
        if r["window_end"] <= max_ts
    }
    assert want.items() <= got.items()
    assert len(got) - len(want) <= 5  # at most the last open window per type
    assert len(want) > 10


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 1.0, None),
        (2, "2024-01-01 00:10:00", 1, "click", 2.0, None),
        (3, "2024-01-01 01:00:00", 1, "click", 4.0, None),  # 50min gap → new session
        (4, "2024-01-01 00:05:00", 2, "view", 8.0, None),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    s = {(r["user_id"], r["event_id"]): r["session_idx"]
         for r in sessionize_batch(events).collect()}
    assert s[(1, 1)] == 1 and s[(1, 2)] == 1 and s[(1, 3)] == 2
    assert s[(2, 4)] == 1
    stats = {(r["user_id"], r["session_idx"]): r for r in session_stats(events).collect()}
    assert stats[(1, 1)]["n_events"] == 2
    assert stats[(1, 1)]["duration_sec"] == 600.0
    assert stats[(1, 2)]["duration_sec"] == 0.0


def test_session_window_stream_matches_batch_twin(spark, tmp_path):
    from big_data_hdfs_ray_vs_spark_spark.streaming import session_window_stats_stream

    events = load_table(spark, SF, "events").drop("ts_ns")
    src = str(tmp_path / "events_sess")
    events.repartition(4).write.parquet(src)

    stream = stream_events_dir(spark, src, max_files=2)
    run_to_memory(
        session_window_stats_stream(stream, gap="30 minutes"),
        "sess_stream",
        output_mode="append",
    )
    got = sorted(
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    )

    # batch lag()-twin sessions, excluding each user's final session
    # (append mode holds the last open session in state at the watermark)
    batch = session_stats(events, gap_seconds=1800)
    last = batch.groupBy("user_id").agg(F.max("session_idx").alias("session_idx"))
    closed = batch.join(last, on=["user_id", "session_idx"], how="left_anti")
    want = sorted(
        (r["user_id"], r["n_events"], r["sum_value"]) for r in closed.collect()
    )
    assert set(want) <= set(got)
    assert len(got) >= len(want)
    assert len(want) > 50


def test_stateful_anomaly_stream_matches_batch_twin(spark, tmp_path):
    """applyInPandasWithState carries Welford state across micro-batches:
    time-ordered file chunks (mtime-forced order, maxFilesPerTrigger=1)
    must reproduce the single-pass batch recurrence exactly."""
    import os
    import time as _time

    from big_data_hdfs_ray_vs_spark_spark.streaming.stateful import (
        anomaly_flags_batch,
        anomaly_flags_stream,
    )
    from big_data_hdfs_ray_vs_spark_spark.streaming.windows import stream_events_dir

    events = load_table(spark, SF, "events").drop("ts_ns")
    src = tmp_path / "events_chunks"
    src.mkdir()
    # 4 time-ordered chunks; mtime forces the file-source processing order
    rows = events.orderBy("ts", "event_id").collect()
    n = len(rows)
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    for i in range(4):
        chunk = spark.createDataFrame(rows[cuts[i] : cuts[i + 1]], events.schema)
        p = str(src / f"chunk{i}")
        chunk.coalesce(1).write.parquet(p)
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (1000000 + i * 100, 1000000 + i * 100))

    stream = stream_events_dir(spark, str(src) + "/chunk*", max_files=1)
    run_to_memory(anomaly_flags_stream(stream, k=2.0, min_obs=5), "anoms", "append")
    got = sorted(
        (r["user_id"], r["event_id"], round(r["zscore"], 6))
        for r in spark.sql("SELECT * FROM anoms").collect()
    )
    want = sorted(
        (r["user_id"], r["event_id"], round(r["zscore"], 6))
        for r in anomaly_flags_batch(events, k=2.0, min_obs=5).collect()
    )
    assert got == want
    assert len(want) > 0


def test_anomaly_prefix_window_matches_welford_batch(spark):
    """The codegen prefix-window formulation (q34's path) must equal the
    Welford row recurrence event-for-event — same flags, same zscores."""
    from big_data_hdfs_ray_vs_spark_spark.streaming.stateful import (
        anomaly_flags_batch,
        anomaly_flags_prefix,
    )

    events = load_table(spark, SF, "events")
    fast = sorted(
        (r["user_id"], r["event_id"], round(r["zscore"], 6))
        for r in anomaly_flags_prefix(events, k=2.0, min_obs=5).collect()
    )
    slow = sorted(
        (r["user_id"], r["event_id"], round(r["zscore"], 6))
        for r in anomaly_flags_batch(events, k=2.0, min_obs=5).collect()
    )
    assert fast == slow
    assert len(fast) > 0


def test_anomaly_twins_agree_and_survive_null_values(spark):
    """A null value is not an observation: it must neither be scored
    nor fold NaN into the Welford state (which would silently disable
    detection for the key), and the prefix/batch twins must agree on a
    stream containing one."""
    import datetime

    from big_data_hdfs_ray_vs_spark_spark.streaming.stateful import (
        anomaly_flags_batch,
        anomaly_flags_prefix,
    )

    base = datetime.datetime(2026, 1, 1)
    vals = [10.0, 10.1, 9.9, 10.0, 10.2, None, 9.8, 50.0]  # 50.0 is the outlier
    rows = [
        (1, i, base + datetime.timedelta(seconds=i), v) for i, v in enumerate(vals)
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    fast = sorted(
        (r["event_id"], round(r["zscore"], 6))
        for r in anomaly_flags_prefix(events, k=3.0, min_obs=5).collect()
    )
    slow = sorted(
        (r["event_id"], round(r["zscore"], 6))
        for r in anomaly_flags_batch(events, k=3.0, min_obs=5).collect()
    )
    assert fast == slow
    assert [eid for eid, _ in fast] == [7]  # the outlier still flags


def test_dedup_stream_matches_batch_twin(spark, tmp_path):
    import datetime

    from big_data_hdfs_ray_vs_spark_spark.streaming import dedup_stream

    base = datetime.datetime(2026, 1, 1)
    texts = [
        "alpha beta gamma", "delta epsilon", "alpha beta gamma",  # dup of 0
        "zeta eta", "delta epsilon", "unique theta",              # dup of 1
    ]
    rows = [(i, t, base + datetime.timedelta(minutes=i)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    src = str(tmp_path / "docs_stream")
    docs.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    run_to_memory(dedup_stream(stream), "dedup_out", output_mode="append")
    got = [r["__h"] for r in spark.sql("SELECT * FROM dedup_out").collect()]
    want = [r["__h"] for r in dedup_stream(docs).collect()]
    # First-seen doc per hash is arbitrary in both modes; the emitted
    # hash multiset (one per distinct content) must agree.
    assert sorted(got) == sorted(want)
    assert len(got) == 4


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    from big_data_hdfs_ray_vs_spark_spark.streaming import (
        enrich_stream,
        user_profile_dim,
    )

    events = load_table(spark, SF, "events").drop("ts_ns")
    src = str(tmp_path / "events_enrich")
    events.repartition(4).write.parquet(src)
    dim = user_profile_dim(events)

    stream = stream_events_dir(spark, src, max_files=2)
    run_to_memory(enrich_stream(stream, dim, on="user_id"), "enriched")
    got = {
        r["event_id"]: (r["lifetime_events"], r["lifetime_avg_value"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }

    want = {
        r["event_id"]: (r["lifetime_events"], r["lifetime_avg_value"])
        for r in events.join(dim, on="user_id").collect()
    }
    assert got == want  # stream-static join == batch join, every event enriched
    assert len(got) == events.count()


def test_enrich_stream_rejects_unsupported_how(spark):
    import pytest
    from big_data_hdfs_ray_vs_spark_spark.streaming import enrich_stream

    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError):
        enrich_stream(ev, ev, on="user_id", how="full")


def test_windowed_histogram_stream_matches_batch_and_quantiles(spark, tmp_path):
    """The emitted (window, type, bin) counts equal the batch sketch
    state, and quantiles derived from the emitted state equal
    operators.sketches.histogram_quantiles on the same slice."""
    from big_data_hdfs_ray_vs_spark_spark.operators import sketches
    from big_data_hdfs_ray_vs_spark_spark.streaming import windowed_value_histogram

    events = load_table(spark, SF, "events").drop("ts_ns")
    src = str(tmp_path / "ev_hist_stream")
    events.repartition(4).write.parquet(src)

    stream = stream_events_dir(spark, src, max_files=2)
    run_to_memory(windowed_value_histogram(stream), "hist_state", output_mode="append")
    got = {
        (str(r["window_start"]), r["event_type"], r["bin"]): r["n"]
        for r in spark.sql("SELECT * FROM hist_state").collect()
    }

    batch = windowed_value_histogram(events)
    max_ts = events.agg(F.max("ts")).first()[0]
    closed = [r for r in batch.collect() if r["window_end"] <= max_ts]
    want = {
        (str(r["window_start"]), r["event_type"], r["bin"]): r["n"] for r in closed
    }
    assert want.items() <= got.items()

    # Quantiles read off the emitted state match the batch sketch op on
    # one closed (window, event_type) slice.
    if closed:
        ws = closed[0]["window_start"]
        et = closed[0]["event_type"]
        slice_ev = events.filter(
            (F.window("ts", "1 hour").start == F.lit(ws)) & (F.col("event_type") == et)
        )
        [direct] = sketches.histogram_quantiles(
            slice_ev, "value", ["event_type"], quantiles=(0.5,)
        ).collect()
        state = sorted(
            ((k[2], v) for k, v in got.items() if k[0] == str(ws) and k[1] == et)
        )
        total = sum(n for _b, n in state)
        cum, p50 = 0, None
        for b, n in state:
            cum += n
            if p50 is None and cum >= -(-total // 2):  # ceil(total/2)
                p50 = 0.0 + (b + 1) * 10.0
        assert p50 == direct["p50"]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    from big_data_hdfs_ray_vs_spark_spark.streaming import (
        interval_join_batch,
        interval_join_stream,
        run_to_memory,
        stream_events_dir,
    )

    # Watermarks require TIMESTAMP (with zone); the session is pinned
    # UTC so the cast from NTZ is a pure reinterpret.
    events = load_table(spark, SF, "events").drop("ts_ns").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("pid")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("cid")
    )
    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    purchases.repartition(3).write.parquet(pdir)
    clicks.repartition(3).write.parquet(cdir)

    # A watermark far larger than the data span → no state eviction, so
    # the stream result must be EXACTLY the batch join (the semantics
    # check; eviction is a capacity knob, not a semantics one).
    sp = stream_events_dir(spark, pdir, max_files=1, schema=purchases.schema)
    sc = stream_events_dir(spark, cdir, max_files=1, schema=clicks.schema)
    out = interval_join_stream(
        sp, sc, key="user_id", ts="ts", lookback="1 HOUR", watermark="3650 days"
    )
    run_to_memory(out, "ssj", output_mode="append")
    got = sorted(
        (r["user_id"], r["l_ts"], r["r_ts"], r["l_pid"], r["r_cid"])
        for r in spark.sql("SELECT * FROM ssj").collect()
    )

    want = sorted(
        (r["user_id"], r["l_ts"], r["r_ts"], r["l_pid"], r["r_cid"])
        for r in interval_join_batch(
            purchases, clicks, key="user_id", ts="ts", lookback="1 HOUR"
        ).collect()
    )
    assert len(want) > 0
    assert got == want


def test_upsert_sink_latest_state(spark, tmp_path):
    """Streaming CDC landing: the synthetic_events stream drains through
    the foreachBatch MERGE sink; the final parquet state holds exactly
    one row per user carrying that user's max event_id — identical to
    the batch-computed answer over the same deterministic generator."""
    from pyspark.sql import functions as F

    from big_data_hdfs_ray_vs_spark_spark.sources.pyds import (
        _event_row,
        register_python_sources,
    )
    from big_data_hdfs_ray_vs_spark_spark.streaming.upsert import upsert_query

    register_python_sources(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 60)
        .option("partitions", 2)
        .option("maxRows", 180)
        .load()
    )
    state = str(tmp_path / "state")
    q = upsert_query(
        stream, state, str(tmp_path / "ckpt"), key="user_id", seq_col="event_id"
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)

    got = {r["user_id"]: r for r in spark.read.parquet(state).collect()}
    # batch twin: same rows from the pure generator function; the stream
    # drains in whole 60-row batches, so the drained prefix is inferable
    # from the max event_id that landed.
    expect = {}
    drained = 60 * max(1, (max(r["event_id"] for r in got.values()) + 60) // 60)
    rows = [_event_row(i) for i in range(0, min(drained, 180))]
    for eid, uid, etype, value in rows:
        if uid not in expect or eid >= expect[uid][0]:
            expect[uid] = (eid, etype, value)
    assert set(got) == set(expect)
    for uid, (eid, etype, value) in expect.items():
        r = got[uid]
        assert (r["event_id"], r["event_type"], r["value"]) == (eid, etype, value)


def test_upsert_sink_replay_is_idempotent(spark, tmp_path):
    """Re-applying an old batch cannot roll state backwards (the
    monotonic seq guard) — the retry/replay safety the sink claims."""
    from big_data_hdfs_ray_vs_spark_spark.streaming.upsert import (
        merge_batch_into_state,
    )

    state = str(tmp_path / "state2")
    b1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 11, "b")], "user_id long, event_id long, v string"
    )
    b2 = spark.createDataFrame(
        [(1, 20, "a2"), (3, 21, "c")], "user_id long, event_id long, v string"
    )
    merge_batch_into_state(spark, state, b1, key="user_id", seq_col="event_id")
    merge_batch_into_state(spark, state, b2, key="user_id", seq_col="event_id")
    merge_batch_into_state(spark, state, b1, key="user_id", seq_col="event_id")  # replay
    got = {r["user_id"]: r for r in spark.read.parquet(state).collect()}
    assert got[1]["event_id"] == 20 and got[1]["v"] == "a2"  # not rolled back
    assert got[2]["event_id"] == 11 and got[3]["event_id"] == 21


def test_upsert_sink_recovers_interrupted_swap(spark, tmp_path):
    """Crash window between the two swap renames: the state dir is
    gone but state__old is intact — the next merge must restore it and
    keep every previously merged key (not rebuild from empty)."""
    import os

    from big_data_hdfs_ray_vs_spark_spark.streaming.upsert import (
        merge_batch_into_state,
    )

    state = str(tmp_path / "state3")
    b1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 11, "b")], "user_id long, event_id long, v string"
    )
    b2 = spark.createDataFrame([(3, 21, "c")], "user_id long, event_id long, v string")
    merge_batch_into_state(spark, state, b1, key="user_id", seq_col="event_id")
    os.rename(state, state + "__old")  # simulate dying mid-swap
    merge_batch_into_state(spark, state, b2, key="user_id", seq_col="event_id")
    got = {r["user_id"]: r["event_id"] for r in spark.read.parquet(state).collect()}
    assert got == {1: 10, 2: 11, 3: 21}


def test_hll_stream_state_equals_batch_sketch(spark, tmp_path):
    """Streaming cardinality monitor: drain a file stream through the
    register max-merge sink; the final 256-row state and its estimate
    are IDENTICAL to the one-shot batch sketch of the same rows."""
    from big_data_hdfs_ray_vs_spark_spark.operators import sketches
    from big_data_hdfs_ray_vs_spark_spark.streaming.cardinality import (
        hll_stream_query,
        state_estimate,
    )

    events = load_table(spark, SF, "events").drop("ts_ns")
    src = str(tmp_path / "hll_src")
    events.repartition(4).write.parquet(src)

    stream = stream_events_dir(spark, src, max_files=1)  # 4 micro-batches
    state = str(tmp_path / "hll_state")
    q = (
        hll_stream_query(stream, state, str(tmp_path / "hll_ckpt"), key="user_id")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got_regs = sorted(spark.read.parquet(state).collect())
    want_regs = sorted(sketches.hll_registers(events, "user_id").collect())
    assert got_regs == want_regs
    assert (
        state_estimate(spark, state).first()
        == sketches.hll_estimate(sketches.hll_registers(events, "user_id")).first()
    )


def test_hll_stream_replay_is_idempotent(spark, tmp_path):
    """max-merge is algebraically idempotent: re-applying a batch
    leaves the register state bit-identical (no seq guard needed)."""
    from big_data_hdfs_ray_vs_spark_spark.streaming.cardinality import (
        merge_registers_into_state,
    )

    state = str(tmp_path / "hll_state2")
    batch1 = spark.range(0, 500).select(F.col("id").alias("k"))
    batch2 = spark.range(400, 900).select(F.col("id").alias("k"))
    merge_registers_into_state(spark, state, batch1, "k")
    merge_registers_into_state(spark, state, batch2, "k")
    once = sorted(spark.read.parquet(state).collect())
    merge_registers_into_state(spark, state, batch1, "k")  # replay
    assert sorted(spark.read.parquet(state).collect()) == once


def test_windowed_psi_stream_matches_batch_and_detects_shift(spark, tmp_path):
    """One stateful aggregation per stream (Spark's limit): the PSI is
    folded into the window aggregate against literal reference shares.
    Stream output equals the batch twin for closed windows, a window
    drawn FROM the reference distribution reads ~0, and a shifted
    window reads large."""
    from big_data_hdfs_ray_vs_spark_spark.streaming import (
        reference_shares,
        windowed_psi,
    )

    events = load_table(spark, SF, "events").drop("ts_ns")
    ref = reference_shares(events, "value", lo=0.0, hi=100.0, bins=10)
    assert len(ref) == 12 and abs(sum(ref) - 1.0) < 1e-9

    src = str(tmp_path / "ev_psi_stream")
    events.repartition(4).write.parquet(src)
    stream = stream_events_dir(spark, src, max_files=2)
    run_to_memory(
        windowed_psi(stream, ref, "value"), "psi_state", output_mode="append"
    )
    got = {
        str(r["window_start"]): (r["n_events"], r["psi"])
        for r in spark.sql("SELECT * FROM psi_state").collect()
    }

    batch = windowed_psi(events, ref, "value")
    max_ts = events.agg(F.max("ts")).first()[0]
    closed = {
        str(r["window_start"]): (r["n_events"], r["psi"])
        for r in batch.collect()
        if r["window_end"] <= max_ts
    }
    assert closed.items() <= got.items()
    assert closed, "expected at least one closed window"

    # self-comparison: the full corpus against its own reference — the
    # per-window PSIs are small (same generator), and a deliberately
    # shifted window is LOUD
    shifted = events.withColumn("value", F.col("value") + F.lit(1000.0))
    loud = windowed_psi(shifted, ref, "value").agg(F.min("psi")).first()[0]
    assert loud > 1.0  # everything lands in the overflow bin


def test_windowed_psi_validates_ref_length(spark):
    from big_data_hdfs_ray_vs_spark_spark.streaming import windowed_psi

    events = load_table(spark, SF, "events").drop("ts_ns")
    with pytest.raises(ValueError, match="bins"):
        windowed_psi(events, [0.5, 0.5], bins=10)
