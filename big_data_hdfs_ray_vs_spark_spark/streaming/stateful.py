"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windowed/session aggregates (windows.py, sessions.py)
cover associative rollups; this is the escape hatch the brief's
"custom stateful operators" clause refers to: per-key state that is a
genuine sequential recurrence. Example operator: streaming anomaly
flagging with Welford running mean/variance per user — each event is
scored against the state built from all PRIOR events, so it cannot be
expressed as a watermark aggregate.

Scale shape: state is three doubles per user (constant, no growth with
stream length), keys shard across executors by groupBy(user_id), and
each micro-batch moves one Arrow batch per key — the same bounded-state
discipline session_window enforces, but user-defined.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ANOMALY_SCHEMA = "user_id long, event_id long, value double, zscore double"
STATE_SCHEMA = "n long, mean double, m2 double"


def anomaly_flags_stream(
    events: DataFrame, k: float = 3.0, min_obs: int = 10
) -> DataFrame:
    """Emit events whose value deviates more than k·σ from the running
    per-user mean (Welford update; first min_obs events only train)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def score(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        out: list[tuple] = []
        # Concat BEFORE sorting: the runtime may hand one key's
        # micro-batch as several Arrow chunks, and per-chunk sorts
        # would replay events out of global (ts, event_id) order.
        # Memory bound = one key's slice of one micro-batch.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                if pd.isna(v):
                    # A null value is not an observation: scoring it is
                    # meaningless and folding NaN into the Welford
                    # state would poison the key forever. Same rule as
                    # the prefix twin's pre-filter.
                    continue
                v = float(v)
                if n >= min_obs:
                    std = (m2 / n) ** 0.5
                    if std > 0 and abs(v - mean) > k * std:
                        out.append((key[0], int(eid), v, (v - mean) / std))
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
        state.update((n, mean, m2))
        yield pd.DataFrame(out, columns=["user_id", "event_id", "value", "zscore"])

    return events.groupBy("user_id").applyInPandasWithState(
        score, ANOMALY_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def anomaly_flags_batch(events: DataFrame, k: float = 3.0, min_obs: int = 10) -> DataFrame:
    """Batch twin (same recurrence via applyInPandas, one pass per user)
    — the test oracle for the streaming operator."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        n, mean, m2 = 0, 0.0, 0.0
        out: list[tuple] = []
        uid = int(pdf["user_id"].iloc[0])
        for eid, v in zip(pdf["event_id"], pdf["value"]):
            if pd.isna(v):
                continue  # same null rule as the stream / prefix twins
            v = float(v)
            if n >= min_obs:
                std = (m2 / n) ** 0.5
                if std > 0 and abs(v - mean) > k * std:
                    out.append((uid, int(eid), v, (v - mean) / std))
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        return pd.DataFrame(out, columns=["user_id", "event_id", "value", "zscore"])

    return events.groupBy("user_id").applyInPandas(score, ANOMALY_SCHEMA)


def anomaly_flags_prefix(
    events: DataFrame, k: float = 3.0, min_obs: int = 10
) -> DataFrame:
    """Codegen batch twin: the Welford state after n events IS the
    population mean/variance of those events, so scoring each event
    against all PRIOR events is a prefix window aggregate
    (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING) — no Python in the plan.
    One shuffle on user_id; whole-stage codegen end to end. Prefer this
    for batch scoring; anomaly_flags_batch exists as the row-recurrence
    oracle that pins stream ≡ batch ≡ prefix-window equivalence."""
    from pyspark.sql import Window, functions as F

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Null/NaN values are not observations (see the stream twin): drop
    # them BEFORE the window so n_prior counts observations and a NaN
    # can't poison the running mean/variance of everything after it.
    events = events.filter(
        F.col("value").isNotNull() & ~F.isnan(F.col("value").cast("double"))
    )
    scored = events.select(
        "user_id",
        "event_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n_prior"),
        F.avg("value").over(w).alias("mean_prior"),
        F.var_pop("value").over(w).alias("var_prior"),
    )
    return scored.filter(
        (F.col("n_prior") >= min_obs)
        & (F.col("var_prior") > 0)
        & (F.abs(F.col("value") - F.col("mean_prior"))
           > k * F.sqrt("var_prior"))
    ).select(
        "user_id",
        "event_id",
        "value",
        ((F.col("value") - F.col("mean_prior")) / F.sqrt("var_prior")).alias("zscore"),
    )
