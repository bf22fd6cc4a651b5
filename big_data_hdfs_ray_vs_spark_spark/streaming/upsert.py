"""Streaming upsert sink: foreachBatch → MERGE into a parquet state.

The exactly-once CDC landing pattern: each micro-batch is reduced to
one row per key (latest by ``seq_col``), merged into the current state
with :func:`operators.relational.apply_changes` (one full-outer join),
and the new state replaces the old via a write-then-swap — the batch is
IDEMPOTENT, so Structured Streaming's at-least-once foreachBatch
contract composes to exactly-once state: replaying a batch after a
crash re-derives the same merged table.

Why not ``outputMode("update")`` into a sink directly: file sinks are
append-only in Structured Streaming; keyed in-place updates need either
a transactional table format or exactly this read-merge-swap shape.
State size = |distinct keys|, not stream length; the merge cost per
batch is one shuffle of state ⋈ batch (AQE broadcasts the batch side
when small — the common case).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import apply_changes


def latest_per_key(batch: DataFrame, key: str, seq_col: str) -> DataFrame:
    """One row per key: the row with the greatest (seq_col) — ties
    impossible when seq_col is unique per key within a batch; otherwise
    the tie-break is deterministic on the remaining columns' max."""
    w = Window.partitionBy(key).orderBy(F.desc(seq_col))
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _recover_state(state_path: str) -> None:
    """Restore a swap interrupted by a crash and sweep orphan temp dirs.

    The swap below is rename(state → state__old) then rename(tmp →
    state): a crash between the two leaves no live state dir but an
    intact ``__old`` — rename it back so the replayed batch merges
    against the pre-crash state instead of silently starting from
    empty (which would drop every previously merged key)."""
    import glob

    old = state_path + "__old"
    if not os.path.isdir(state_path) and os.path.isdir(old):
        os.rename(old, state_path)
    for leftover in glob.glob(state_path + "__tmp_*"):
        shutil.rmtree(leftover, ignore_errors=True)


def merge_batch_into_state(
    spark: SparkSession, state_path: str, batch: DataFrame, key: str, seq_col: str
) -> None:
    """Apply one micro-batch to the parquet state at ``state_path``.

    Monotonicity guard: a state row is only replaced when the incoming
    seq is >= the stored one, so replayed (older) batches can't roll a
    key backwards — the property that makes the sink idempotent under
    foreachBatch retries."""
    _recover_state(state_path)
    changes = latest_per_key(batch, key, seq_col).withColumn("op", F.lit("U"))
    if os.path.isdir(state_path):
        base = spark.read.parquet(state_path)
        keep_new = changes.alias("c").join(
            base.select(key, F.col(seq_col).alias("__old_seq")).alias("b"),
            on=key,
            how="left",
        )
        changes = keep_new.filter(
            F.col("__old_seq").isNull() | (F.col(seq_col) >= F.col("__old_seq"))
        ).drop("__old_seq")
        merged = apply_changes(base, changes, key=key)
    else:
        merged = changes.drop("op")
    _commit_state(state_path, merged)


def _commit_state(state_path: str, new_state: DataFrame) -> None:
    """Crash-safe replacement of the parquet state dir (shared by every
    foreachBatch state sink — upsert here, streaming/cardinality.py).

    Swap after the write is fully materialized: any read of the old
    state inside ``new_state``'s plan is forced by the write, so
    replacing the source dir afterwards is safe. Rename-aside instead
    of rmtree-then-rename: a crash after an rmtree would leave NO
    state at all, and the replayed batch would rebuild from empty.
    Every crash point here leaves either the old state live or
    (between the renames) recoverable via _recover_state. On object
    stores this whole swap becomes a manifest/metadata commit."""
    tmp = f"{state_path}__tmp_{uuid.uuid4().hex[:8]}"
    new_state.write.mode("overwrite").parquet(tmp)
    old = state_path + "__old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(state_path):
        os.rename(state_path, old)
    os.rename(tmp, state_path)
    shutil.rmtree(old, ignore_errors=True)


def upsert_query(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    key: str,
    seq_col: str,
):
    """writeStream handle merging every micro-batch into state_path.
    Call .start() / use trigger(availableNow=True) in tests."""
    spark = stream.sparkSession

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        merge_batch_into_state(spark, state_path, batch, key, seq_col)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
