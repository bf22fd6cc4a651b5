"""Streaming distinct-count monitoring: HLL register state.

The mergeability that makes operators.sketches.hll_registers auditable
is exactly what makes it STREAMABLE: per micro-batch, sketch the batch
(256-row bounded output regardless of batch size) and max-merge it into
a parquet register state via the same write-then-swap discipline as
streaming/upsert.py. max() is idempotent and commutative, so replayed
batches after a crash re-derive the identical state — at-least-once
foreachBatch composes to exactly-once registers with NO sequence
column needed (the monotonicity guard the upsert sink has to carry is
free here: merging the same batch twice is a no-op by algebra).

State size is ≤ 256 rows forever; the estimate at any point is
operators.sketches.hll_estimate over the state. This is how you watch
"distinct users/documents so far" on an unbounded stream without a
distinct-aggregate whose state grows with the stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import hll_estimate, hll_registers
from .upsert import _commit_state, _recover_state


def merge_registers_into_state(
    spark: SparkSession, state_path: str, batch: DataFrame, key: str
) -> None:
    """Max-merge one micro-batch's HLL registers into the parquet
    register state (the upsert sink's crash-safe _commit_state swap;
    every crash point leaves the old state live or recoverable)."""
    _recover_state(state_path)
    regs = hll_registers(batch, key)
    if os.path.isdir(state_path):
        base = spark.read.parquet(state_path)
        regs = base.union(regs).groupBy("bucket").agg(F.max("r").alias("r"))
    _commit_state(state_path, regs)


def hll_stream_query(stream: DataFrame, state_path: str, checkpoint: str, key: str):
    """writeStream handle max-merging every micro-batch's registers
    into ``state_path``. Call .start() / trigger(availableNow=True)."""
    spark = stream.sparkSession

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        merge_registers_into_state(spark, state_path, batch, key)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def state_estimate(spark: SparkSession, state_path: str) -> DataFrame:
    """Current distinct-count estimate from the register state."""
    return hll_estimate(spark.read.parquet(state_path))
