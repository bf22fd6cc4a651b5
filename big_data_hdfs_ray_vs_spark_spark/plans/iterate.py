"""Iterate-until-converged driver with lineage control.

Catalyst does not handle iterative lineage (SURVEY §3.2): each loop
iteration builds a fresh logical plan on top of the previous state, so
without truncation the plan tree grows linearly and the scheduler
eventually drowns. The reference manages this by persist/unpersist per
round (pagerank_spark.py:163,193-196). We do the same, plus a periodic
``localCheckpoint`` to actually sever lineage (persist alone keeps the
full plan for fault recovery — at 1000 executors a lost cached block
would otherwise recompute the whole prefix).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def iterate_until(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    should_stop: Callable[[DataFrame, DataFrame, int], bool],
    max_iter: int = 20,
    checkpoint_every: int = 5,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> tuple[DataFrame, int]:
    """Run ``state = step(state, i)`` until should_stop or max_iter.

    Each new state is persisted and forced (count) before the old one is
    unpersisted; every ``checkpoint_every`` rounds the state is
    localCheckpoint'ed to truncate lineage. Returns (state, iterations).
    """
    state = state.persist(storage_level)
    state.count()
    iterations = 0
    for i in range(max_iter):
        new_state = step(state, i)
        new_state = new_state.persist(storage_level)
        new_state.count()  # force materialization before dropping the old state
        if (i + 1) % checkpoint_every == 0:
            new_state = new_state.localCheckpoint(eager=True)
        iterations = i + 1
        stop = should_stop(state, new_state, i)
        state.unpersist()
        state = new_state
        if stop:
            break
    return state, iterations
