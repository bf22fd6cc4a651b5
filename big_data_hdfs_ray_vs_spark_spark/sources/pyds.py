"""Custom Spark 4 Python DataSources (spark.dataSource.register).

The modern extension point for sources the built-in readers don't
cover: each source declares a schema, splits itself into
InputPartitions, and yields rows per partition — the generation runs
ON THE EXECUTORS, one task per partition, so a "load generator" scales
exactly like a parquet scan instead of materializing on the driver.

Two sources:
- ``synthetic_docs`` (batch): deterministic documents-table generator —
  same shape as the testdata ``documents`` table — for corpus-pipeline
  load tests at any scale. Determinism is positional (doc_id-keyed
  md5), so the SAME corpus comes out at any partition count; a row's
  content never depends on which task generated it.
- ``synthetic_events`` (streaming): a DataSourceStreamReader emitting a
  deterministic events stream in fixed-size micro-batches — offsets
  are plain row counters, so every trigger is replayable: restarting
  from a checkpoint regenerates identical batches (the property
  exactly-once sinks need from a replayed source).

Reference parity note: the reference generates load by copying a CSV to
HDFS at 1/5/10 GB tiers (data/get-data.sh); this is the engine-native
equivalent with no staging step.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_VOCAB = (
    "the quick brown fox jumps over lazy dog data spark engine corpus "
    "model train token batch shuffle join filter scan merge stream"
).split()

_LANGS = ["en", "de", "fr", "es", "el"]
_SOURCES = ["web", "wiki", "books", "code"]


def _doc_row(doc_id: int) -> tuple:
    """Deterministic document for a doc_id — pure function of the id
    (md5-seeded), so any partitioning of the id range yields the same
    corpus."""
    h = hashlib.md5(f"doc:{doc_id}".encode()).digest()
    n_words = 5 + h[0] % 40
    words = [
        _VOCAB[hashlib.md5(f"w:{doc_id}:{i}".encode()).digest()[0] % len(_VOCAB)]
        for i in range(n_words)
    ]
    text = " ".join(words)
    return (doc_id, text, _LANGS[h[1] % len(_LANGS)], _SOURCES[h[2] % len(_SOURCES)], len(text))


DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsDataSource(DataSource):
    """spark.read.format("synthetic_docs").option("n", N)
    .option("partitions", P).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return DOCS_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _DocsReader(self.options)


class _DocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        if self.n <= 0:  # empty corpus: zero rows, not a range() error
            return [_RangePartition(0, 0)]
        step = -(-self.n // self.parts)
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for doc_id in range(partition.start, partition.end):
            yield _doc_row(doc_id)


EVENTS_SCHEMA = "event_id long, user_id long, event_type string, value double"

_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _event_row(event_id: int) -> tuple:
    h = hashlib.md5(f"ev:{event_id}".encode()).digest()
    user_id = int.from_bytes(h[0:2], "big") % 500
    etype = _EVENT_TYPES[h[2] % len(_EVENT_TYPES)]
    value = round((int.from_bytes(h[3:5], "big") % 50000) / 100.0, 2)
    return (event_id, user_id, etype, value)


class SyntheticEventsStreamDataSource(DataSource):
    """spark.readStream.format("synthetic_events")
    .option("rowsPerBatch", R).load() — offsets are row counters, so a
    checkpoint restart replays identical batches."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return EVENTS_SCHEMA

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _EventsStreamReader(self.options)


class _EventsStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.parts = max(1, int(options.get("partitions", 4)))
        self.max_rows = int(options.get("maxRows", 10_000))
        # Optional explicit batch schedule: comma-separated increasing
        # end offsets ("3000,4500,6000"). Each trigger advances to the
        # next boundary above the current offset instead of a fixed
        # rows_per_batch step — this lets a gate shape its restart legs
        # (e.g. one batch of real events + one batch per flush wave)
        # without extra fixed-cost legs. Row CONTENT stays a pure
        # function of event_id, so the schedule never changes what any
        # replayed range contains.
        bounds = options.get("batchBoundaries")
        self.boundaries = (
            sorted(int(b) for b in str(bounds).split(",")) if bounds else None
        )
        self._current = 0

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        # Advance one batch per trigger, capped. The row CONTENT is a
        # pure function of event_id, so whatever offsets a restarted
        # query replays, the rows are identical.
        if self.boundaries is not None:
            nxt = next(
                (b for b in self.boundaries if b > self._current), self.max_rows
            )
            self._current = min(nxt, self.max_rows)
        else:
            self._current = min(
                self._current + self.rows_per_batch, self.max_rows
            )
        return {"offset": self._current}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["offset"], end["offset"]
        # Checkpoint restart hands a fresh reader the RESTORED offsets:
        # clamp the counter up so latestOffset never regresses below
        # already-committed progress (a regressed counter would re-plan
        # and re-emit event ranges delivered before the restart,
        # breaking the exactly-once replay contract in the docstring).
        self._current = max(self._current, lo, hi)
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = -(-(hi - lo) // self.parts)
        return [
            _RangePartition(a, min(a + step, hi)) for a in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        for event_id in range(partition.start, partition.end):
            yield _event_row(event_id)

    def commit(self, end: dict) -> None:
        # Clamp here as well as in partitions(): after a restart where
        # every batch was already committed, the engine may call
        # commit(end) without ever re-planning a batch — without this,
        # latestOffset restarts from 0 and must re-climb in
        # rows_per_batch steps before new data flows (no duplicates —
        # the hi<=lo guard holds — but ~N/rowsPerBatch stalled
        # triggers; r2 ADVICE).
        self._current = max(self._current, end.get("offset", 0))


def register_python_sources(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(SyntheticEventsStreamDataSource)
