"""Sequence packing: assign documents to fixed-token-budget context
windows ("bins") for LLM training batches.

Two variants:

- ``quantized_packing`` — contiguous capacity-quantized assignment:
  bin = floor(tokens_before / capacity) within each (source) stream,
  computed with one window cumsum — pure JVM, one shuffle, and exactly
  reproducible in any SQL engine (the DuckDB oracle runs the same
  formula). Documents may straddle a bin boundary; this is the
  "streaming tokenizer chunking" semantics.

- ``greedy_packing`` — exact first-fit-contiguous packing (a doc never
  straddles: if it doesn't fit the remainder, it opens a new bin).
  The running remainder is a sequential recurrence, not expressible as
  a fixed window function, so it runs per-source via applyInPandas —
  each group is one Arrow batch, state is O(1), and parallelism is the
  number of sources/streams, which is the natural packing unit anyway
  (packing across shards would serialize the whole corpus).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import whitespace_tokens


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(whitespace_tokens(F.col(text_col))))


def quantized_packing(
    df: DataFrame,
    capacity: int = 512,
    key_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """bin_id = floor(cumulative-tokens-before-this-doc / capacity),
    per key_col stream ordered by order_col."""
    toks = with_token_counts(df, text_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return toks.select(
        key_col,
        order_col,
        "n_tokens",
        F.floor(before / capacity).cast("long").alias("bin_id"),
    )


def greedy_packing(
    df: DataFrame,
    capacity: int = 512,
    key_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact first-fit-contiguous packing per key_col stream: a doc that
    would overflow the open bin's remainder starts a new bin; docs
    longer than capacity get a bin of their own."""
    toks = with_token_counts(df, text_col).select(key_col, order_col, "n_tokens")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bins, used, cur = [], 0, 0
        for n in pdf["n_tokens"]:
            if used > 0 and used + n > capacity:
                cur += 1
                used = 0
            bins.append(cur)
            used += n
        return pdf.assign(bin_id=pd.Series(bins, dtype="int64"))

    # Output schema mirrors the INPUT types of the caller-chosen key /
    # order columns (hardcoding string/long breaks e.g. a bigint key:
    # Arrow refuses int64 values under a declared string field).
    key_t = toks.schema[key_col].dataType.simpleString()
    ord_t = toks.schema[order_col].dataType.simpleString()
    schema = f"{key_col} {key_t}, {order_col} {ord_t}, n_tokens int, bin_id long"
    return toks.groupBy(key_col).applyInPandas(pack, schema=schema)
