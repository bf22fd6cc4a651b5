"""Pipeline observability via the Observation API (df.observe).

Metrics ride along with whatever action the caller already runs — no
second scan, no separate aggregate job. The production pattern for
"how many rows / nulls / out-of-range values did this stage actually
process": at 100 TB a dedicated metrics pass costs as much as the
stage itself, while an observe() is a map-side accumulator folded into
the existing job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def observed(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a DataFrame.

    Returns (df, observation); after the caller runs ANY action that
    consumes every partition of df, ``observation.get`` holds the
    metric values. Metrics must be aggregate expressions without
    distinct/sort (the Observation contract).
    """
    obs = Observation()
    named = [c.alias(name) for name, c in metrics.items()]
    return df.observe(obs, *named), obs


def row_quality_metrics(cols_not_null: list[str]) -> dict[str, Column]:
    """Standard stage-health metric set: total rows + per-column null
    counts for the columns the downstream stage requires."""
    from ..functions import null_count

    out: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in cols_not_null:
        out[f"null_{c}"] = null_count(c)
    return out
