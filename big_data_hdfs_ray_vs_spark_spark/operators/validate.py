"""Declarative data-quality validation (dbt-test-shaped constraint
audit) compiled to ONE aggregate pass.

A corpus build should fail fast on contract violations — nulls where
none belong, out-of-range values, broken uniqueness — without paying
one scan per rule. Every rule below compiles to a conditional count
inside a single global aggregate (map-side combined), except
uniqueness, which needs its own count-distinct pass per keyset; the
output is one row per rule with the violation count.

Rules are (name, kind, params) tuples via the small constructors:

    validate(df, [
        not_null("l_partkey"),
        in_range("l_quantity", 1, 50),
        accepted_values("l_returnflag", ["A", "N", "R"]),
        unique(["l_orderkey", "l_linenumber"]),
    ])
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import count_if


def not_null(col: str) -> tuple[str, Column | None, list[str] | None]:
    return (f"not_null:{col}", F.col(col).isNull(), None)


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column | None, list[str] | None]:
    """Violation = value outside [lo, hi] (nulls don't violate range)."""
    c = F.col(col)
    return (f"in_range:{col}", c.isNotNull() & ~c.between(lo, hi), None)


def accepted_values(col: str, values: list) -> tuple[str, Column | None, list[str] | None]:
    c = F.col(col)
    return (f"accepted_values:{col}", c.isNotNull() & ~c.isin(values), None)


def matches_regex(col: str, pattern: str) -> tuple[str, Column | None, list[str] | None]:
    c = F.col(col)
    return (f"matches_regex:{col}", c.isNotNull() & ~c.rlike(pattern), None)


def unique(cols: list[str]) -> tuple[str, Column | None, list[str] | None]:
    return ("unique:" + ",".join(cols), None, list(cols))


def validate(df: DataFrame, rules: list) -> DataFrame:
    """One row per rule: (rule, n_violations, passed).

    All row-predicate rules share ONE aggregate job over one scan;
    each uniqueness rule adds one count/count-distinct aggregate over
    its keyset (duplicate rows counted beyond the first are the
    violations). Results union into a single small frame."""
    preds = [(name, cond) for name, cond, keys in rules if cond is not None]
    uniqs = [(name, keys) for name, cond, keys in rules if keys is not None]
    if not preds and not uniqs:
        raise ValueError("validate: no rules (dynamically built rule lists can be empty — check before calling)")
    parts: list[DataFrame] = []
    if preds:
        agg = df.agg(
            *[
                count_if(cond).alias(f"__r{i}")
                for i, (_n, cond) in enumerate(preds)
            ]
        )
        stacked = agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("rule"),
                            F.coalesce(F.col(f"__r{i}"), F.lit(0)).alias("n_violations"),
                        )
                        for i, (name, _c) in enumerate(preds)
                    ]
                )
            ).alias("s")
        ).select("s.rule", "s.n_violations")
        parts.append(stacked)
    for name, keys in uniqs:
        # dbt semantics: rows with a null in any key column are exempt
        # from the uniqueness check (count_distinct already ignores
        # them; the row count must match).
        nn = None
        for k in keys:
            c = F.col(k).isNotNull()
            nn = c if nn is None else (nn & c)
        parts.append(
            df.agg(
                (
                    F.count(F.when(nn, 1))
                    - F.count_distinct(*[F.col(k) for k in keys])
                )
                .cast("long")
                .alias("n_violations")
            ).select(F.lit(name).alias("rule"), "n_violations")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)


def fk_audit(
    relationships: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table referential-integrity audit — the schema-level
    companion to check_constraints' single-table rules: for each
    (name, child, child_key, parent, parent_key) relationship, count
    child rows whose non-null key has NO match in the parent (a
    doc without an embedding, an order pointing at a deleted
    customer). NULL child keys are not references (the q131 rule) —
    they are excluded from both counts; nullability itself is
    check_constraints' not_null rule.

    Scale shape: per relationship, ONE pass over the child's non-null
    keys — a left join against the parent's distinct key set (a
    dimension parent broadcasts) feeding a single aggregate that
    counts rows and misses together, exactly the oracle's LEFT JOIN +
    CASE shape. The child table is scanned once, and no row data
    ever moves, only keys.

    Returns (relationship, n_child, n_orphans, orphan_rate 6dp),
    one row per relationship, in input order (rel name carries it).
    """
    parts = []
    for name, child, ckey, parent, pkey in relationships:
        ck = child.select(F.col(ckey).alias("__k")).filter(F.col("__k").isNotNull())
        pk = (
            parent.select(F.col(pkey).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .distinct()
            .withColumn("__hit", F.lit(True))
        )
        counts = ck.join(pk, "__k", "left").agg(
            F.count(F.lit(1)).alias("n_child"),
            F.coalesce(
                F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)), F.lit(0)
            ).alias("n_orphans"),
        )
        parts.append(
            counts.select(
                F.lit(name).alias("relationship"),
                "n_child",
                "n_orphans",
                F.round(
                    F.when(
                        F.col("n_child") > 0,
                        F.col("n_orphans").cast("double") / F.col("n_child"),
                    ).otherwise(0.0),
                    6,
                ).alias("orphan_rate"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
