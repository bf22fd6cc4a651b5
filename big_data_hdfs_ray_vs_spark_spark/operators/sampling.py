"""Deterministic sampling & token-budget curation for training-data mixes.

Dataset curation needs samples that are REPRODUCIBLE across runs,
engines, and partitionings. Spark's ``sampleBy``/``F.rand`` draw from a
partition-seeded RNG, so the selected rows change whenever the physical
layout does — useless for an audit trail at 100 TB. Everything here
derives its randomness from a salted md5 of the row's own key instead:
a pure, narrow, codegen'd filter (zero shuffles) whose output is a
deterministic function of the data, exactly replayable in any SQL
engine (the DuckDB oracles run the same formula).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import quality_features


def hash_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) from a salted 60-bit md5 of the key.

    Same primitive as dedup.md5_hash60 (first 15 md5 hex chars as an
    unsigned int), scaled to the unit interval. DuckDB spells it
    CAST('0x' || substr(md5(salt || key), 1, 15) AS BIGINT) / 2^60.
    """
    from .dedup import md5_hash60

    h = md5_hash60(F.concat(F.lit(salt), key.cast("string")))
    return h.cast("double") / F.lit(float(1 << 60))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "strat:",
) -> DataFrame:
    """Per-stratum Bernoulli sample at the given fractions, deterministic.

    Keeps a row iff hash_uniform(id) < fraction(stratum); strata absent
    from ``fractions`` are dropped (fraction 0). Unlike df.sampleBy this
    is layout-independent and needs no seed bookkeeping: re-running on a
    repartitioned, compacted, or differently-ordered copy of the data
    selects the exact same rows.
    """
    fmap = F.create_map(*[F.lit(x) for kv in fractions.items() for x in kv])
    u = hash_uniform(F.col(id_col), salt)
    return df.filter(u < F.coalesce(fmap[F.col(strata_col)], F.lit(0.0)))


def train_val_test_split(
    df: DataFrame,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    id_col: str = "doc_id",
    salt: str = "split:",
) -> DataFrame:
    """Add a deterministic 'split' column (train/val/test) by hash range.

    Membership is a pure function of the row id, so the split survives
    reshuffles, incremental appends, and engine migrations — the
    property training pipelines actually need from a holdout split.
    """
    u = hash_uniform(F.col(id_col), salt)
    train, val, _ = weights
    return df.withColumn(
        "split",
        F.when(u < train, F.lit("train"))
        .when(u < train + val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "shuf:",
) -> DataFrame:
    """Global pseudorandom training order without a global sort.

    shard = hash % n_shards, pos = rank of the hash within the shard:
    reading shards in index order (each internally by pos) replays one
    fixed pseudorandom permutation of the corpus. Costs one hash
    exchange + independent per-shard sorts — never a single-reducer
    total order, which is the scale trap of orderBy(rand()). Epochs
    re-key with a different salt.
    """
    from .dedup import md5_hash60

    h = md5_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.select(F.col(id_col), h.alias("__h"), (h % n_shards).alias("shard"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def mixture_weights(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """Static mixture resampling for training-data blends.

    Each row is repeated floor(w) times, plus one more with probability
    frac(w) decided by the row's own hash — so a source weighted 2.3
    contributes every doc twice and ~30% of docs a third time,
    deterministically. Implemented as explode(sequence(1, n)): a narrow
    per-row expansion, zero shuffles, exactly replayable in SQL. Rows
    whose group is unweighted (or whose n is 0) are dropped.
    """
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    w = F.coalesce(wmap[F.col(group_col)], F.lit(0.0))
    base = F.floor(w).cast("int")
    extra = (hash_uniform(F.col(id_col), salt) < (w - F.floor(w))).cast("int")
    n = (base + extra).alias("__n")
    return (
        df.select(F.col(id_col), F.col(group_col), n)
        .filter(F.col("__n") > 0)
        .select(
            id_col,
            group_col,
            F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("copy"),
        )
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "cap:",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically —
    the per-domain cap of web-corpus curation (no single domain may
    dominate the training mix).

    Selection order is the rows' own salted hash (tie-broken by id), so
    the survivors are a pure function of the data: re-running on any
    layout keeps the same rows, and raising the cap only ADDS rows
    (monotone — an audit-friendly property quota systems want). One
    shuffle: the window partition on group_col; per-group state is a
    row counter, so a hot domain is a big partition, not big memory."""
    u = hash_uniform(F.col(id_col), salt)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "wsample:",
) -> DataFrame:
    """Weighted sampling without replacement, n per group, deterministic
    (Efraimidis–Spirakis A-ES): key = u^(1/w) with u the row's own
    salted hash-uniform; the top-n keys per group are a weighted sample
    without replacement. Quality-proportional doc selection — a doc
    with twice the weight is (correctly, not heuristically) twice as
    likely to make the cut — while staying a pure function of the data:
    same rows survive on any layout, any engine. Rows with weight <= 0
    or null are excluded. One window shuffle on the group key."""
    w = F.col(weight_col).cast("double")
    u = hash_uniform(F.col(id_col), salt)
    # rank by ln(u)/w (monotone with u^(1/w), better conditioned)
    key = F.log(u) / w
    win = Window.partitionBy(group_col).orderBy(F.desc_nulls_last("__k"), F.col(id_col))
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__k", key)
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= n)
        .drop("__k", "__rn")
    )


def token_budget_curation(
    df: DataFrame,
    group_col: str = "source",
    budget_tokens: int = 800,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-ranked token-budget curation per group.

    Rank each group's documents by quality_score (text.quality_features)
    descending, accumulate token counts in that order, and keep the
    prefix that fits the budget — the "best docs until the token quota"
    curation step of a training-mix builder. One shuffle (the window
    partition on group_col); ties broken by id for determinism. Groups
    here are sources; at 100 TB the same plan holds for any bounded
    cardinality key (domain, language, crawl).
    """
    q = quality_features(df, text_col=text_col)
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("quality_score"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        q.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select(id_col, group_col, "n_tokens", "cum_tokens")
    )
