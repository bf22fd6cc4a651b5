"""Column-expression helpers (all JVM-side builtins — no Python UDFs).

Everything here stays inside whole-stage codegen; the only Python that
runs per-row anywhere in the engine is in clearly-marked Pandas-UDF
paths (operators.multimodal).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(ts: Column | str) -> Column:
    """Microseconds since the Unix epoch, for TIMESTAMP *or*
    TIMESTAMP_NTZ inputs. ``unix_micros`` rejects NTZ outright;
    routing through ``to_utc_timestamp(ts, 'UTC')`` treats a naive
    timestamp as UTC wall time (session-timezone independent) and is a
    no-op for an already-UTC instant, so one expression covers both
    types the testdata has shipped with (TIMESTAMP(NANOS) in round 1,
    micros-NTZ in round 2)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(F.to_utc_timestamp(col, "UTC"))


def count_if(cond: Column) -> Column:
    """Conditional count, the reference's null/invalid counters
    (etl_spark.py:121-129): sum(when(cond,1).otherwise(0))."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def null_count(col: str) -> Column:
    return count_if(F.col(col).isNull())


def bucketize(col: Column, cuts: list[tuple[float, str]], otherwise: str) -> Column:
    """Chained strict-`<` CASE-WHEN bucketing, the canonical Spark-variant
    semantics (etl_spark.py:143-159; SURVEY §2.2 boundary note: value
    exactly at a cut falls through to the next bucket / otherwise)."""
    expr = None
    for threshold, label in cuts:
        clause = col < threshold
        expr = F.when(clause, label) if expr is None else expr.when(clause, label)
    return expr.otherwise(otherwise)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, computed in double, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array columns (double math).

    NULL when either vector has zero magnitude (similarity is
    undefined there, and the unguarded division would ABORT the whole
    job under Spark 4's default ANSI mode the first time a failed
    embedding row produced an all-zero vector)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def md5_minhash(shingle: Column, seed: int) -> Column:
    """MinHash atom: salted md5 hex digest. Lexicographic ``min`` over
    these 32-char hex strings is a valid minhash permutation and is
    bit-identical across engines (same trick works in any SQL dialect,
    which keeps the DuckDB oracle exact). The default minhash_bands
    path no longer calls this one-digest-per-slot form — it splits each
    digest into two 16-hex-char slots (half the md5 calls); this
    remains the reference formula for single-slot uses."""
    return F.md5(F.concat(F.lit(f"s{seed}:"), shingle))


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """n-gram shingles over a token array column.

    Built as zip_with over n shifted slices (pure vectorized array ops)
    — ~14x faster than transform+element_at indexing, same output.
    Fallback for 1..n-1 tokens: one shingle = the whole joined text.
    ZERO tokens → ZERO shingles (not a phantom '' shingle that would
    make every empty/null-body document a 100%-jaccard duplicate of
    every other; empty bodies are exact-dedup's job). The oracle
    _SHINGLES macro spells the same three-way case.
    """
    m = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    parts = [F.slice(tokens, j + 1, m) for j in range(n)]
    expr = parts[-1]
    for p in reversed(parts[:-1]):
        expr = F.zip_with(p, expr, lambda a, b: F.concat(a, F.lit(" "), b))
    return (
        F.when(F.size(tokens) >= n, expr)
        .when(F.size(tokens) > 0, F.array(F.array_join(tokens, " ")))
        .otherwise(F.array().cast("array<string>"))
    )


def whitespace_tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-string removal.

    NULL text tokenizes to [] — the engine-wide invariant (mirrored by
    the oracle _TOKS macro): a document without a body has zero
    tokens, zero words, no shingles and no chunks, rather than
    null-propagating into every downstream feature (nullable-int
    outputs render differently through the driver's pandas hash, and
    explode-of-null silently drops rows on one engine only)."""
    return F.filter(
        F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+"), lambda t: t != ""
    )


def spread_small_input(df, max_bytes: int = 256 << 20):
    """Round-robin-repartition a SMALL low-partition input up to the
    cluster's parallelism, so CPU-dense per-row operators (shingling,
    per-char n-gram expansion) don't serialize on one core.

    Why: a table that fits one scan split (or one parquet row group)
    arrives as ONE partition, and everything before the first shuffle
    then runs single-threaded — on local[32] that's a 30x CPU
    under-use for the text-heavy operators. The guard is the
    optimizer's size estimate ONLY (a driver-side stat: no jobs run at
    plan construction, unlike an ``.rdd`` partition probe which forces
    physical planning and fires broadcast jobs), so a genuinely large
    input can never be blanket-reshuffled through this path — at real
    scale the estimate exceeds ``max_bytes`` and this is a no-op, and
    the worst case it ever adds is one <=``max_bytes`` round-robin
    exchange on an input that was already parallel.
    """
    spark = df.sparkSession
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        target = spark.sparkContext.defaultParallelism
    except Exception:
        return df  # never let the heuristic break a plan
    if size <= max_bytes:
        return df.repartition(target)
    return df


def portable_round(col: Column, digits: int) -> Column:
    """Half-up rounding as pure IEEE arithmetic — identical in every
    engine, unlike round(): Spark rounds the shortest decimal string of
    a double (BigDecimal HALF_UP), DuckDB rounds the binary value, so a
    quotient that lands exactly on a decimal midpoint (2-decimal sums
    over 2^a·5^b-sized groups — hourly windows of 24/32 events, tables
    of exactly 10^k rows) flips the last digit between engines.
    floor(x·10^d + 0.5)/10^d runs the same FP ops on the same inputs
    everywhere. Non-negative inputs only (floor(+0.5) is half-down for
    negatives); SQL replay: floor((expr) * 10^d + 0.5) / 10^d."""
    m = float(10**digits)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)


def portable_round_scalar(x: float, digits: int) -> float:
    """Driver-side scalar twin of ``portable_round`` with sign
    handling: half-AWAY-from-zero on the scaled double — the same
    result DuckDB's round(double, d) produces (verified exhaustively
    on random + decimal-midpoint inputs). Python's built-in round()
    is half-EVEN on the exact binary value and diverges near decimal
    midpoints, so any driver-computed constant that an oracle replays
    through DuckDB round() (PCA covariances, centroid literals) must
    round through this instead."""
    import math

    m = float(10**digits)
    if x >= 0:
        return math.floor(x * m + 0.5) / m
    return -math.floor(-x * m + 0.5) / m


def portable_round_signed(col: Column, digits: int) -> Column:
    """Column twin of ``portable_round_scalar``: half-away-from-zero on
    the scaled double, valid for NEGATIVE inputs too (``portable_round``
    is non-negative-only — floor(x·10^d + 0.5) is half-DOWN below
    zero). Matches DuckDB round(double, d) on either sign, so an oracle
    replays it as plain round(expr, d) — used for signed per-row terms
    (gradients, residuals) that feed exact decimal sums."""
    m = float(10**digits)
    mag = F.floor(F.abs(col) * F.lit(m) + F.lit(0.5)) / F.lit(m)
    return F.when(col < 0, -mag).otherwise(mag)


# q108's bucket granularity: zkey >> 10 ≈ 32×32-cell z-tiles, which
# yields ~10 occupied buckets on the sf0.01 events extent and ~94 at
# sf0.1 (measured) — coarse enough that a bucket is a meaningful
# partition, fine enough that rectangle queries prune. Single-sourced
# for queries.q108_zorder_stats and oracles' q108 SQL.
ZORDER_BUCKET_SHIFT = 10

# Interleave width per dimension. 31 bits each (62-bit z, fits signed
# 64) instead of a "convenient" 16: the testdata's user_id grows with
# SF (~1.5k at sf0.1, ~150k at sf10), and a 16-bit key would silently
# alias user 65536 onto user 0 — identically on both engines, so the
# oracle gate could never catch it. 31 bits covers every int32-domain
# dimension; raising it costs only extra folded shift/or terms in
# codegen. Low z bits are width-independent (bit i of x is always at
# position 2i), so bucket values for in-range data don't change when
# the width does.
MORTON_BITS = 31


def morton_key(x: Column, y: Column, bits: int = MORTON_BITS) -> Column:
    """Z-order (Morton) interleave of the low ``bits`` bits of two
    ints: bit i of x lands at position 2i, bit i of y at 2i+1. The
    standard multi-dimensional clustering key — rows sorted or
    bucketed by it keep 2-D rectangle queries dense in few
    partitions/row-groups, where a lexicographic (x, y) sort smears
    every x-slice across the full y range.

    Inputs are masked to the low ``bits`` bits FIRST, so out-of-range
    and negative values (two's complement) wrap identically in every
    engine — shifts then only ever see non-negative operands, where
    >> semantics (arithmetic vs logical) cannot diverge.

    Pure folded shift/mask arithmetic (2·bits OR terms), entirely
    inside whole-stage codegen, and replayable verbatim in any SQL
    engine with &, <<, >> — see oracles._morton_sql, generated from
    the same loop so the two can't drift."""
    mask = F.lit((1 << bits) - 1).cast("long")
    xs = x.cast("long").bitwiseAND(mask)
    ys = y.cast("long").bitwiseAND(mask)
    one = F.lit(1).cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(xs, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(ys, i).bitwiseAND(one), 2 * i + 1))
    return out
