"""Data profiling & diagnostics operators: one-pass column profiles,
grouped robust (median/MAD) outlier detection, exact equi-depth
binning, one-pass grouped OLS trends, and PSI drift audits.

Profiling is the step every ingest runs before trusting a new drop of
data; at 100 TB it must be ONE scan, not one scan per column. Both
operators here compile to a single aggregate pass:

- ``profile_columns``: every per-column statistic (nulls, distincts,
  min/max, average length) is an aggregate expression in one ``agg``;
  the wide 1-row result is unpivoted driver-side into the tidy
  (column, stat...) shape with a ``stack`` projection — no second scan.
- ``robust_outlier_stats``: exact per-group median and MAD via two
  grouped ``percentile`` passes (MAD needs the median first — an
  irreducible two-pass dependency), then a conditional count. Median/
  MAD is the outlier rule that survives the exact heavy tails that
  break mean/stddev z-scores on real telemetry.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile in ONE aggregate scan: row count, null count,
    exact distinct count, min/max (cast to string AFTER the typed
    min/max, so numeric ordering is preserved), and average string
    length (null for non-string columns).

    Returns (column, n_rows, n_null, n_distinct, min_value, max_value,
    avg_len). The single wide aggregate keeps map-side partial
    aggregation for every statistic; ``count_distinct`` over many
    columns is the one genuinely expensive piece (one hash set per
    column per partition) — at extreme widths switch callers to
    ``approx_count_distinct``, same shape.
    """
    cols = list(cols) if cols else df.columns
    str_cols = {name for name, dtype in df.dtypes if dtype == "string"}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
            (
                F.round(F.avg(F.length(F.col(c))), 6)
                if c in str_cols
                else F.lit(None).cast("double")
            ).alias(f"__len_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"__null_{c}"),
            F.col(f"__dist_{c}"),
            F.col(f"__min_{c}"),
            F.col(f"__max_{c}"),
            F.col(f"__len_{c}"),
        ]
    return wide.select(
        "n_rows",
        F.stack(
            F.lit(len(cols)),
            *stack_args,
        ).alias("column", "n_null", "n_distinct", "min_value", "max_value", "avg_len"),
    ).select("column", "n_rows", "n_null", "n_distinct", "min_value", "max_value", "avg_len")


def robust_outlier_stats(
    df: DataFrame,
    group: str | Sequence[str],
    value: str,
    z: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier summary via median/MAD: a row is an
    outlier when ``0.6745 * |x - median| / MAD > z`` (the modified
    z-score; 0.6745 scales MAD to σ under normality). Returns
    (group..., n, median_value, mad, n_outliers).

    Two grouped exact-percentile passes (median, then MAD over the
    residuals — the dependency is inherent to MAD) plus one conditional
    count; all three shuffle on the same group key, so AQE reuses the
    partitioning. Groups with MAD = 0 (constant-valued) report zero
    outliers rather than dividing by zero.
    """
    keys = [group] if isinstance(group, str) else list(group)
    # The per-group aggregates are k rows — persist them so each of the
    # three fact passes scans the fact table exactly once instead of
    # rebuilding the upstream aggregate (and re-scanning the fact) per
    # consumer. The caches are group-cardinality-sized and broadcast
    # into the fact joins; they are left cached (k rows) for the
    # result's lifetime.
    med = (
        df.groupBy(*keys)
        .agg(F.expr(f"percentile({value}, 0.5)").alias("median_value"))
        .persist()
    )
    stats = (
        df.join(F.broadcast(med), on=keys)
        .withColumn("__resid", F.abs(F.col(value) - F.col("median_value")))
        .groupBy(*keys, "median_value")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(__resid, 0.5)").alias("mad"),
        )
        .persist()
    )
    is_out = F.when(
        F.col("mad") > 0,
        (0.6745 * F.abs(F.col(value) - F.col("median_value")) / F.col("mad")) > z,
    ).otherwise(F.lit(False))
    counted = (
        df.join(F.broadcast(stats.select(*keys, "median_value", "mad")), on=keys)
        .groupBy(*keys)
        .agg(F.sum(is_out.cast("long")).alias("n_outliers"))
    )
    return stats.join(counted, on=keys).select(
        *keys,
        "n",
        F.round("median_value", 6).alias("median_value"),
        F.round("mad", 6).alias("mad"),
        "n_outliers",
    )


def equidepth_bins(
    df: DataFrame,
    value: str,
    k: int = 4,
    group: str | Sequence[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Exact quantile discretizer: assign every row an equi-depth bin
    (ntile over the value order, per group when ``group`` is given) and
    summarize each bin — (group..., bin, n, lo, hi). The feature-
    bucketing step of a training pipeline, exact where MLlib's
    QuantileDiscretizer is approximate.

    ``tiebreak`` (a unique column) makes equal-value rows land in a
    deterministic bin. One sort shuffle per group for the ntile, then a
    tiny aggregate. A global (group=None) discretize pays a single-
    partition sort — at corpus scale prefer per-group use or the
    histogram_quantiles sketch; exactness is the point here.
    """
    keys = [group] if isinstance(group, str) else list(group or [])
    # Nulls are not observations, and engines disagree on where they
    # sort (Spark ASC = NULLS FIRST, most SQL engines NULLS LAST) —
    # binning them would put them in OPPOSITE bins per engine.
    vc = F.col(value).cast("double")
    df = df.filter(vc.isNotNull() & ~F.isnan(vc))
    order = [F.col(value).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order) if keys else Window.orderBy(*order)
    binned = df.withColumn("bin", F.ntile(k).over(w))
    return binned.groupBy(*keys, "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min(value), 6).alias("lo"),
        F.round(F.max(value), 6).alias("hi"),
    )


def grouped_trend(
    df: DataFrame,
    group: str | Sequence[str],
    x: str,
    y: str,
) -> DataFrame:
    """Per-group OLS trend line in ONE aggregate pass: slope, intercept
    and R² of ``y`` on ``x`` via the built-in regr_* aggregates (JVM
    codegen, map-side combined — never a per-group fit loop). The
    drift/trend diagnostic over segments of a corpus or a metric
    stream. Center/scale ``x`` to small magnitudes at the call site
    (e.g. days since epoch, not nanoseconds) — the closed-form sums
    cancel catastrophically when x is huge."""
    keys = [group] if isinstance(group, str) else list(group)
    # An OLS observation needs finite (x, y): null pairs are skipped by
    # regr_* anyway, but a NaN poisons the closed-form sums in Spark
    # and RAISES in other engines — filter both, and count what's fit.
    for c in (x, y):
        cc = F.col(c).cast("double")
        df = df.filter(cc.isNotNull() & ~F.isnan(cc))
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr(f"regr_slope({y}, {x})"), 6).alias("slope"),
        F.round(F.expr(f"regr_intercept({y}, {x})"), 6).alias("intercept"),
        F.round(F.expr(f"regr_r2({y}, {x})"), 6).alias("r2"),
    )


def psi_drift(
    df: DataFrame,
    value: str,
    split: Column,
    lo: float,
    hi: float,
    bins: int = 10,
    group: str | Sequence[str] | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Population-stability-index drift audit between two slices of one
    table: fixed-width-bin ``value`` over [lo, hi] (plus underflow/
    overflow bins), take each side's bin shares p/q (floored at ``eps``
    so empty bins contribute finitely), and report
    PSI = Σ (p−q)·ln(p/q) per group. The standard "did this week's
    data shift?" gate (<0.1 stable, >0.25 action).

    ``split`` is a boolean Column (true = reference side). One scan,
    one small aggregate keyed on (group, bin, side) and a pivot-free
    conditional-share reduction — drift monitoring at 100 TB costs one
    pass over the partition being audited."""
    keys = [group] if isinstance(group, str) else list(group or [])
    width = (hi - lo) / bins
    bin_id = F.when(F.col(value) < lo, F.lit(-1)).when(
        F.col(value) >= hi, F.lit(bins)
    ).otherwise(F.floor((F.col(value) - F.lit(lo)) / F.lit(width)).cast("int"))
    tagged = df.select(
        *keys, bin_id.alias("bin"), split.cast("int").alias("__ref")
    )
    counts = tagged.groupBy(*keys, "bin").agg(
        F.sum("__ref").alias("n_ref"),
        F.sum(F.lit(1) - F.col("__ref")).alias("n_cur"),
    )
    totals = counts.groupBy(*keys).agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    joined = counts.join(F.broadcast(totals), on=keys) if keys else counts.crossJoin(
        F.broadcast(totals)
    )
    p = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(eps))
    q = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(eps))
    contrib = (p - q) * F.log(p / q)
    return joined.groupBy(*keys).agg(
        F.round(F.sum(contrib), 6).alias("psi"),
        F.count(F.lit(1)).alias("n_bins_used"),
    )


def ab_test_welch(
    df: DataFrame,
    group: str | Sequence[str],
    value: str,
    split: Column,
) -> DataFrame:
    """Welch two-sample t-test per group in ONE aggregate pass:
    ``split`` (boolean Column, true = arm A) partitions each group into
    two arms; conditional count/mean/var_samp feed the t statistic and
    the Welch–Satterthwaite degrees of freedom. The experiment-readout
    primitive — six accumulators per group, map-side combined, never a
    per-arm scan.

    Returns (group..., n_a, n_b, mean_a, mean_b, t_stat, dof); t_stat
    and dof are NULL when either arm has < 2 observations or both
    variances are zero.
    """
    keys = [group] if isinstance(group, str) else list(group)
    # A NaN value is not an observation (it would poison mean/variance
    # in Spark and raise in other engines) — mask it to null, which
    # every aggregate here already skips.
    vv = F.when(~F.isnan(F.col(value).cast("double")), F.col(value))
    va = F.var_samp(F.when(split, vv))
    vb = F.var_samp(F.when(~split, vv))
    agg = df.groupBy(*keys).agg(
        # Count OBSERVATIONS (non-null, non-NaN values), not rows:
        # mean/var already skip nulls, and a row count would understate
        # the standard error and inflate t whenever the value is
        # nullable.
        F.count(F.when(split, vv)).alias("n_a"),
        F.count(F.when(~split, vv)).alias("n_b"),
        F.avg(F.when(split, vv)).alias("m_a"),
        F.avg(F.when(~split, vv)).alias("m_b"),
        va.alias("v_a"),
        vb.alias("v_b"),
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (F.col("v_a") / F.col("n_a")) ** 2 / (F.col("n_a") - 1)
        + (F.col("v_b") / F.col("n_b")) ** 2 / (F.col("n_b") - 1)
    )
    valid = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    return agg.select(
        *keys,
        "n_a",
        "n_b",
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round(F.when(valid, t), 4).alias("t_stat"),
        F.round(F.when(valid, dof), 4).alias("dof"),
    )


ECDF_RESOLUTION = 4  # value quantization (dp) bounding the distinct-value window


def ecdf_transform(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Empirical-CDF feature transform: annotate every row with its
    global and within-group CDF position — the rank-based
    normalization that makes a skewed feature comparable across
    slices (the per-row counterpart of the quantile VALUES q36/q60/
    q80 compute).

    ecdf(v) = P(X <= v) over non-null observations, computed WITHOUT
    a per-row sort: values quantize to ECDF_RESOLUTION dp (the
    resolution dial — a continuous column would otherwise make the
    distinct-value set corpus-sized), collapse to (value → count)
    with map-side combine, and one window over the DISTINCT values
    accumulates the counts (cardinality-bounded, the q114 discipline;
    the group window partitions by group on the same bounded table).
    Rows join back on the quantized value — a dictionary-sized
    broadcastable side.

    NULL values are excluded (not an observation — the load boundary
    already nullified non-finite measurements). Returns
    (id, group, v, ecdf_global, ecdf_group) with v the quantized
    value and both ecdfs rounded at 6dp.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.round(F.col(value_col), ECDF_RESOLUTION).alias("v"),
    ).filter(F.col("v").isNotNull())
    n_total = base.count()
    per_val = base.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wg = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    glob = per_val.select(
        "v",
        F.round(
            F.sum("c").over(wg) / F.lit(float(n_total)), 6
        ).alias("ecdf_global"),
    )
    per_gv = base.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("cg"))
    grp_tot = base.groupBy("grp").agg(F.count(F.lit(1)).alias("ng"))
    wgrp = (
        Window.partitionBy("grp").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = (
        per_gv.withColumn("cum_g", F.sum("cg").over(wgrp))
        .join(grp_tot, "grp")
        .select(
            F.col("grp").alias("__g2"),
            F.col("v").alias("__v2"),
            F.round(F.col("cum_g") / F.col("ng").cast("double"), 6).alias(
                "ecdf_group"
            ),
        )
    )
    return (
        base.join(glob, "v")
        .join(
            grp,
            (F.col("grp").eqNullSafe(F.col("__g2"))) & (F.col("v") == F.col("__v2")),
        )
        .select("id", "grp", "v", "ecdf_global", "ecdf_group")
    )


def key_skew_audit(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew profile of a join/partition key — the planning
    scan you run BEFORE choosing a shuffle strategy at 100 TB: row
    and key counts, the heaviest key's share (the broadcast/salt
    decision number), top-10 concentration, Shannon entropy (nats)
    of the key distribution, and its Gini coefficient via the exact
    rank formula G = 2·Σ(i·cᵢ)/(n·Σc) − (n+1)/n over counts sorted
    ascending (key tie-break — deterministic cross-engine).

    Scale shape: one map-side-combining count collapses the fact
    table to its key dictionary, and the dictionary immediately
    collapses AGAIN to the distinct count-VALUE histogram (c → m_c,
    ≈√(2·n_keys) rows under a Zipf tail — integer counts are heavily
    tied). The exact rank-sum needs no per-key rank: keys tied at the
    same c occupy consecutive ranks, and Σ_{tied} i·c = c·(m·offset +
    m(m+1)/2) — closed form, exact integer arithmetic, identical to
    the oracle's per-key Σ i·cᵢ. So the only unpartitioned window
    (the cumulative offset) runs over the count-value histogram, not
    the key dictionary — the q114 distinct-values discipline — and
    the top-10 cut is a TakeOrderedAndProject over (c desc, k),
    broadcast back as a 1-row scalar. NULL keys are excluded — they
    never participate in an equi-join. Entropy and Gini are
    6dp-rounded; shares likewise.

    Returns (n_rows, n_keys, max_key_share, top10_share, entropy,
    gini).
    """
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hist = counts.groupBy("c").agg(F.count(F.lit(1)).alias("m"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    offs = hist.withColumn("off", F.coalesce(F.sum("m").over(w), F.lit(0)))
    top10 = (
        counts.orderBy(F.desc("c"), "k")
        .limit(10)
        .agg(F.sum("c").alias("__t10"))
    )
    return offs.agg(
        F.sum(F.col("m") * F.col("c")).alias("__n"),
        F.sum("m").alias("__k"),
        F.max("c").alias("__mx"),
        # Σ i·cᵢ with i the ascending (c, k) rank — tie-group closed
        # form in PURE int64 (m(m+1) is even, so >>1 is exact — `/`
        # would detour through double and round past 2^53); every term
        # ≤ the total, so the overflow envelope matches the per-key
        # formulation (ANSI raises loudly past it).
        F.sum(
            F.col("c")
            * (
                F.col("m") * F.col("off")
                + F.shiftright(F.col("m") * (F.col("m") + 1), 1)
            )
        ).alias("__ic"),
        F.sum(F.col("m") * F.col("c") * F.log("c")).alias("__clnc"),
    ).crossJoin(F.broadcast(top10)).select(
        F.col("__n").alias("n_rows"),
        F.col("__k").alias("n_keys"),
        F.round(F.col("__mx") / F.col("__n").cast("double"), 6).alias("max_key_share"),
        F.round(F.col("__t10") / F.col("__n").cast("double"), 6).alias("top10_share"),
        F.round(
            F.log(F.col("__n").cast("double")) - F.col("__clnc") / F.col("__n"), 6
        ).alias("entropy"),
        F.round(
            2.0 * F.col("__ic") / (F.col("__k") * F.col("__n").cast("double"))
            - (F.col("__k") + 1) / F.col("__k").cast("double"),
            6,
        ).alias("gini"),
    )


def embedding_dim_profile(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-DIMENSION embedding health profile — the feature-whitening /
    dead-dimension audit (an all-zero or near-constant dimension wastes
    index bytes and distorts euclidean ANN; a huge-variance one
    dominates it): for each 1-based dimension index, count, mean,
    population std, min/max, and the exact zero fraction. ONE
    posexplode scan (narrow: (pos, x) pairs) into a map-side-combining
    aggregate keyed by the |dim|-sized dictionary — the corpus shuffles
    only dim-keyed partials. Ragged corpora profile each dim over the
    vectors that HAVE it (count carries the denominator); null vectors
    contribute nothing (posexplode drops them)."""
    base = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__pos", "__x")
    )
    return base.groupBy((F.col("__pos") + 1).cast("int").alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("__x"), 6).alias("mean"),
        F.round(F.sqrt(F.var_pop("__x")), 6).alias("std"),
        F.round(F.min("__x"), 6).alias("min_x"),
        F.round(F.max("__x"), 6).alias("max_x"),
        F.round(
            F.avg(F.when(F.col("__x") == 0.0, 1.0).otherwise(0.0)), 6
        ).alias("zero_frac"),
    )
