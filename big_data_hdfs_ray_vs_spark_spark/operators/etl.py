"""The reference ETL workload's transform steps, reference-Spark
semantics (analysis/etl_spark.py:112-236), as composable DataFrame ops.

Scale notes: every step is a single declarative plan — conditional
counts ride the same hash-aggregate as the plain aggregates (one scan,
map-side partial agg), bucketing is pure CASE-WHEN inside codegen, and
the pipeline avoids the reference's five separate actions by letting the
caller decide what to materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import bucketize, count_if

# -- step 1: data quality assessment (etl_spark.py:121-129) -----------------


def quality_stats(df: DataFrame) -> DataFrame:
    """One-pass global aggregate: row count, null counts for
    FracSpecialChars and NumWords (the reference's two null probes,
    etl_spark.py:123-124), invalid-sentiment count, NumWords avg/max/min."""
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        count_if(F.col("FracSpecialChars").isNull()).alias("null_frac_special"),
        count_if(F.col("NumWords").isNull()).alias("null_num_words"),
        count_if(F.col("SentimentCompound") < -1).alias("invalid_sentiment"),
        F.avg("NumWords").alias("avg_words"),
        F.max("NumWords").alias("max_words"),
        F.min("NumWords").alias("min_words"),
    )


# -- step 2: feature engineering — categorical buckets (etl_spark.py:143-159)

WORD_LENGTH_CUTS = [(10, "short"), (50, "medium")]
READABILITY_CUTS = [(6, "elementary"), (9, "middle_school"), (13, "high_school")]
SPECIAL_CHARS_CUTS = [(0.1, "low"), (0.3, "medium")]


def add_categories(df: DataFrame) -> DataFrame:
    """The four CASE-WHEN buckets. Boundary semantics are the Spark
    variant's strict `<` (value==cut falls to the next bucket); null
    SentimentCompound lands in 'neutral' via otherwise (SURVEY §2.2)."""
    return (
        df.withColumn(
            "word_length_category",
            bucketize(F.col("NumWords"), WORD_LENGTH_CUTS, "long"),
        )
        .withColumn(
            "readability_level",
            bucketize(F.col("AutomatedReadabilityIndex"), READABILITY_CUTS, "college"),
        )
        .withColumn(
            "sentiment_category",
            F.when(F.col("SentimentCompound") > 0.1, "positive")
            .when(F.col("SentimentCompound") < -0.1, "negative")
            .otherwise("neutral"),
        )
        .withColumn(
            "special_chars_ratio_binned",
            bucketize(F.col("FracSpecialChars"), SPECIAL_CHARS_CUTS, "high"),
        )
    )


# -- step 3+4: grouped aggregations (etl_spark.py:163-190) ------------------


def sentiment_aggregation(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("sentiment_category")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.avg("SentimentCompound").alias("avg_sentiment"),
            F.avg("NumWords").alias("avg_words"),
            F.avg("AvgWordsPerSentence").alias("avg_words_per_sentence"),
        )
        .orderBy(F.desc("count"))
    )


def readability_aggregation(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("readability_level", "word_length_category")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.avg("AutomatedReadabilityIndex").alias("avg_readability"),
            F.avg("SentimentCompound").alias("avg_sentiment"),
        )
        .orderBy("readability_level", F.desc("count"))
    )


# -- step 5: cleansing (etl_spark.py:194-202) -------------------------------


def cleanse(df: DataFrame) -> DataFrame:
    """Compound range filter: NumWords>0, SentimentCompound∈[-1,1],
    FracSpecialChars∈[0,1], ARI>0. Null in any tested column rejects the
    row (three-valued logic), matching the reference."""
    return df.filter(
        (F.col("NumWords") > 0)
        & F.col("SentimentCompound").between(-1, 1)
        & F.col("FracSpecialChars").between(0, 1)
        & (F.col("AutomatedReadabilityIndex") > 0)
    )


# -- step 6: composite scores (etl_spark.py:207-212) ------------------------


def add_composite_scores(df: DataFrame) -> DataFrame:
    return (
        df.withColumn(
            "engagement_score",
            F.round(
                (F.col("SentimentPositive") + F.col("SentimentNegative"))
                * F.col("NumWords")
                / 100,
                3,
            ),
        )
        .withColumn(
            "complexity_score",
            F.round(
                F.col("AutomatedReadabilityIndex") * F.col("AvgWordsPerSentence") / 10, 3
            ),
        )
        .withColumn(
            "quality_score",
            F.round(
                (1 - F.col("FracSpecialChars")) * F.col("AvgCharsPerSentence") / 100, 3
            ),
        )
    )


# -- step 7: final metrics (etl_spark.py:216-224) ---------------------------


def final_metrics(df: DataFrame) -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).alias("final_count"),
        F.avg("engagement_score").alias("avg_engagement"),
        F.avg("complexity_score").alias("avg_complexity"),
        F.avg("quality_score").alias("avg_quality"),
        F.max("engagement_score").alias("max_engagement"),
        F.max("complexity_score").alias("max_complexity"),
        F.max("quality_score").alias("max_quality"),
    )


# -- summary sink table (etl_spark.py:253-257) ------------------------------


def summary_stats(df: DataFrame) -> DataFrame:
    return df.groupBy("sentiment_category", "readability_level").agg(
        F.count(F.lit(1)).alias("count"),
        F.avg("engagement_score").alias("avg_engagement"),
        F.avg("complexity_score").alias("avg_complexity"),
        F.avg("quality_score").alias("avg_quality"),
    )


def transform(df: DataFrame) -> DataFrame:
    """Full transform chain: categories → cleanse → scores, one plan."""
    return add_composite_scores(cleanse(add_categories(df)))


# -- fused reporting pass ----------------------------------------------------
#
# The reference runs steps 3, 4, 7 and the summary sink as FOUR separate
# actions over the cached transform (etl_spark.py:163-224,253-257) — four
# scans, four shuffles. GROUPING SETS computes all four groupings in one
# hash-aggregate pass: one scan, one shuffle, split by grouping_id after.

_GID_SENTIMENT = 0b011  # grouped by sentiment_category only
_GID_READABILITY = 0b100  # grouped by (readability_level, word_length_category)
_GID_SUMMARY = 0b001  # grouped by (sentiment_category, readability_level)
_GID_FINAL = 0b111  # global


def fused_aggregations(df: DataFrame) -> DataFrame:
    """One grouping-sets pass computing the union of the four reporting
    aggregates; filter on `gid` (see split_fused) to recover each."""
    return df.groupingSets(
        [
            ["sentiment_category"],
            ["readability_level", "word_length_category"],
            ["sentiment_category", "readability_level"],
            [],
        ],
        "sentiment_category",
        "readability_level",
        "word_length_category",
    ).agg(
        F.count(F.lit(1)).alias("count"),
        F.avg("SentimentCompound").alias("avg_sentiment"),
        F.avg("NumWords").alias("avg_words"),
        F.avg("AvgWordsPerSentence").alias("avg_words_per_sentence"),
        F.avg("AutomatedReadabilityIndex").alias("avg_readability"),
        F.avg("engagement_score").alias("avg_engagement"),
        F.avg("complexity_score").alias("avg_complexity"),
        F.avg("quality_score").alias("avg_quality"),
        F.max("engagement_score").alias("max_engagement"),
        F.max("complexity_score").alias("max_complexity"),
        F.max("quality_score").alias("max_quality"),
        F.grouping_id().alias("gid"),
    )


def split_fused(fused: DataFrame) -> dict[str, DataFrame]:
    """Recover the four reference-shaped outputs from the fused pass
    (column sets and orderings identical to the per-step functions)."""
    sentiment = (
        fused.filter(F.col("gid") == _GID_SENTIMENT)
        .select(
            "sentiment_category", "count", "avg_sentiment", "avg_words", "avg_words_per_sentence"
        )
        .orderBy(F.desc("count"))
    )
    readability = (
        fused.filter(F.col("gid") == _GID_READABILITY)
        .select(
            "readability_level", "word_length_category", "count", "avg_readability", "avg_sentiment"
        )
        .orderBy("readability_level", F.desc("count"))
    )
    summary = fused.filter(F.col("gid") == _GID_SUMMARY).select(
        "sentiment_category", "readability_level", "count",
        "avg_engagement", "avg_complexity", "avg_quality",
    )
    final = fused.filter(F.col("gid") == _GID_FINAL).select(
        F.col("count").alias("final_count"),
        "avg_engagement", "avg_complexity", "avg_quality",
        "max_engagement", "max_complexity", "max_quality",
    )
    return {
        "sentiment": sentiment,
        "readability": readability,
        "summary": summary,
        "final": final,
    }
