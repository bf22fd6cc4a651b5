"""Reddit-hyperlinks base-table sources.

- ``read_reddit_csv``: the reference's CSV scan (etl_spark.py:88-94)
  with an explicit schema instead of ``inferSchema`` (SURVEY §1.1).
- ``synthetic_reddit_posts``: deterministic, fully-distributed synthetic
  generator with the same 26-column shape, used by fixture tests and the
  bench harness (the reference's data/generate-data.py is a driver-side
  pandas bootstrap; ours is `spark.range` + hash-derived columns, so it
  scales to any row count with no driver memory).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import REDDIT_POSTS


def read_reddit_csv(spark: SparkSession, path: str, partitions: int | None = None) -> DataFrame:
    """CSV scan matching the reference reader options (etl_spark.py:88-94)
    but with the explicit 26-column schema so pushdown/pruning work."""
    df = (
        spark.read.format("csv")
        .option("header", "true")
        .option("multiline", "false")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .schema(REDDIT_POSTS)
        .load(path)
    )
    if partitions:
        df = df.repartition(partitions)
    return df


SNAP_TSV_SCHEMA = (
    "SOURCE_SUBREDDIT string, TARGET_SUBREDDIT string, POST_ID string, "
    "TIMESTAMP timestamp, LINK_SENTIMENT int, PROPERTIES string"
)


def read_snap_tsv(spark: SparkSession, path: str, partitions: int | None = None) -> DataFrame:
    """Raw SNAP soc-redditHyperlinks TSV → the 26-column posts table.

    Replays the reference's ingest expansion (data/get-data.sh:50-71):
    the 6th TSV field is the comma-joined POST_PROPERTIES vector; the
    first 21 properties become the typed feature columns, with missing
    trailing properties (and empty strings) as NULL — the awk script's
    empty-fill. Expressed as one split() + 21 typed projections, so it
    stays whole-stage-codegen and needs no driver pass over the file."""
    raw = (
        spark.read.format("csv")
        .option("sep", "\t")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .schema(SNAP_TSV_SCHEMA)
        .load(path)
    )
    props = F.split(F.col("PROPERTIES"), ",")
    cols: list[Column] = [F.col(f.name) for f in REDDIT_POSTS.fields[:5]]
    for i, field in enumerate(REDDIT_POSTS.fields[5:]):
        # F.get is out-of-bounds-null (unlike element_at under ANSI);
        # try_cast nulls malformed values exactly like the permissive
        # CSV parser does on the reference's awk-converted file.
        cols.append(F.get(props, i).try_cast(field.dataType).alias(field.name))
    df = raw.select(*cols)
    if partitions:
        df = df.repartition(partitions)
    return df


def _u(seed: int) -> Column:
    """Deterministic uniform [0,1) derived from the row id — stable under
    any partitioning (unlike F.rand, which depends on partition layout)."""
    return (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000_000)) / 1e9)


def _subreddit(seed: int, vocab: int = 500) -> Column:
    # Skewed (hub-heavy) draw: squaring the uniform concentrates mass on
    # low indices, giving "askreddit"-like hubs (FIXTURES.md §1).
    u = _u(seed)
    return F.concat(F.lit("sub_"), F.floor(u * u * vocab).cast("string"))


def synthetic_reddit_posts(spark: SparkSession, n_rows: int, partitions: int = 32) -> DataFrame:
    """26-column synthetic reddit_posts table, seeded and deterministic.

    Domains follow FIXTURES.md §1: ~1% nulls in FracSpecialChars and
    NumWords, ~1% FracSpecialChars > 1 and SentimentCompound < -1 (the
    cleansing filter / invalid-count targets, etl_spark.py:121-129 and
    :194-199), self-loops and duplicate edges in the subreddit pair.
    """
    df = spark.range(0, n_rows, 1, partitions)
    src = _subreddit(1)
    # ~0.5% self-loops, ~5% duplicate-heavy targets.
    dst_base = _subreddit(2)
    dst = F.when(_u(3) < 0.005, src).otherwise(dst_base)
    num_words = F.when(_u(10) < 0.01, F.lit(None).cast("int")).otherwise(
        F.floor(_u(11) * 10_000).cast("int")
    )
    frac_special = (
        F.when(_u(12) < 0.01, F.lit(None).cast("double"))
        .when(_u(12) > 0.99, 1.0 + _u(13))
        .otherwise(_u(13))
    )
    sent_comp = F.when(_u(14) < 0.005, -1.0 - _u(15)).otherwise(_u(15) * 2 - 1)
    num_chars = F.floor(_u(16) * 40_000).cast("int") + 1
    num_sentences = F.floor(_u(17) * 2_000).cast("int")
    return df.select(
        src.alias("SOURCE_SUBREDDIT"),
        dst.alias("TARGET_SUBREDDIT"),
        F.lower(F.hex(F.xxhash64("id", F.lit(99)))).substr(1, 8).alias("POST_ID"),
        F.timestamp_seconds(
            F.lit(1_388_534_400) + F.floor(_u(18) * 94_608_000).cast("long")
        ).alias("TIMESTAMP"),
        F.when(_u(19) < 0.5, -1).otherwise(1).alias("LINK_SENTIMENT"),
        num_chars.alias("NumCharacters"),
        F.floor(num_chars * (0.7 + _u(20) * 0.3)).cast("int").alias("NumCharactersNoSpace"),
        _u(21).alias("FracAlphabetical"),
        _u(22).alias("FracDigits"),
        _u(23).alias("FracUppercase"),
        _u(24).alias("FracWhiteSpace"),
        frac_special.alias("FracSpecialChars"),
        num_words.alias("NumWords"),
        F.floor(F.coalesce(num_words, F.lit(0)) * _u(25)).cast("int").alias("NumUniqueWords"),
        F.floor(F.coalesce(num_words, F.lit(0)) * _u(26) * 0.3).cast("int").alias("NumLongWords"),
        (1.0 + _u(27) * 14).alias("AvgWordLength"),
        F.floor(_u(28) * 300).cast("int").alias("NumUniqueStopwords"),
        _u(29).alias("FracStopwords"),
        num_sentences.alias("NumSentences"),
        F.floor(num_sentences * _u(30) * 0.5).cast("int").alias("NumLongSentences"),
        (_u(31) * 10_000).alias("AvgCharsPerSentence"),
        (_u(32) * 200).alias("AvgWordsPerSentence"),
        (_u(33) * 65 - 5).alias("AutomatedReadabilityIndex"),
        _u(34).alias("SentimentPositive"),
        _u(35).alias("SentimentNegative"),
        sent_comp.alias("SentimentCompound"),
    )


def reddit_edges(posts: DataFrame) -> DataFrame:
    """Project the graph edge list (pagerank_spark.py:86-91,
    triangles_spark.py:77-80): rename + null-rejection, no dedup (dedup
    is PageRank-specific, SURVEY §2.8)."""
    return posts.select(
        F.col("SOURCE_SUBREDDIT").alias("src"),
        F.col("TARGET_SUBREDDIT").alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
