"""Explicit schemas.

The reference reads every CSV with ``inferSchema=true``
(etl_spark.py:88-94, pagerank_spark.py:76-80, kmeans_spark.py:82-87,
triangles_spark.py:71-74) — a full extra pass over the data and a
pushdown killer. We declare schemas instead (SURVEY §1.1 column list) so
Catalyst can prune/push down from the first action.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The reference's single base table: 26 columns produced by
# data/get-data.sh:50-71 from SNAP soc-redditHyperlinks-body.tsv.
REDDIT_POSTS = T.StructType(
    [
        T.StructField("SOURCE_SUBREDDIT", T.StringType()),
        T.StructField("TARGET_SUBREDDIT", T.StringType()),
        T.StructField("POST_ID", T.StringType()),
        T.StructField("TIMESTAMP", T.TimestampType()),
        T.StructField("LINK_SENTIMENT", T.IntegerType()),
        T.StructField("NumCharacters", T.IntegerType()),
        T.StructField("NumCharactersNoSpace", T.IntegerType()),
        T.StructField("FracAlphabetical", T.DoubleType()),
        T.StructField("FracDigits", T.DoubleType()),
        T.StructField("FracUppercase", T.DoubleType()),
        T.StructField("FracWhiteSpace", T.DoubleType()),
        T.StructField("FracSpecialChars", T.DoubleType()),
        T.StructField("NumWords", T.IntegerType()),
        T.StructField("NumUniqueWords", T.IntegerType()),
        T.StructField("NumLongWords", T.IntegerType()),
        T.StructField("AvgWordLength", T.DoubleType()),
        T.StructField("NumUniqueStopwords", T.IntegerType()),
        T.StructField("FracStopwords", T.DoubleType()),
        T.StructField("NumSentences", T.IntegerType()),
        T.StructField("NumLongSentences", T.IntegerType()),
        T.StructField("AvgCharsPerSentence", T.DoubleType()),
        T.StructField("AvgWordsPerSentence", T.DoubleType()),
        T.StructField("AutomatedReadabilityIndex", T.DoubleType()),
        T.StructField("SentimentPositive", T.DoubleType()),
        T.StructField("SentimentNegative", T.DoubleType()),
        T.StructField("SentimentCompound", T.DoubleType()),
    ]
)

# The 8 numeric features K-means consumes (kmeans_spark.py:97-110).
KMEANS_FEATURES = [
    "FracSpecialChars",
    "NumWords",
    "AvgCharsPerSentence",
    "AvgWordsPerSentence",
    "AutomatedReadabilityIndex",
    "SentimentPositive",
    "SentimentNegative",
    "SentimentCompound",
]

# Driver-provided synthetic test tables (/root/testdata, TESTDATA.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
