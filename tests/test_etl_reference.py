"""Reference-ETL semantics on the FIXTURES.md §1 boundary rows.

The CASE-WHEN bucket edges are where the reference's two
implementations disagree (etl_spark.py:143-159 strict `<` vs etl_ray.py
pd.cut); our canon is the Spark variant — these tests pin every edge.
"""

import pytest
from pyspark.sql import Row, functions as F

from big_data_hdfs_ray_vs_spark_spark.operators import etl


_SCHEMA = (
    "SOURCE_SUBREDDIT string, TARGET_SUBREDDIT string, NumWords int, "
    "AutomatedReadabilityIndex double, SentimentCompound double, "
    "FracSpecialChars double, SentimentPositive double, SentimentNegative double, "
    "AvgWordsPerSentence double, AvgCharsPerSentence double"
)


def _posts(spark, rows):
    base = dict(
        SOURCE_SUBREDDIT="s",
        TARGET_SUBREDDIT="t",
        NumWords=20,
        AutomatedReadabilityIndex=7.0,
        SentimentCompound=0.0,
        FracSpecialChars=0.05,
        SentimentPositive=0.5,
        SentimentNegative=0.1,
        AvgWordsPerSentence=10.0,
        AvgCharsPerSentence=50.0,
    )
    cols = [f.split()[0] for f in _SCHEMA.split(", ")]
    data = [tuple({**base, **r}[c] for c in cols) for r in rows]
    return spark.createDataFrame(data, _SCHEMA)


@pytest.mark.parametrize(
    "num_words,expected",
    [(0, "short"), (9, "short"), (10, "medium"), (49, "medium"), (50, "long"), (None, "long")],
)
def test_word_length_buckets(spark, num_words, expected):
    df = _posts(spark, [{"NumWords": num_words}])
    got = etl.add_categories(df).select("word_length_category").first()[0]
    assert got == expected


@pytest.mark.parametrize(
    "ari,expected",
    [
        (5.9, "elementary"),
        (6.0, "middle_school"),
        (8.9, "middle_school"),
        (9.0, "high_school"),
        (12.9, "high_school"),
        (13.0, "college"),
    ],
)
def test_readability_buckets(spark, ari, expected):
    df = _posts(spark, [{"AutomatedReadabilityIndex": ari}])
    got = etl.add_categories(df).select("readability_level").first()[0]
    assert got == expected


@pytest.mark.parametrize(
    "sc,expected",
    [
        (-0.1, "neutral"),
        (0.0, "neutral"),
        (0.1, "neutral"),
        (0.10001, "positive"),
        (-0.2, "negative"),
        (None, "neutral"),  # null lands in otherwise (Spark-variant canon)
    ],
)
def test_sentiment_buckets(spark, sc, expected):
    df = _posts(spark, [{"SentimentCompound": sc}])
    got = etl.add_categories(df).select("sentiment_category").first()[0]
    assert got == expected


@pytest.mark.parametrize(
    "frac,expected",
    [(0.0, "low"), (0.1, "medium"), (0.3, "high"), (1.0, "high"), (None, "high")],
)
def test_special_chars_buckets(spark, frac, expected):
    df = _posts(spark, [{"FracSpecialChars": frac}])
    got = etl.add_categories(df).select("special_chars_ratio_binned").first()[0]
    assert got == expected


def test_cleansing_boundaries(spark):
    rows = [
        {"NumWords": 0},  # rejected: needs > 0
        {"NumWords": 1},  # kept
        {"SentimentCompound": -1.5},  # rejected: outside [-1, 1]
        {"SentimentCompound": 1.0},  # kept: between is inclusive
        {"FracSpecialChars": 1.0},  # kept
        {"FracSpecialChars": 1.1},  # rejected
        {"FracSpecialChars": None},  # rejected: 3VL null
        {"AutomatedReadabilityIndex": 0.0},  # rejected: needs > 0
        {"NumWords": None},  # rejected
    ]
    df = _posts(spark, rows)
    assert etl.cleanse(df).count() == 3


def test_quality_stats_conditional_counts(spark):
    rows = [
        {"NumWords": None},
        {"FracSpecialChars": None},
        {"SentimentCompound": -1.5},
        {"NumWords": 7},
    ]
    df = _posts(spark, rows)
    r = etl.quality_stats(df).first()
    assert r["total_rows"] == 4
    assert r["null_num_words"] == 1
    assert r["null_frac_special"] == 1
    assert r["invalid_sentiment"] == 1
    assert r["max_words"] == 20
    assert r["min_words"] == 7


def test_composite_score_formulas(spark):
    df = _posts(
        spark,
        [
            {
                "SentimentPositive": 0.25,
                "SentimentNegative": 0.15,
                "NumWords": 200,
                "AutomatedReadabilityIndex": 8.0,
                "AvgWordsPerSentence": 12.5,
                "FracSpecialChars": 0.2,
                "AvgCharsPerSentence": 55.0,
            }
        ],
    )
    r = etl.add_composite_scores(df).first()
    # engagement = round((0.25+0.15)*200/100, 3); complexity = round(8*12.5/10, 3)
    # quality = round((1-0.2)*55/100, 3)   (etl_spark.py:207-212)
    assert r["engagement_score"] == pytest.approx(0.8)
    assert r["complexity_score"] == pytest.approx(10.0)
    assert r["quality_score"] == pytest.approx(0.44)


def test_transform_chain_and_summary(spark):
    df = _posts(spark, [{"NumWords": n} for n in (5, 15, 60, 0)])
    out = etl.transform(df)
    assert out.count() == 3  # NumWords=0 cleansed
    summary = etl.summary_stats(out)
    assert {"sentiment_category", "readability_level", "count"} <= set(summary.columns)
    fm = etl.final_metrics(out).first()
    assert fm["final_count"] == 3


def test_fused_aggregations_match_per_step(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators import etl
    from big_data_hdfs_ray_vs_spark_spark.sources.reddit import synthetic_reddit_posts

    t = etl.transform(synthetic_reddit_posts(spark, 20_000)).cache()
    fused = etl.fused_aggregations(t).cache()
    parts = etl.split_fused(fused)

    def rows(df, cols):
        return sorted(
            tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
            for r in df.collect()
        )

    s_cols = ["sentiment_category", "count", "avg_sentiment", "avg_words", "avg_words_per_sentence"]
    assert rows(parts["sentiment"], s_cols) == rows(etl.sentiment_aggregation(t), s_cols)
    r_cols = ["readability_level", "word_length_category", "count", "avg_readability", "avg_sentiment"]
    assert rows(parts["readability"], r_cols) == rows(etl.readability_aggregation(t), r_cols)
    m_cols = ["sentiment_category", "readability_level", "count", "avg_engagement", "avg_complexity", "avg_quality"]
    assert rows(parts["summary"], m_cols) == rows(etl.summary_stats(t), m_cols)
    f_cols = ["final_count", "avg_engagement", "avg_complexity", "avg_quality",
              "max_engagement", "max_complexity", "max_quality"]
    assert rows(parts["final"], f_cols) == rows(etl.final_metrics(t), f_cols)
    fused.unpersist(); t.unpersist()
