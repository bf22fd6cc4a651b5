"""SNAP TSV ingest parity (reference data/get-data.sh:50-71): the raw
soc-redditHyperlinks TSV's comma-joined POST_PROPERTIES expands to the
21 typed feature columns; short vectors empty-fill to NULL and
malformed values null out exactly like the permissive CSV parse of the
reference's awk-converted file."""

from __future__ import annotations

from big_data_hdfs_ray_vs_spark_spark.schemas import REDDIT_POSTS
from big_data_hdfs_ray_vs_spark_spark.sources.reddit import read_snap_tsv

HEADER = "SOURCE_SUBREDDIT\tTARGET_SUBREDDIT\tPOST_ID\tTIMESTAMP\tLINK_SENTIMENT\tPROPERTIES"

# 21 well-typed properties (positions match REDDIT_POSTS fields 6..26)
# plus two extras that the expansion must drop.
FULL_PROPS = (
    "100,90,0.8,0.1,0.2,0.15,0.05,20,15,3,4.2,5,0.3,2,1,50.0,10.0,7.5,0.6,0.1,0.5"
    ",999,888"
)
SHORT_PROPS = "101,102,0.9"
BAD_INT_PROPS = "1.5," + SHORT_PROPS  # fractional string in an int slot

ROWS = [
    f"askreddit\tpics\tp1\t2014-01-02 03:04:05\t1\t{FULL_PROPS}",
    f"pics\taskreddit\tp2\t2015-06-07 08:09:10\t-1\t{SHORT_PROPS}",
    f"funny\tfunny\tp3\t2016-11-12 13:14:15\t1\t{FULL_PROPS}",
    f"news\tworldnews\tp4\t2017-03-04 05:06:07\t-1\t{BAD_INT_PROPS}",
    f"iama\tvideos\tp5\t2018-08-09 10:11:12\t1\t{FULL_PROPS}",
]


def _load(spark, tmp_path):
    p = tmp_path / "snap.tsv"
    p.write_text(HEADER + "\n" + "\n".join(ROWS) + "\n")
    return read_snap_tsv(spark, str(p))


def test_snap_tsv_expands_to_26_columns(spark, tmp_path):
    df = _load(spark, tmp_path)
    assert df.schema == REDDIT_POSTS
    rows = {r["POST_ID"]: r for r in df.collect()}
    assert len(rows) == 5
    r1 = rows["p1"]
    assert r1["SOURCE_SUBREDDIT"] == "askreddit"
    assert r1["LINK_SENTIMENT"] == 1
    assert r1["TIMESTAMP"].year == 2014
    assert r1["NumCharacters"] == 100
    assert r1["NumCharactersNoSpace"] == 90
    assert r1["FracAlphabetical"] == 0.8
    assert r1["NumWords"] == 20
    assert r1["AvgCharsPerSentence"] == 50.0
    assert r1["SentimentCompound"] == 0.5  # prop 21 of 21; 999/888 dropped


def test_snap_tsv_short_vector_null_fills(spark, tmp_path):
    r2 = {r["POST_ID"]: r for r in _load(spark, tmp_path).collect()}["p2"]
    assert r2["NumCharacters"] == 101
    assert r2["NumCharactersNoSpace"] == 102
    assert r2["FracAlphabetical"] == 0.9
    # Everything past the 3 provided properties is the awk empty-fill → NULL.
    assert r2["FracDigits"] is None
    assert r2["SentimentCompound"] is None


def test_snap_tsv_malformed_int_nulls_like_csv_parse(spark, tmp_path):
    r4 = {r["POST_ID"]: r for r in _load(spark, tmp_path).collect()}["p4"]
    assert r4["NumCharacters"] is None  # "1.5" in an int slot → null
    assert r4["NumCharactersNoSpace"] == 101


def test_snap_tsv_feeds_graph_edges(spark, tmp_path):
    from big_data_hdfs_ray_vs_spark_spark.sources.reddit import reddit_edges

    edges = reddit_edges(_load(spark, tmp_path))
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert ("askreddit", "pics") in got
    assert ("funny", "funny") in got  # self-loop preserved
    assert len(got) == 5
