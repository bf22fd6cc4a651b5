"""PySpark-native analytics engine with the query/data-processing
capabilities of liuminex/Big-Data-HDFS-Ray-vs-Spark.

The reference (/root/reference) is a Spark-vs-Ray benchmark suite: four
analytic workloads (ETL, PageRank, triangle counting, K-means) over a
Reddit-hyperlinks table. This package re-expresses those workload
semantics — plus a first-class LLM-training-data operator layer (dedup,
similarity search, text analysis, multimodal plumbing) — as an idiomatic
Spark DataFrame library: declarative plans, Catalyst/AQE optimization,
explicit schemas, no driver-side collect loops.

Layout:
    session    — opinionated SparkSession factory
    sources    — parquet/CSV readers (explicit schemas), testdata registry,
                 deterministic synthetic reddit_posts generator
    functions  — column-expression helpers (hashing, cosine, scores)
    operators  — relational + ETL + dedup + similarity + text ops
    plans      — iterative drivers: pagerank, triangles, kmeans
    streaming  — Structured Streaming surface over the events table
    pipelines  — end-to-end workloads mirroring the reference CLIs
"""

__version__ = "0.1.0"
