"""K-means: MLlib wrapper with the reference's exact configuration
(kmeans_spark.py:97-150): VectorAssembler(handleInvalid="skip") over the
8 text features, KMeans(k, maxIter=20, seed=42, initMode="k-means||",
tol=1e-4). The Lloyd loop runs inside MLlib's JVM fit — nothing to
hand-roll (SURVEY §3.3).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_features(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Numeric columns → MLlib vector column, skipping rows with
    null/NaN in any feature (kmeans_spark.py:104-110)."""
    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol="features", handleInvalid="skip"
    )
    return assembler.transform(df)


def kmeans_fit(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 3,
    max_iter: int = 20,
    tol: float = 1e-4,
    seed: int = 42,
):
    """Returns (centroids: list[list[float]], assignments_df, model).

    assignments_df carries a `cluster` int column (model.transform
    renamed, kmeans_spark.py:153-165)."""
    assembled = assemble_features(df, feature_cols).persist()
    assembled.count()
    km = (
        KMeans()
        .setK(k)
        .setMaxIter(max_iter)
        .setTol(tol)
        .setSeed(seed)
        .setInitMode("k-means||")
        .setFeaturesCol("features")
        .setPredictionCol("cluster")
    )
    model = km.fit(assembled)
    assignments = model.transform(assembled)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    assembled.unpersist()
    return centroids, assignments, model


def cluster_histogram(assignments: DataFrame) -> DataFrame:
    """groupBy(cluster).count() ordered by cluster (kmeans_spark.py:162)."""
    return (
        assignments.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("cluster")
    )
