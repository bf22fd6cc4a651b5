from . import etl_pipeline, pagerank_pipeline, triangles_pipeline, kmeans_pipeline

__all__ = [
    "etl_pipeline",
    "pagerank_pipeline",
    "triangles_pipeline",
    "kmeans_pipeline",
]
