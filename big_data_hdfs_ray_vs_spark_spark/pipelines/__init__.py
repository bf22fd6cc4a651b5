from . import (
    curate_pipeline,
    etl_pipeline,
    kmeans_pipeline,
    pagerank_pipeline,
    triangles_pipeline,
)

__all__ = [
    "curate_pipeline",
    "etl_pipeline",
    "pagerank_pipeline",
    "triangles_pipeline",
    "kmeans_pipeline",
]
