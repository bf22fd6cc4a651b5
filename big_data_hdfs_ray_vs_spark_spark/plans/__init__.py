from .iterate import iterate_until
from .graph import build_graph, pagerank, triangle_count, triangle_count_df
from .kmeans import kmeans_fit

__all__ = [
    "iterate_until",
    "build_graph",
    "pagerank",
    "triangle_count",
    "triangle_count_df",
    "kmeans_fit",
]
