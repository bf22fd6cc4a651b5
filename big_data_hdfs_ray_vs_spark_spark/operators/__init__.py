from . import etl, relational, dedup, sampling, similarity, text, multimodal

__all__ = ["etl", "relational", "dedup", "sampling", "similarity", "text", "multimodal"]
