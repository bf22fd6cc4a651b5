from . import etl, relational, dedup, similarity, text, multimodal

__all__ = ["etl", "relational", "dedup", "similarity", "text", "multimodal"]
