from .registry import load_table, load_tables, register_views, sf_dir_from_env
from .reddit import read_reddit_csv, synthetic_reddit_posts, reddit_edges
from .jsonl import read_documents_jsonl, write_documents_jsonl
from .layout import write_bucketed, write_partitioned, physical_plan

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "sf_dir_from_env",
    "read_reddit_csv",
    "synthetic_reddit_posts",
    "reddit_edges",
    "read_documents_jsonl",
    "write_documents_jsonl",
    "write_bucketed",
    "write_partitioned",
    "physical_plan",
]
