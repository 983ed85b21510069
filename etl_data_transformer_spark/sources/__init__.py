from . import manifest
from .readers import FIXTURE_TABLES, load_star, read_csv, read_jsonl, read_table, register_views
from .writers import append_parquet, atomic_swap_write, drop_table, write_parquet

__all__ = [
    "FIXTURE_TABLES",
    "load_star",
    "manifest",
    "read_csv",
    "read_jsonl",
    "read_table",
    "register_views",
    "append_parquet",
    "atomic_swap_write",
    "drop_table",
    "write_parquet",
]
