from .aggregates import dedup_full_rows, dup_count, group_max, latest_per_group, scalar_max
from .joins import broadcast_dim_join, const_pinned_dim_join, normalized_key_join, null_tolerant_join

__all__ = [
    "dedup_full_rows",
    "dup_count",
    "group_max",
    "latest_per_group",
    "scalar_max",
    "broadcast_dim_join",
    "const_pinned_dim_join",
    "normalized_key_join",
    "null_tolerant_join",
]
