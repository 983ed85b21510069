from .branches import (
    FACT_COLUMNS,
    agg_china_branch,
    config_brand_region,
    derive_rates,
    item_status_branch,
    latest_rates,
    tomford_branch,
    union_branches,
)

__all__ = [
    "FACT_COLUMNS",
    "agg_china_branch",
    "config_brand_region",
    "derive_rates",
    "item_status_branch",
    "latest_rates",
    "tomford_branch",
    "union_branches",
]
