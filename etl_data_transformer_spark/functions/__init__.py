from .scalar import (
    case_map,
    day_floor_string,
    deterministic_uuid,
    ifnull,
    in_list,
    lookback,
    norm_upper_key,
    safe_divide,
    strip_digits_parens_key,
    surrogate_key,
    two_digit_year,
    ts,
)

__all__ = [
    "case_map",
    "day_floor_string",
    "deterministic_uuid",
    "ifnull",
    "in_list",
    "lookback",
    "norm_upper_key",
    "safe_divide",
    "strip_digits_parens_key",
    "surrogate_key",
    "two_digit_year",
    "ts",
]
