from .cleaning import (
    coalesce_multi_format_timestamp,
    decimal_comma_to_double,
    epoch_diff_hours,
    epoch_diff_minutes,
    month_of,
    normalized_eq,
    safe_array_size,
)

__all__ = [
    "coalesce_multi_format_timestamp",
    "decimal_comma_to_double",
    "epoch_diff_hours",
    "epoch_diff_minutes",
    "month_of",
    "normalized_eq",
    "safe_array_size",
]
