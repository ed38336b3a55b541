from .aggregates import daily_avg, mode_by_group
from .dedup import dedup_keep_first
from .percentile import global_percentile_bounds, percentile_trim
from .topk import topk_extremes

__all__ = [
    "daily_avg",
    "mode_by_group",
    "dedup_keep_first",
    "global_percentile_bounds",
    "percentile_trim",
    "topk_extremes",
]
