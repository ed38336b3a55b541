from .aggregates import conditional_count, daily_avg, mode_by_group
from .dedup import dedup_keep_first
from .normalize import normalize_nutrition_xml, normalize_pets_json
from .percentile import global_percentile_bounds, percentile_trim
from .similarity import (
    brute_force_topk,
    cosine,
    embedding_near_dedup,
    embedding_near_dup_ids,
    ivf_topk,
)
from .skew import salted_join
from .text_dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from .topk import topk_extremes

__all__ = [
    "conditional_count",
    "daily_avg",
    "mode_by_group",
    "dedup_keep_first",
    "normalize_nutrition_xml",
    "normalize_pets_json",
    "global_percentile_bounds",
    "percentile_trim",
    "brute_force_topk",
    "cosine",
    "embedding_near_dedup",
    "embedding_near_dup_ids",
    "ivf_topk",
    "salted_join",
    "exact_dedup",
    "minhash_dedup",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
    "topk_extremes",
]
