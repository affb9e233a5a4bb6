from .windows import per_group_argmax, yoy_growth
from .dedup import exact_dedup, minhash_near_duplicates, simhash_signatures, token_jaccard_pairs
from .similarity import brute_force_topk, lsh_bucketed_topk

__all__ = [
    "per_group_argmax",
    "yoy_growth",
    "exact_dedup",
    "minhash_near_duplicates",
    "simhash_signatures",
    "token_jaccard_pairs",
    "brute_force_topk",
    "lsh_bucketed_topk",
]
