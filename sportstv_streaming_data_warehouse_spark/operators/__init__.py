from .windows import per_group_argmax, yoy_growth
from .dedup import (
    connected_components,
    dedup_by_clusters,
    exact_dedup,
    minhash_near_duplicates,
    simhash_near_duplicates,
    simhash_signatures,
    token_jaccard_pairs,
    word_shingles,
)
from .similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
    normalize_embeddings,
    normalize_embeddings_pandas,
)
from .asof import asof_join
from .ranges import range_join
from .skew import salted_aggregate, salted_join
from .regression import trend_apply_in_pandas, trend_expr
from . import multimodal

__all__ = [
    "per_group_argmax",
    "yoy_growth",
    "connected_components",
    "dedup_by_clusters",
    "exact_dedup",
    "minhash_near_duplicates",
    "simhash_near_duplicates",
    "simhash_signatures",
    "token_jaccard_pairs",
    "word_shingles",
    "brute_force_topk",
    "ivf_topk",
    "lsh_bucketed_topk",
    "normalize_embeddings",
    "normalize_embeddings_pandas",
    "asof_join",
    "range_join",
    "salted_aggregate",
    "salted_join",
    "trend_apply_in_pandas",
    "trend_expr",
    "multimodal",
]
