from .dedup import exact_dedup, minhash_near_duplicates
from .similarity import brute_force_cosine_topk
from .text import term_frequencies, text_quality

__all__ = [
    "brute_force_cosine_topk",
    "exact_dedup",
    "minhash_near_duplicates",
    "term_frequencies",
    "text_quality",
]
