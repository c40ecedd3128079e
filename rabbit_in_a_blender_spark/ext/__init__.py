from .dedup import exact_dedup_groups, shingle_sets, minhash_signatures, lsh_candidate_pairs, ngram_jaccard_pairs
from .similarity import cosine_topk
from .text import text_stats, token_counts, doc_fingerprint, langid_heuristic

__all__ = [
    "exact_dedup_groups",
    "shingle_sets",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "text_stats",
    "token_counts",
    "doc_fingerprint",
    "langid_heuristic",
]
