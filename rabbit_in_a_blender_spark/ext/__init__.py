from .bpe import (
    bpe_encode_ids,
    bpe_token_counts,
    bpe_tokenize,
    bpe_vocab,
    train_bpe,
    word_frequencies,
)
from .budget import deterministic_shuffle, token_budget_select
from .decontam import benchmark_ngrams, contamination_overlap, decontaminate
from .dedup import (
    exact_dedup_groups,
    incremental_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_sets,
    signature_bands,
    unpersist_intermediates,
)
from .dsir import (
    compact_model,
    dsir_model_counts,
    dsir_resample,
    dsir_select,
    dsir_weights,
    fit_bucket_logratio,
    hashed_ngram_buckets,
    incremental_dsir_weights,
)
from .packing import bin_summary, pack_next_fit
from .sampling import (
    balance_sample,
    deterministic_sample,
    stratified_sample,
    train_val_test_split,
    upsample_epochs,
)
from .scrub import redact_pii, repetition_stats
from .ivfpq import build_ivfpq_index, ivfpq_search, train_residual_books
from .similarity import cosine_topk
from .text import (
    chunk_documents,
    doc_fingerprint,
    langid_heuristic,
    text_stats,
    token_counts,
    unigram_logprob,
)

__all__ = [
    "exact_dedup_groups",
    "shingle_sets",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "signature_bands",
    "incremental_dedup",
    "unpersist_intermediates",
    "token_budget_select",
    "deterministic_shuffle",
    "build_ivfpq_index",
    "ivfpq_search",
    "train_residual_books",
    "benchmark_ngrams",
    "contamination_overlap",
    "decontaminate",
    "pack_next_fit",
    "bin_summary",
    "deterministic_sample",
    "stratified_sample",
    "train_val_test_split",
    "balance_sample",
    "upsample_epochs",
    "redact_pii",
    "repetition_stats",
    "hashed_ngram_buckets",
    "fit_bucket_logratio",
    "dsir_weights",
    "dsir_resample",
    "dsir_select",
    "dsir_model_counts",
    "incremental_dsir_weights",
    "compact_model",
    "cosine_topk",
    "text_stats",
    "token_counts",
    "doc_fingerprint",
    "langid_heuristic",
    "unigram_logprob",
    "chunk_documents",
    "word_frequencies",
    "train_bpe",
    "bpe_tokenize",
    "bpe_token_counts",
    "bpe_vocab",
    "bpe_encode_ids",
]
