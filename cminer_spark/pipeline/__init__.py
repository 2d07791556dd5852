from cminer_spark.pipeline.dedup import (
    band_corpus,
    dedup_against,
    dedup_clusters,
    exact_duplicates,
    lsh_candidates_against,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    verified_duplicate_pairs,
)
from cminer_spark.pipeline.similarity import (
    kmeans,
    brute_force_cosine_topk,
    cosine_near_duplicates,
    embedding_dedup_clusters,
    embedding_overflow_buckets,
    ivf_topk,
    ivf_train_centroids,
    lsh_bucketed_topk,
    pseudo_random_centroids,
)
from cminer_spark.pipeline.projection import random_projection
from cminer_spark.pipeline.quantize import dequantize_embeddings, quantize_embeddings
from cminer_spark.pipeline.redact import PII_PATTERNS, redact_pii
from cminer_spark.pipeline.curation import (
    normalize_text,
    decontaminate,
    deterministic_split,
    quota_sample,
    split_hash,
)
from cminer_spark.pipeline.chunking import chunk_documents
from cminer_spark.pipeline.dialogs import (
    build_training_pairs,
    conversation_stats,
    filter_conversations,
    tool_transitions,
)
from cminer_spark.pipeline.bpe import (
    bpe_token_counts,
    segment_words,
    train_bpe,
)
from cminer_spark.pipeline.importance import importance_weights
from cminer_spark.pipeline.lines import line_dedup
from cminer_spark.pipeline.spans import (
    duplicate_spans,
    span_dup_stats,
    strip_duplicate_spans,
)
from cminer_spark.pipeline.ranking import bm25_search, tfidf_top_terms
from cminer_spark.pipeline.classifier import (
    classify_corpus,
    evaluate_predictions,
    score_naive_bayes,
    train_naive_bayes,
)
from cminer_spark.pipeline.pca import power_iteration_top_pc, remove_top_pc
from cminer_spark.pipeline.textstats import (
    bigram_logprob,
    gopher_quality_filters,
    unigram_logprob,
    doc_fingerprint,
    language_id,
    quality_stats,
    repetition_stats,
    token_counts,
)

__all__ = [
    "classify_corpus",
    "band_corpus",
    "dedup_against",
    "lsh_candidates_against",
    "evaluate_predictions",
    "score_naive_bayes",
    "train_naive_bayes",
    "bigram_logprob",
    "power_iteration_top_pc",
    "remove_top_pc",
    "dedup_clusters",
    "exact_duplicates",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash",
    "verified_duplicate_pairs",
    "brute_force_cosine_topk",
    "cosine_near_duplicates",
    "embedding_dedup_clusters",
    "embedding_overflow_buckets",
    "ivf_topk",
    "ivf_train_centroids",
    "lsh_bucketed_topk",
    "pseudo_random_centroids",
    "doc_fingerprint",
    "language_id",
    "quality_stats",
    "unigram_logprob",
    "repetition_stats",
    "token_counts",
    "bm25_search",
    "tfidf_top_terms",
    "split_hash",
    "deterministic_split",
    "quota_sample",
    "decontaminate",
    "gopher_quality_filters",
    "chunk_documents",
    "build_training_pairs",
    "conversation_stats",
    "filter_conversations",
    "tool_transitions",
    "kmeans",
    "importance_weights",
    "train_bpe",
    "segment_words",
    "bpe_token_counts",
    "line_dedup",
    "duplicate_spans",
    "span_dup_stats",
    "strip_duplicate_spans",
    "normalize_text",
    "PII_PATTERNS",
    "redact_pii",
    "quantize_embeddings",
    "dequantize_embeddings",
    "random_projection",
]
