"""Large-scale training-data pipeline operators (SURVEY.md §7.1 step 9).

Beyond the reference's PromQL surface: the operations a 100 TB training-data
pipeline needs over ``documents(doc_id, text, lang, source, n_chars)`` and
``embeddings(vec_id, embedding array<float>, label)`` — deduplication,
similarity search, text analysis, multimodal column plumbing.

Design rules:
- JVM-side built-ins only in hot paths (md5/regexp/HOFs) — no row-Python;
- every op is shuffle-minimal: hash-partition once on the dedup/bucket key;
- deterministic (md5-derived hashes, fixed seeds) so the DuckDB oracle can
  replay results bit-for-bit.
"""

from prometheus_parquet_server_spark.pipeline.text import (
    tokens_col,
    token_count,
    quality_features,
    language_id,
    fingerprint,
    repetition_metrics,
)
from prometheus_parquet_server_spark.pipeline.scrub import (
    PII_PATTERNS,
    pii_counts,
    scrub_pii,
)
from prometheus_parquet_server_spark.pipeline.sample import (
    capped_sample,
    mixture_sample,
    stratified_sample,
    token_budget_sample,
)
from prometheus_parquet_server_spark.pipeline.stats import (
    bm25_topk,
    corpus_stats,
    tfidf_topk,
    token_stats,
    vocab_topk,
)
from prometheus_parquet_server_spark.pipeline.bpe import (
    bpe_encode,
    train_bpe,
)
from prometheus_parquet_server_spark.pipeline.classifier import (
    rule_label,
    score_quality,
    train_quality_classifier,
)
from prometheus_parquet_server_spark.pipeline.pca import (
    embedding_pca,
    pca_components,
    pca_project,
)
from prometheus_parquet_server_spark.pipeline.chunk import chunk_documents
from prometheus_parquet_server_spark.pipeline.lm_score import (
    bigram_model,
    curriculum_stages,
    perplexity_scores,
)
from prometheus_parquet_server_spark.pipeline.dedup import (
    exact_duplicates,
    minhash_signature,
    minhash_bands,
    lsh_duplicate_buckets,
    lsh_candidate_pairs,
    simhash,
    cross_doc_ngrams,
    ngram_jaccard_pairs,
)
from prometheus_parquet_server_spark.pipeline.sketch import (
    approx_vocab_size,
    approx_length_quantiles,
    heavy_hitter_grams,
    mg_fold,
)
from prometheus_parquet_server_spark.pipeline.similarity import (
    cosine_similarity_col,
    brute_force_topk,
    lsh_bucketed_topk,
)

__all__ = [
    "mixture_sample",
    "bm25_topk",
    "rule_label",
    "score_quality",
    "train_quality_classifier",
    "mg_fold",
    "train_bpe",
    "bpe_encode",
    "tokens_col",
    "token_count",
    "quality_features",
    "language_id",
    "fingerprint",
    "repetition_metrics",
    "PII_PATTERNS",
    "pii_counts",
    "scrub_pii",
    "capped_sample",
    "stratified_sample",
    "token_budget_sample",
    "corpus_stats",
    "tfidf_topk",
    "token_stats",
    "vocab_topk",
    "embedding_pca",
    "pca_components",
    "pca_project",
    "chunk_documents",
    "bigram_model",
    "curriculum_stages",
    "perplexity_scores",
    "exact_duplicates",
    "minhash_signature",
    "minhash_bands",
    "lsh_duplicate_buckets",
    "lsh_candidate_pairs",
    "simhash",
    "cross_doc_ngrams",
    "ngram_jaccard_pairs",
    "approx_vocab_size",
    "approx_length_quantiles",
    "heavy_hitter_grams",
    "cosine_similarity_col",
    "brute_force_topk",
    "lsh_bucketed_topk",
]
