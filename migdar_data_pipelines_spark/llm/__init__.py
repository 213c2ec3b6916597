"""LLM-training-data pipeline operators (SURVEY.md §7.1 layer 7).

Natural generalizations of the reference's fuzzy-matching/text operators
(X2/X3) to the operations a 100 TB training-data pipeline needs: exact and
near deduplication, similarity search over embeddings, text analysis, and
multimodal (binary) column plumbing.

Everything is expressed with built-in column functions where possible —
shingling, MinHash, SimHash and cosine similarity are all pure expressions
here (md5-based hashing keeps them deterministic and portable to the SQL
oracle); only multimodal decode uses mapInPandas, because that is genuinely
per-batch imperative work.
"""

from .textanalysis import (  # noqa: F401
    GOPHER_REP_THRESHOLDS,
    token_stats,
    quality_score,
    language_id,
    doc_fingerprint,
    gopher_repetition,
    gopher_repetition_sql,
    gopher_rules,
    unigram_lm_scores,
    bigram_lm_scores,
    bigram_lm_sql,
)
from .dedup import (  # noqa: F401
    canonical_groups,
    connected_components,
    exact_dedup,
    shingles,
    minhash_signature,
    minhash_lsh_pairs,
    incremental_dedup,
    simhash,
    simhash_fast,
    simhash_near_dup,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_blocked_kernel,
    ngram_jaccard_pairs_ppjoin,
    embedding_near_dup,
    embedding_near_dup_matmul,
    duplicated_spans,
    positional_shingles,
    winnow_fingerprints,
    winnow_sql,
)
from .similarity import (  # noqa: F401
    cosine_topk,
    cosine_topk_blocked,
    dequantize_expr,
    ivf_build_and_search,
    ivf_topk,
    knn_graph,
    margin_mining,
    mutual_knn_clusters,
    quantize_int8,
    search_ivf_index,
    train_ivf_centroids,
    write_ivf_index,
)
from .curation import (  # noqa: F401
    chunk_text,
    decontaminate,
    deterministic_sample,
    md5_bucket,
    mix_sources,
    pack_sequences,
    pii_counts,
    redact_pii,
    repetition_stats,
    train_val_split,
)
from .dsir import dsir_log_weights, dsir_sample, dsir_sql  # noqa: F401
from .multimodal import binary_features, decode_stub  # noqa: F401
from .pipeline import curate_corpus, curation_stage_frames  # noqa: F401
from .retrieval import bm25_topk, bm25_topk_df, bm25_sql, hybrid_rrf  # noqa: F401
from .clustering import kmeans_fit, kmeans_sql, quantize_vectors  # noqa: F401
from .linalg import pca_project, second_moments_q, second_moments_sql  # noqa: F401
