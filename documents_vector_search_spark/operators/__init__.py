"""DataFrame-native operators: the engine's query surface.

Search core (reference parity, SURVEY §2.5):
    knn (Q1/Q2), bm25 (Q3/E4), rrf (Q4), group_hits (Q5/Q6), fetch (Q7)
Build side (SURVEY §2.3/§2.4):
    chunking (T1/T2/T4), embedding (E1)
Training-data pipeline (north-star additions):
    dedup, cc, ann, text_analysis, multimodal, sketches, sampling
"""

from documents_vector_search_spark.operators.cc import (
    cluster_canonicalize,
    connected_components,
)
from documents_vector_search_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_hash_sample,
)
from documents_vector_search_spark.operators.sketches import kmv_distinct

from documents_vector_search_spark.operators.bm25 import (
    bm25_topk,
    build_doc_stats,
    build_postings,
)
from documents_vector_search_spark.operators.chunking import (
    assign_chunk_ids,
    fixed_window_chunks,
)
from documents_vector_search_spark.operators.dedup import (
    dedup_filter,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from documents_vector_search_spark.operators.dedup_pipeline import (
    NearDupPipeline,
)
from documents_vector_search_spark.operators.export import (
    assign_shards,
    write_training_shards,
)
from documents_vector_search_spark.operators.ivf import fit_ivf
from documents_vector_search_spark.operators.pq import (
    fit_pq,
    pq_adc_topk,
    pq_encode_expr,
)
from documents_vector_search_spark.operators.recursive_split import (
    recursive_character_chunks,
    split_text_recursive,
)
from documents_vector_search_spark.operators.shingles import shingle_rows
from documents_vector_search_spark.operators.similarity_join import (
    knn_join_exact,
    knn_join_lsh,
)
from documents_vector_search_spark.operators.cdc import (
    apply_changeset,
    scd2_apply,
    scd2_as_of,
    snapshot_diff,
)
from documents_vector_search_spark.operators.graph import (
    graph_profile,
    pagerank,
    personalized_pagerank,
)
from documents_vector_search_spark.operators.paths import (
    attribution,
    attribution_multitouch,
    rfm_segments,
    rfm_segments_approx,
)
from documents_vector_search_spark.operators.funnel import (
    funnel_report,
    funnel_stage_times,
    funnel_windowed,
)
from documents_vector_search_spark.operators.timeseries import (
    cusum_changepoints,
    resample_daily,
    rolling_zscore,
)
from documents_vector_search_spark.operators.cooccurrence import (
    association_rules,
    item_cooccurrence,
)
from documents_vector_search_spark.operators.sessions import (
    session_metrics,
    sessionize,
)
from documents_vector_search_spark.operators.retention import (
    cohort_retention,
    survival_curve,
)
from documents_vector_search_spark.operators.profiling import (
    fk_check,
    host_profile,
    skew_report,
    table_profile,
)
from documents_vector_search_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from documents_vector_search_spark.operators.fetch import fetch_lines
from documents_vector_search_spark.operators.group_hits import group_hits_by_document
from documents_vector_search_spark.operators.knn import (
    knn_cosine,
    knn_l2,
    knn_l2_numpy,
)
from documents_vector_search_spark.operators.rrf import rrf_fuse, with_rank
from documents_vector_search_spark.operators.ann import (
    ann_knn_l2,
    ann_knn_l2_bucketed,
    ensure_bucket_layout,
    write_bucket_partitioned,
)
from documents_vector_search_spark.operators.text_analysis import (
    fingerprint,
    language_id,
    quality_score,
    token_counts,
)
from documents_vector_search_spark.operators.asof import asof_join
from documents_vector_search_spark.operators.curation import (
    curation_sweep,
    fit_unigram_lm,
    line_dedup,
    pack_sequences,
    perplexity_score,
    pii_redact,
    repetition_signals,
    vocab_stats,
)

__all__ = [
    "cluster_canonicalize",
    "connected_components",
    "hash_sample",
    "hash_split",
    "stratified_hash_sample",
    "kmv_distinct",
    "dedup_filter",
    "fit_ivf",
    "fit_pq",
    "pq_adc_topk",
    "pq_encode_expr",
    "recursive_character_chunks",
    "split_text_recursive",
    "shingle_rows",
    "knn_join_exact",
    "knn_join_lsh",
    "salted_aggregate",
    "knn_l2_numpy",
    "bm25_topk",
    "build_doc_stats",
    "build_postings",
    "assign_chunk_ids",
    "fixed_window_chunks",
    "embedding_neardup_pairs",
    "exact_dedup",
    "minhash_lsh_pairs",
    "NearDupPipeline",
    "assign_shards",
    "write_training_shards",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "fetch_lines",
    "group_hits_by_document",
    "knn_cosine",
    "knn_l2",
    "rrf_fuse",
    "with_rank",
    "ann_knn_l2",
    "ann_knn_l2_bucketed",
    "ensure_bucket_layout",
    "write_bucket_partitioned",
    "fingerprint",
    "language_id",
    "quality_score",
    "token_counts",
    "asof_join",
    "curation_sweep",
    "fit_unigram_lm",
    "line_dedup",
    "pack_sequences",
    "perplexity_score",
    "pii_redact",
    "repetition_signals",
    "vocab_stats",
    "snapshot_diff",
    "apply_changeset",
    "scd2_apply",
    "scd2_as_of",
    "pagerank",
    "personalized_pagerank",
    "graph_profile",
    "attribution",
    "attribution_multitouch",
    "rfm_segments",
    "rfm_segments_approx",
    "host_profile",
    "skew_report",
    "table_profile",
    "fk_check",
    "cohort_retention",
    "survival_curve",
    "sessionize",
    "session_metrics",
    "association_rules",
    "item_cooccurrence",
    "cusum_changepoints",
    "resample_daily",
    "rolling_zscore",
    "funnel_report",
    "funnel_stage_times",
    "funnel_windowed",
    "salted_join",
]
