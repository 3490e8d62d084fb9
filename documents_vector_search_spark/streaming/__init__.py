"""Streaming / incremental-update layer (SURVEY §2.6 U1-U4)."""

from documents_vector_search_spark.streaming.curation import curate_stream
from documents_vector_search_spark.streaming.dedup import dedup_stream
from documents_vector_search_spark.streaming.neardup import NearDupGate
from documents_vector_search_spark.streaming.stateful import (
    anomaly_stream,
    cusum_stream,
    funnel_stream,
    sessionize_stream,
    transitions_stream,
)
from documents_vector_search_spark.streaming.incremental import (
    OVERLAP_MINUTES,
    incremental_dataset_update,
    incremental_files_update,
    run_streaming_update,
    watermark_cql,
    watermark_jql,
    watermark_start_time,
)

__all__ = [
    "OVERLAP_MINUTES",
    "curate_stream",
    "dedup_stream",
    "NearDupGate",
    "anomaly_stream",
    "cusum_stream",
    "funnel_stream",
    "sessionize_stream",
    "transitions_stream",
    "incremental_dataset_update",
    "incremental_files_update",
    "run_streaming_update",
    "watermark_cql",
    "watermark_jql",
    "watermark_start_time",
]
