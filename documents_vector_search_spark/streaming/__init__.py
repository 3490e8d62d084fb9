"""Streaming / incremental-update layer (SURVEY §2.6 U1-U4)."""

from documents_vector_search_spark.streaming.curation import curate_stream
from documents_vector_search_spark.streaming.dedup import dedup_stream
from documents_vector_search_spark.streaming.neardup import NearDupGate
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
    "incremental_dataset_update",
    "incremental_files_update",
    "run_streaming_update",
    "watermark_cql",
    "watermark_jql",
    "watermark_start_time",
]
