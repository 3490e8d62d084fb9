"""Streaming exact deduplication — the streaming twin of
``operators/dedup.exact_dedup``.

A continuously-ingesting corpus (the reference's update loop, or a
crawler feed) needs dedup at ingest time, not as a nightly batch.
``dedup_stream`` keys every document by its content hash and keeps the
first arrival, using ``dropDuplicatesWithinWatermark`` so the dedup
state store holds only hashes younger than the watermark — bounded
state, unlike a plain ``dropDuplicates`` which would grow forever on
an unbounded stream.

Semantics vs the batch operator: batch ``exact_dedup`` is a global
first-wins over the whole corpus; the streaming form is first-wins
within the watermark horizon (duplicates farther apart than the delay
can both survive — that's the price of bounded state, and re-running
the batch operator over the accumulated table reconciles exactly).

Scale: state is one (hash) entry per distinct document within the
horizon, hash-partitioned across executors by the state store; the
stream itself shuffles once on content hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.hashing import md5_hash64


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "last_modified_at",
    watermark_delay: str = "10 minutes",
    hash_col: str = "content_hash",
) -> DataFrame:
    """First-arrival-wins streaming dedup by exact content hash.

    ``docs`` must be a streaming DataFrame with an event-time column
    ``ts_col``. Output = input columns + ``hash_col``, duplicates
    (same content hash within the watermark horizon) dropped.
    """
    if not docs.isStreaming:
        raise ValueError(
            "dedup_stream expects a streaming DataFrame; use "
            "operators.dedup.exact_dedup for batch corpora"
        )
    hashed = docs.withColumn(hash_col, md5_hash64(F.col(text_col)))
    return hashed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        [hash_col]
    )


def url_dedup_stream(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "last_modified_at",
    watermark_delay: str = "10 minutes",
    norm_col: str = "norm_url",
) -> DataFrame:
    """First-arrival-wins streaming dedup by NORMALIZED URL — the
    ingest-time form of ``operators/urls.url_dedup_report`` (a crawler
    feed re-discovers the same page under tracking-param and
    case variants continuously; dropping them at admission costs one
    map-only normalize plus the same bounded watermark state as
    :func:`dedup_stream`). Zero content comparison: this gate runs
    BEFORE fetch/parse in a real pipeline, which is exactly why
    URL-keyed dedup is the cheapest tier.

    Output = input columns + ``norm_col``; duplicates (same normal
    form within the watermark horizon) dropped.
    """
    from documents_vector_search_spark.operators.urls import url_normalize

    if not docs.isStreaming:
        raise ValueError(
            "url_dedup_stream expects a streaming DataFrame; use "
            "operators.urls.url_dedup_report for batch corpora"
        )
    normed = docs.withColumn(norm_col, url_normalize(F.col(url_col)))
    return normed.withWatermark(
        ts_col, watermark_delay
    ).dropDuplicatesWithinWatermark([norm_col])
