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
