"""Streaming intake gate: curate the firehose BEFORE it is indexed.

A continuously-ingesting training-data pipeline should drop junk at the
door, not carry it to a nightly batch sweep: low-quality documents,
eval-contaminated documents, and duplicates all cost chunk/embed/index
work (and index deletes) if admitted first. ``curate_stream`` composes
the engine's curation signals into one MAP-ONLY streaming gate — no
stateful aggregation except the optional bounded-state dedup — so it
runs inside any `readStream → foreachBatch(update_collection)` pipeline
(streaming/incremental.py) unchanged.

Design constraints the batch operators don't have:
- No per-document re-aggregation: contamination here is an
  ``arrays_overlap`` against the benchmark grams inlined as a plan
  literal — streaming-safe, zero state, one pass. Suited to eval-set
  gram lists (thousands to ~100k entries; pass md5-hashed grams via
  ``operators/decontamination.benchmark_ngrams(hash_grams=True)`` and
  ``hash_grams=True`` here to shrink big sets 4-8×). The full counted
  report stays a batch job (operators/decontamination.py).
- Quality uses the SAME expression as the batch profile
  (operators/text_analysis.quality_expr) so gate and profile can never
  disagree on a document.
- Dedup delegates to streaming/dedup.py (dropDuplicatesWithinWatermark
  — bounded state).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.text import tokenize, word_shingles
from documents_vector_search_spark.operators.text_analysis import quality_expr


def curate_stream(
    docs: DataFrame,
    min_quality: float | None = 0.3,
    benchmark_grams: Sequence[str] | Sequence[int] | None = None,
    n: int = 5,
    hash_grams: bool = False,
    dedup_watermark: str | None = None,
    text_col: str = "text",
    ts_col: str = "last_modified_at",
) -> DataFrame:
    """Filter a STREAMING canonical-document frame down to admissible
    rows; adds a ``quality`` column, drops everything below
    ``min_quality``, everything sharing an ``n``-gram with
    ``benchmark_grams``, and (with ``dedup_watermark``) exact
    duplicates within the watermark horizon."""
    if not docs.isStreaming:
        raise ValueError(
            "curate_stream expects a streaming DataFrame; compose the "
            "batch operators (text_analysis / decontamination / dedup) "
            "for static corpora"
        )
    staged = docs.withColumn("_toks", tokenize(text_col))
    out = staged.withColumn(
        "quality", quality_expr(F.col("_toks"), text_col)
    )
    if min_quality is not None:
        out = out.filter(F.col("quality") >= F.lit(float(min_quality)))
    if benchmark_grams:
        grams = F.array_distinct(word_shingles(F.col("_toks"), n))
        if hash_grams:
            from documents_vector_search_spark.functions.hashing import (
                md5_hash64,
            )

            grams = F.transform(grams, lambda g: md5_hash64(g))
            bench = F.array(*[F.lit(int(g)) for g in benchmark_grams])
        else:
            bench = F.array(*[F.lit(str(g)) for g in benchmark_grams])
        out = out.filter(~F.arrays_overlap(grams, bench))
    out = out.drop("_toks")
    if dedup_watermark is not None:
        from documents_vector_search_spark.streaming.dedup import dedup_stream

        out = dedup_stream(
            out, text_col=text_col, ts_col=ts_col,
            watermark_delay=dedup_watermark,
        )
    return out
