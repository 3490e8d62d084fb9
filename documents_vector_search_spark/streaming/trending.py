"""Trending terms over a document stream: watermarked windowed counts.

The query-analytics companion to the search stack: what terms are
spiking in the ingest stream (or in a search-query log) right now.
Built entirely from native Structured Streaming operators — event-time
tumbling/sliding windows with a watermark for late data; no custom
state.

Pattern (the standard two-stage shape for streaming top-k):
1. ``trending_terms_stream`` — the UNBOUNDED part runs in the stream:
   explode tokens, window by event time, count. Append mode emits a
   window's counts exactly once, when the watermark closes it.
2. ``top_terms_per_window`` — the top-k is a BATCH operation over the
   emitted (finalized) windows: rank within window, keep k. Run it in
   ``foreachBatch`` or over the sink table. A rank inside the stream
   itself is unsupported in append mode by design — a window's top-k
   is only defined once the window is complete.

Scale notes (100 TB/day streams):
- State is one count per (window, term) — vocabulary-sized per window,
  evicted by the watermark when the window finalizes.
- The explode + partial count happen map-side per micro-batch; the
  state-store shuffle carries (window, term) partials only.
- Sliding windows multiply state by window/slide — choose slide
  accordingly; the default is tumbling (slide = window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.text import tokenize


def trending_terms_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    min_count: int = 1,
) -> DataFrame:
    """Streaming ``(window, term, n)`` counts — append-emitted when the
    watermark closes each window. ``min_count`` drops singleton noise
    before it ever reaches the sink."""
    tokens = (
        docs.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.explode_outer(tokenize(text_col)).alias("term"),
        )
        .filter(F.col("term").isNotNull())
    )
    counts = tokens.groupBy(
        F.window(ts_col, window_duration, slide or window_duration),
        "term",
    ).agg(F.count("*").alias("n"))
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    return counts


def top_terms_per_window(counts: DataFrame, k: int = 10) -> DataFrame:
    """Batch top-k over finalized window counts —
    ``(window_start, window_end, term, n, rank)``, rank 1-based,
    deterministic ties (count desc, term asc). Run in foreachBatch or
    over the sink table; the per-window candidate set is
    vocabulary-sized, so the window rank is bounded work."""
    w = Window.partitionBy("window").orderBy(
        F.col("n").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "term",
            "n",
            "rank",
        )
    )
