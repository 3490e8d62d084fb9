"""Reciprocal Rank Fusion of N ranked result lists.

Spark-first re-expression of the reference's RRF accumulation loop
(main/core/documents_collection_searcher.py:46-65): for each index's
ranked list, ``score[id] += 1 / (rrf_k + rank + 1)`` with rrf_k = 60 by
default, then sort descending and truncate.

Here each ranked list is a DataFrame; ranks are assigned with a window
ordered by that list's own score semantics (the caller passes the sort
order), the lists are unioned, and one groupBy-sum produces the fused
score. Ranks are 0-based to match the reference's ``enumerate``.

Ties: fused score descending, then id ascending — a documented total
order (SURVEY §7.4).

Scale notes: each input list is already top-k (small); the union +
groupBy of N·k rows is trivially cheap at any corpus scale. The window
runs over an already-limited list, so the single-partition window is
bounded by k, not by corpus size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RRF_K = 60


def with_rank(
    ranked: DataFrame, order_cols: list, id_col: str = "doc_id"
) -> DataFrame:
    """Attach a 0-based ``rank`` column by this list's own ordering."""
    w = Window.orderBy(*order_cols)
    return ranked.select(
        F.col(id_col), (F.row_number().over(w) - 1).alias("rank")
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int,
    rrf_k: int = DEFAULT_RRF_K,
    id_col: str = "doc_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Fuse lists of ``(id, rank)`` rows → top-k ``(id, rrf_score)``.

    Single-list input short-circuits to the list itself re-scored (the
    reference skips RRF entirely for one index,
    documents_collection_searcher.py:31-34 — scoring it anyway keeps the
    output schema uniform without changing order).
    """
    contribs = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank") + 1)).alias("contrib"),
        )
        for df in ranked_lists
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = unioned.groupBy(id_col).agg(F.sum("contrib").alias("_score"))
    score = (
        F.round(F.col("_score"), round_to) if round_to is not None else F.col("_score")
    )
    return (
        fused.select(F.col(id_col), score.alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
