"""Group ranked chunk hits by document, preserving first-hit order.

Spark-first re-expression of the reference's result builder
(main/core/documents_collection_searcher.py:67-111): walk the fused
chunk ranking in order; the first chunk of a document determines the
document's rank; later chunks of the same document append to its
``matchedChunks``; finally truncate to max_documents
(documents_collection_searcher.py:37-38 — SURVEY §2.5 Q5/Q6).

As a DataFrame op: groupBy(document) with ``min(rank)`` for the
document's position and ``sort_array(collect_list(...))`` for its chunks
in rank order, then orderBy + limit. The input is an already-top-k chunk
list (bounded), so the groupBy is over ≤ k rows regardless of corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_hits_by_document(
    chunk_hits: DataFrame,
    max_documents: int | None = None,
    doc_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    rank_col: str = "rank",
    score_col: str = "score",
    offset: int = 0,
) -> DataFrame:
    """``(doc, doc_rank, matched_chunks[], best_score, n_chunks)``.

    ``doc_rank`` is the rank of the document's best chunk — documents
    order exactly as their first appearance in the fused chunk ranking.
    ``matched_chunks`` lists the document's hit chunk ids in rank order.

    ``offset`` skips the first N documents of the grouped ordering —
    result pagination (page p = offset p*max_documents). Selected via
    a row_number filter, not a bare limit, so Catalyst can never prune
    the ordering out from under the page slice; deterministic because
    the (doc_rank, doc) order is a total order.
    """
    grouped = chunk_hits.groupBy(F.col(doc_col)).agg(
        F.min(F.col(rank_col)).alias("doc_rank"),
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col(rank_col), F.col(chunk_col)))
            ),
            lambda s: s[chunk_col],
        ).alias("matched_chunks"),
        F.max(F.col(score_col)).alias("best_score"),
        F.count("*").alias("n_chunks"),
    )
    if offset:
        from pyspark.sql import Window

        w = Window.orderBy(F.col("doc_rank").asc(), F.col(doc_col).asc())
        out = (
            grouped.withColumn("_pos", F.row_number().over(w))
            .filter(F.col("_pos") > offset)
            .drop("_pos")
            .orderBy(F.col("doc_rank").asc(), F.col(doc_col).asc())
        )
    else:
        out = grouped.orderBy(F.col("doc_rank").asc(), F.col(doc_col).asc())
    if max_documents is not None:
        out = out.limit(max_documents)
    return out
