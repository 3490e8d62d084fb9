"""Late-interaction (MaxSim) scoring over multi-vector documents.

ColBERT-style retrieval (Khattab & Zaharia, "ColBERT: Efficient and
Effective Passage Search via Contextualized Late Interaction over
BERT", SIGIR 2020 — public) represents a document as MANY vectors (one
per token/chunk) and scores it against a multi-vector query as

    score(doc) = Σ_q  max_{v ∈ doc}  sim(q, v)

— each query vector picks its best-matching document vector, and the
per-query maxima add up. The reference engine is single-vector-only
(FAISS flat / Chroma, main/indexes/indexers/faiss_indexer.py); this
operator adds the multi-vector tier a modern retrieval stack layers on
top, re-expressed as ONE aggregation:

Spark shape (100 TB):
- The Q query vectors enter as literal arrays (map-side cosine
  columns; no join, no UDF, stays in codegen).
- ONE scan of the (group, vector) table computes Q rounded cosines per
  row; ``groupBy(group).agg(max, ...)`` runs partial (map-side) max
  aggregation, so the single shuffle carries Q doubles per group —
  independent of how many vectors a document has.
- Final top-k is ``orderBy().limit(k)`` → TakeOrderedAndProject (each
  partition keeps k candidates; no global sort).

Cosines are rounded BEFORE the max and the summed score is rounded
again, so the (score, group) total order is engine-reproducible (the
round-before-order rule every scorer here follows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.vectors import (
    cosine_similarity,
    lit_double_array,
)


def maxsim_scores(
    vectors: DataFrame,
    queries: dict[str, Sequence[float]],
    k: int,
    group_col: str = "doc_id",
    vector_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Top-k groups by late-interaction MaxSim: ``(group, score)``
    descending, ties on the group id ascending.

    ``queries`` maps query-vector ids to vectors (e.g. one per query
    token). A group with NO vectors simply never appears (it has no
    rows); a query vector orthogonal to everything contributes that
    group's max rounded cosine, which may be negative — exactly the
    ColBERT sum, no clamping.
    """
    if not queries:
        raise ValueError("queries must not be empty")
    # internal columns are aliased by POSITION over sorted(queries), not by
    # the caller's qid string — a qid containing '.', '`', or spaces would
    # otherwise parse as a nested-field path when re-referenced
    qids = sorted(queries)
    vec = F.col(vector_col).cast("array<double>")
    scored = vectors.select(
        F.col(group_col),
        *[
            F.round(
                cosine_similarity(vec, lit_double_array(queries[qid])),
                round_to,
            ).alias(f"_c_{i}")
            for i, qid in enumerate(qids)
        ],
    )
    agg = scored.groupBy(group_col).agg(
        *[F.max(f"_c_{i}").alias(f"_m_{i}") for i in range(len(qids))]
    )
    total = F.col("_m_0")
    for i in range(1, len(qids)):
        total = total + F.col(f"_m_{i}")
    return (
        agg.select(
            F.col(group_col), F.round(total, round_to).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(group_col).asc())
        .limit(k)
    )
