"""Maximal Marginal Relevance (MMR) diversified re-ranking.

Carbonell & Goldstein, "The Use of MMR, Diversity-Based Reranking for
Reordering Documents and Producing Summaries", SIGIR 1998 — public.
Given a retrieved shortlist with relevance scores, MMR greedily builds
a result list that trades relevance against redundancy:

    next = argmax_{c not selected} [ λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) ]

The reference engine returns raw similarity order only
(main/indexes/indexers/faiss_indexer.py); MMR is the standard
diversification layer retrieval stacks put on top, and the natural
companion to the RRF fusion step (operators/rrf.py).

Scale shape — deliberately a BOUNDED-INPUT operator: the greedy
selection is inherently sequential (each pick depends on all previous
picks), so it cannot be data-parallel. The right decomposition at
100 TB is retrieve-then-rerank: the RETRIEVER scans the corpus
distributed (knn/ANN/BM25 top-N, N ≲ a few hundred), and MMR re-ranks
only that shortlist — here in ONE Arrow batch on one partition
(``coalesce(1).mapInPandas``), keeping the operator a
DataFrame→DataFrame transform with no driver collect. Feeding an
unbounded corpus to this operator is a contract violation, same as
similarity_join.knn_join_exact's documented bounded-only cross.

Determinism / oracle parity: relevance and pairwise cosines round to
``round_to`` BEFORE the objective, the objective rounds again before
comparison, ties break on ascending id, and dot products fold
sequentially (functions/vectors.seq_fold_sum) — so the selection is
bit-reproducible by the DuckDB recursive-CTE oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from documents_vector_search_spark.functions.vectors import (
    round_half_up,
    seq_fold_sum,
)


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    score_col: str = "score",
    round_to: int = 6,
) -> DataFrame:
    """Greedy MMR over a bounded scored shortlist —
    ``(id, rank, mmr_score)`` with rank 1..k in selection order.

    The first pick maximizes ``round(λ·rel, 6)`` (empty selection ⇒
    zero redundancy penalty); later picks subtract ``(1−λ)`` times the
    max rounded cosine to any already-selected candidate. ``lam=1``
    degenerates to pure relevance order, ``lam=0`` to pure diversity.
    """
    import numpy as np

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    id_type = candidates.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("rank", IntegerType()),
            StructField("mmr_score", DoubleType()),
        ]
    )

    def rerank(batches):
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if len(pdf) == 0:
            return
        yield _mmr_greedy(pdf, k, lam, id_col, vector_col, score_col, round_to)

    return (
        candidates.select(id_col, score_col, vector_col)
        .coalesce(1)
        .mapInPandas(rerank, out_schema)
    )


def _mmr_greedy(
    pdf: pd.DataFrame,
    k: int,
    lam: float,
    id_col: str,
    vector_col: str,
    score_col: str,
    round_to: int,
) -> pd.DataFrame:
    """The sequential greedy over ONE pool as a pandas→pandas transform
    — shared verbatim by the single-pool and per-group (batched)
    operators, so batch == per-query parity holds by construction."""
    import numpy as np

    one_minus = 1.0 - lam
    pdf = pdf.sort_values(id_col, ignore_index=True)
    ids = pdf[id_col].to_numpy()
    rel = round_half_up(pdf[score_col].to_numpy(dtype=np.float64), round_to)
    V = np.array(pdf[vector_col].tolist(), dtype=np.float64)
    norms = np.sqrt(seq_fold_sum(V * V))
    n = len(ids)
    # pairwise rounded cosines, sequential-fold dots (0 when a
    # norm is 0 — mirrors functions/vectors.cosine_similarity)
    dots = np.empty((n, n), dtype=np.float64)
    for i in range(n):
        dots[i] = seq_fold_sum(V[i][None, :] * V)
    denom = norms[:, None] * norms[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = np.where(denom == 0, 0.0, dots / denom)
    sims = round_half_up(sims, round_to)

    selected: list[int] = []
    remaining = np.ones(n, dtype=bool)
    out_ids, out_scores = [], []
    for _ in range(min(k, n)):
        if selected:
            penalty = sims[:, selected].max(axis=1)
        else:
            penalty = np.zeros(n)
        mmr = round_half_up(lam * rel - one_minus * penalty, round_to)
        mmr_masked = np.where(remaining, mmr, -np.inf)
        # argmax takes the FIRST max; ids are ascending, so ties
        # break on the smallest id (the SQL twin's ORDER BY)
        pick = int(np.argmax(mmr_masked))
        selected.append(pick)
        remaining[pick] = False
        out_ids.append(ids[pick])
        out_scores.append(float(mmr[pick]))
    return pd.DataFrame(
        {
            id_col: out_ids,
            "rank": np.arange(1, len(out_ids) + 1, dtype="int32"),
            "mmr_score": out_scores,
        }
    )


def mmr_rerank_grouped(
    candidates: DataFrame,
    k: int,
    lam: float = 0.7,
    group_col: str = "qid",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    score_col: str = "score",
    round_to: int = 6,
) -> DataFrame:
    """Greedy MMR per GROUP over bounded scored shortlists —
    ``(group, id, rank, mmr_score)``; each group re-ranks with exactly
    :func:`mmr_rerank`'s greedy (shared ``_mmr_greedy``), so a batch of
    Q pools costs one qid-keyed shuffle of Q·pool rows and Q
    Arrow-batched reranks that run in parallel across executors —
    instead of Q separate jobs. The batch-serving companion to
    ``searcher.search_chunks_diverse``."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    out_schema = StructType(
        [
            StructField(group_col, candidates.schema[group_col].dataType),
            StructField(id_col, candidates.schema[id_col].dataType),
            StructField("rank", IntegerType()),
            StructField("mmr_score", DoubleType()),
        ]
    )

    def apply(key, pdf):
        # groupBy only materializes non-empty groups
        res = _mmr_greedy(pdf, k, lam, id_col, vector_col, score_col, round_to)
        res.insert(0, group_col, key[0])
        return res

    return (
        candidates.select(group_col, id_col, score_col, vector_col)
        .groupBy(group_col)
        .applyInPandas(apply, out_schema)
    )
