"""Offline retrieval-quality metrics: nDCG@k, MRR@k, P@k, R@k, AP@k.

The evaluation harness a search/retrieval pipeline runs after every
index or ranking change — TREC-style metrics over (ranking, qrels),
computed as two joins and one aggregation per query, never a
per-query driver loop.

Inputs:
- ``ranking``: (qid, id, rank) with rank 1-based and dense per qid
  (any retrieval output; ties must already be broken — every ranker
  in this repo orders (score desc, id asc)).
- ``qrels``: (qid, id, rel) graded relevance, rel >= 1 means relevant.
  Pairs absent from qrels count as rel = 0.

Definitions (standard):
- DCG@k  = Σ_{rank<=k} (2^rel - 1) / log2(rank + 1)
- nDCG@k = DCG@k / IDCG@k (ideal = qrels sorted rel desc; 0 if no
  relevant documents)
- MRR@k  = 1 / (first relevant rank), 0 if none in top-k
- P@k    = |relevant in top-k| / k
- R@k    = |relevant in top-k| / |relevant|, 0 if |relevant| = 0
- AP@k   = Σ_{relevant hits at rank i<=k} P@i / min(|relevant|, k)

Scale notes (100 TB of rankings — e.g. evaluating a full query log):
- ranking←qrels is an equi-join on (qid, id); per-query aggregation
  shuffles on qid once. IDCG is a window over qrels (small per qid).
- Everything is Column algebra; the only per-rank state (cumulative
  precision for AP) is a window running sum ordered by rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "qid",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    round_to: int | None = 6,
) -> DataFrame:
    """One row per query: ``(qid, ndcg, mrr, precision, recall, ap)``.

    Queries present in ``ranking`` but with zero relevant documents
    report ndcg = recall = ap = 0.0 (the convention trec_eval uses
    when averaging); queries absent from ``ranking`` are absent here.
    """
    r = ranking.filter(F.col(rank_col) <= k).alias("r")
    q = qrels.alias("q")
    joined = r.join(
        q,
        (F.col(f"r.{query_col}") == F.col(f"q.{query_col}"))
        & (F.col(f"r.{id_col}") == F.col(f"q.{id_col}")),
        "left",
    ).select(
        F.col(f"r.{query_col}").alias(query_col),
        F.col(f"r.{rank_col}").alias(rank_col),
        F.coalesce(F.col(f"q.{rel_col}"), F.lit(0)).alias(rel_col),
    )
    rel = F.col(rel_col)
    rank = F.col(rank_col).cast("double")
    is_rel = (rel >= 1).cast("int")

    # cumulative precision at each rank (for AP), computed in rank order
    w_cum = (
        Window.partitionBy(query_col)
        .orderBy(rank_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_hit = joined.withColumn("_cum_rel", F.sum(is_rel).over(w_cum))

    dcg_term = (F.pow(F.lit(2.0), rel.cast("double")) - 1.0) / F.log2(rank + 1.0)
    ap_term = F.when(
        is_rel == 1, F.col("_cum_rel").cast("double") / rank
    ).otherwise(F.lit(0.0))
    mrr_term = F.when(is_rel == 1, 1.0 / rank).otherwise(F.lit(None))

    agg = per_hit.groupBy(query_col).agg(
        F.sum(dcg_term).alias("_dcg"),
        F.max(mrr_term).alias("_mrr"),
        F.sum(is_rel).alias("_hits"),
        F.sum(ap_term).alias("_ap_sum"),
    )

    # ideal DCG + total relevant, from qrels alone
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col).asc()
    )
    ideal = (
        qrels.filter(F.col(rel_col) >= 1)
        .withColumn("_irank", F.row_number().over(w_ideal))
        .groupBy(query_col)
        .agg(
            F.sum(
                F.when(
                    F.col("_irank") <= k,
                    (F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - 1.0)
                    / F.log2(F.col("_irank").cast("double") + 1.0),
                ).otherwise(F.lit(0.0))
            ).alias("_idcg"),
            F.count("*").alias("_n_rel"),
        )
    )

    out = agg.join(ideal, query_col, "left")
    rnd = (lambda c: F.round(c, round_to)) if round_to is not None else (lambda c: c)
    return out.select(
        query_col,
        rnd(
            F.when(
                F.coalesce(F.col("_idcg"), F.lit(0.0)) > 0,
                F.col("_dcg") / F.col("_idcg"),
            ).otherwise(F.lit(0.0))
        ).alias("ndcg"),
        rnd(F.coalesce(F.col("_mrr"), F.lit(0.0))).alias("mrr"),
        rnd(F.col("_hits").cast("double") / F.lit(float(k))).alias("precision"),
        rnd(
            F.when(
                F.coalesce(F.col("_n_rel"), F.lit(0)) > 0,
                F.col("_hits").cast("double") / F.col("_n_rel").cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("recall"),
        rnd(
            F.when(
                F.coalesce(F.col("_n_rel"), F.lit(0)) > 0,
                F.col("_ap_sum")
                / F.least(F.col("_n_rel"), F.lit(k)).cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("ap"),
    )
