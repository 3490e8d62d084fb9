"""ranking_metrics against hand-computed TREC-style values."""

from __future__ import annotations

import math

import pytest

from documents_vector_search_spark.operators.ir_eval import ranking_metrics


def _rk(spark, rows):
    return spark.createDataFrame(rows, "qid string, doc_id bigint, rank int")


def _qr(spark, rows):
    return spark.createDataFrame(rows, "qid string, doc_id bigint, rel int")


class TestRankingMetrics:
    def test_hand_computed_binary_case(self, spark):
        ranking = _rk(spark, [("a", d, r) for r, d in enumerate([10, 2, 30, 4, 50], 1)])
        qrels = _qr(spark, [("a", 2, 1), ("a", 4, 1), ("a", 9, 1)])
        m = ranking_metrics(ranking, qrels, 5).collect()[0]
        dcg = 1 / math.log2(3) + 1 / math.log2(5)
        idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
        assert m["ndcg"] == round(dcg / idcg, 6)
        assert m["mrr"] == 0.5            # first relevant at rank 2
        assert m["precision"] == 0.4      # 2 of 5
        assert m["recall"] == round(2 / 3, 6)
        assert m["ap"] == round((1 / 2 + 2 / 4) / 3, 6)

    def test_graded_relevance_in_dcg(self, spark):
        # rel=2 contributes (2^2 - 1) = 3x a rel=1 hit
        ranking = _rk(spark, [("a", 1, 1), ("a", 2, 2)])
        qrels = _qr(spark, [("a", 1, 1), ("a", 2, 2)])
        m = ranking_metrics(ranking, qrels, 2).collect()[0]
        dcg = 1 / math.log2(2) + 3 / math.log2(3)
        idcg = 3 / math.log2(2) + 1 / math.log2(3)
        assert m["ndcg"] == round(dcg / idcg, 6)
        assert m["ndcg"] < 1.0  # the graded ideal puts rel=2 first

    def test_perfect_ranking_is_one(self, spark):
        ranking = _rk(spark, [("a", 1, 1), ("a", 2, 2)])
        qrels = _qr(spark, [("a", 1, 2), ("a", 2, 1)])
        m = ranking_metrics(ranking, qrels, 2).collect()[0]
        assert m["ndcg"] == 1.0 and m["mrr"] == 1.0 and m["ap"] == 1.0

    def test_no_relevant_documents_reports_zeros(self, spark):
        ranking = _rk(spark, [("a", 1, 1), ("a", 2, 2)])
        qrels = _qr(spark, [("b", 1, 1)])  # other query only
        m = ranking_metrics(ranking, qrels, 2).collect()
        byq = {r["qid"]: r for r in m}
        assert set(byq) == {"a"}  # queries come from the ranking side
        a = byq["a"]
        assert (a["ndcg"], a["mrr"], a["recall"], a["ap"]) == (0.0, 0.0, 0.0, 0.0)

    def test_relevant_beyond_k_counts_in_recall_denominator(self, spark):
        ranking = _rk(spark, [("a", 1, 1)])
        qrels = _qr(spark, [("a", 1, 1), ("a", 2, 1), ("a", 3, 1)])
        m = ranking_metrics(ranking, qrels, 1).collect()[0]
        assert m["recall"] == round(1 / 3, 6)
        # AP normalizes by min(n_rel, k) = 1 -> perfect here
        assert m["ap"] == 1.0

    def test_multiple_queries_independent(self, spark):
        ranking = _rk(spark, [("a", 1, 1), ("b", 1, 1), ("b", 2, 2)])
        qrels = _qr(spark, [("a", 1, 1), ("b", 2, 1)])
        byq = {
            r["qid"]: r for r in ranking_metrics(ranking, qrels, 5).collect()
        }
        assert byq["a"]["mrr"] == 1.0
        assert byq["b"]["mrr"] == 0.5
