"""Unit tests: snippets, facets, RM3 expansion, DSIR resampling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.bm25 import (
    bm25_topk,
    bm25_weighted_adhoc,
    matches_all_terms,
    rm3_expansion_weights,
    rm3_topk,
)
from documents_vector_search_spark.operators.dsir import (
    dsir_select,
    fit_dsir_log_ratios,
)
from documents_vector_search_spark.operators.facets import facet_counts
from documents_vector_search_spark.operators.snippets import best_line_snippet


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "hash join is the fastest join\nsort merge join fallback\nplain line", "en", "a"),
        (2, "nothing relevant here\nhash join hash join twice", "en", "a"),
        (3, "sort merge only\nno keywords", "fr", "b"),
        (4, "hash join once", "de", "b"),
        (5, "", "en", "b"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


class TestSnippets:
    def test_best_line_picks_max_occurrences(self, corpus):
        out = {
            r.doc_id: r
            for r in best_line_snippet(corpus, ["hash", "join"]).collect()
        }
        # doc 1 line 1 has 3 occurrences (hash, join, join), line 2 has 2
        assert out[1].line_no == 1 and out[1].n_hits == 3
        # doc 2: line 2 wins with 4 occurrences
        assert out[2].line_no == 2 and out[2].n_hits == 4
        assert out[2].snippet == "hash join hash join twice"

    def test_no_hit_doc_returns_first_line(self, corpus):
        out = {
            r.doc_id: r
            for r in best_line_snippet(corpus, ["zebra"]).collect()
        }
        assert out[3].line_no == 1 and out[3].n_hits == 0

    def test_tie_breaks_to_earliest_line(self, spark):
        df = spark.createDataFrame(
            [(1, "x hash y\nz hash w")], ["doc_id", "text"]
        )
        row = best_line_snippet(df, ["hash"]).collect()[0]
        assert row.line_no == 1

    def test_truncates_to_max_chars(self, spark):
        df = spark.createDataFrame(
            [(1, "hash " + "a" * 500)], ["doc_id", "text"]
        )
        row = best_line_snippet(df, ["hash"], max_chars=10).collect()[0]
        assert len(row.snippet) == 10

    def test_empty_terms_raises(self, corpus):
        with pytest.raises(ValueError):
            best_line_snippet(corpus, [])


class TestFacets:
    def test_counts_per_facet_value(self, corpus):
        matched = corpus.filter(matches_all_terms("text", ["hash", "join"]))
        out = {
            (r.facet, r.value): r.n_docs
            for r in facet_counts(matched, ["lang", "source"]).collect()
        }
        # docs 1, 2, 4 match conjunctively
        assert out[("lang", "en")] == 2
        assert out[("lang", "de")] == 1
        assert out[("source", "a")] == 2
        assert out[("source", "b")] == 1

    def test_matches_all_terms_is_conjunctive(self, corpus):
        ids = sorted(
            r.doc_id
            for r in corpus.filter(
                matches_all_terms("text", ["sort", "merge"])
            ).collect()
        )
        assert ids == [1, 3]

    def test_empty_facets_raises(self, corpus):
        with pytest.raises(ValueError):
            facet_counts(corpus, [])


class TestRM3:
    def test_weights_structure(self, corpus):
        w = dict(
            rm3_expansion_weights(
                corpus, "hash join", k_fb=3, n_expand=4, lam=0.5
            )
        )
        # original terms carry lam/|Q| each
        assert w["hash"] == pytest.approx(0.25)
        assert w["join"] == pytest.approx(0.25)
        # expansion terms exclude the originals and sum to (1 - lam)
        exp = {t: v for t, v in w.items() if t not in ("hash", "join")}
        assert exp and sum(exp.values()) == pytest.approx(0.5)

    def test_stopword_guard_excludes_common_terms(self, spark):
        # 'the' appears in every doc (df = N > N/2) and would dominate
        # the relevance model without the guard
        rows = [
            (i, f"the hash join topic{i % 2} the filler{i}") for i in range(8)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        w = dict(rm3_expansion_weights(df, "hash join", k_fb=4, n_expand=3))
        assert "the" not in w

    def test_rm3_topk_returns_expanded_ranking(self, corpus):
        out = rm3_topk(corpus, "hash join", 10, k_fb=2, n_expand=3).collect()
        assert out, "expanded search returned no rows"
        scores = [r.score for r in out]
        assert scores == sorted(scores, reverse=True)
        # disjunctive: doc 3 (sort/merge only) can now surface via
        # expansion terms mined from doc 1's feedback vector
        assert len(out) >= 3

    def test_weighted_adhoc_matches_plain_bm25_on_single_term(self, corpus):
        plain = bm25_topk(corpus, "hash", 10).collect()
        weighted = bm25_weighted_adhoc(corpus, [("hash", 1.0)], 10).collect()
        assert [r.doc_id for r in plain] == [r.doc_id for r in weighted]
        for p, w in zip(plain, weighted):
            assert w.score == pytest.approx(p.score, abs=2e-6)

    def test_deterministic(self, corpus):
        a = rm3_topk(corpus, "hash join", 10).collect()
        b = rm3_topk(corpus, "hash join", 10).collect()
        assert a == b


class TestDSIR:
    @pytest.fixture(scope="class")
    def pool(self, spark):
        # target half speaks about databases, raw half about weather —
        # disjoint vocab so importance weights separate cleanly
        rows = []
        for i in range(40):
            if i % 2 == 0:
                rows.append((i, "query planner index scan join optimizer", 1))
            else:
                rows.append((i, "rain cloud wind sunny storm forecast", 0))
        return spark.createDataFrame(rows, ["doc_id", "text", "is_t"])

    def test_fit_shape_and_rounding(self, pool):
        ratios = fit_dsir_log_ratios(pool, F.col("is_t") == 1)
        assert len(ratios) == 256
        for r in ratios:
            assert r == round(r, 7)

    def test_selection_enriches_target_like_docs(self, pool):
        ratios = fit_dsir_log_ratios(pool, F.col("is_t") == 1)
        picked = dsir_select(pool, ratios, 10).collect()
        # docs resembling the target distribution carry higher logw and
        # dominate the Gumbel draw
        target_like = sum(1 for r in picked if r.doc_id % 2 == 0)
        assert target_like >= 8
        # every target-like doc outweighs every raw-only doc
        logw = {r.doc_id: r.logw for r in dsir_select(pool, ratios, 40).collect()}
        assert min(
            v for k, v in logw.items() if k % 2 == 0
        ) > max(v for k, v in logw.items() if k % 2 == 1)

    def test_deterministic_and_k_bounded(self, pool):
        ratios = fit_dsir_log_ratios(pool, F.col("is_t") == 1)
        a = dsir_select(pool, ratios, 7).collect()
        b = dsir_select(pool, ratios, 7).collect()
        assert a == b and len(a) == 7

    def test_empty_docs_weigh_zero(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, "")], ["doc_id", "text"]
        )
        ratios = fit_dsir_log_ratios(df, F.col("doc_id") == 1)
        out = {r.doc_id: r.logw for r in dsir_select(df, ratios, 2).collect()}
        assert out[2] == 0.0
        assert math.isfinite(out[1])


class TestRM3ServingHelpers:
    def test_weights_from_feedback_pure(self):
        from documents_vector_search_spark.operators.bm25 import (
            rm3_weights_from_feedback,
        )

        fb = [(2.0, "hash join planner planner"), (1.0, "hash join rain")]
        w = dict(
            rm3_weights_from_feedback(
                fb, ["hash", "join"],
                df_lookup={"planner": 1, "rain": 1},
                n_docs=10, n_expand=2, lam=0.5,
            )
        )
        assert w["hash"] == pytest.approx(0.25)
        assert w["join"] == pytest.approx(0.25)
        # planner: tf 2/dl 4 in the heavier doc; rain: tf 1/dl 3 lighter
        assert w["planner"] > w["rain"]
        assert sum(v for t, v in w.items() if t not in ("hash", "join")) == (
            pytest.approx(0.5)
        )

    def test_weights_guard_drops_common_terms(self):
        from documents_vector_search_spark.operators.bm25 import (
            rm3_weights_from_feedback,
        )

        fb = [(1.0, "hash join common")]
        w = dict(
            rm3_weights_from_feedback(
                fb, ["hash"], df_lookup={"common": 8, "join": 2},
                n_docs=10, n_expand=4,
            )
        )
        assert "common" not in w and "join" in w

    def test_empty_feedback_keeps_query_weights(self):
        from documents_vector_search_spark.operators.bm25 import (
            rm3_weights_from_feedback,
        )

        w = rm3_weights_from_feedback([], ["hash", "join"], {}, 10)
        assert w == [("hash", pytest.approx(0.25)), ("join", pytest.approx(0.25))]

    def test_weighted_index_path_matches_adhoc_single_term(self, corpus):
        from documents_vector_search_spark.operators.bm25 import (
            bm25_weighted_topk,
            build_doc_stats,
            build_postings,
        )

        postings = build_postings(corpus, with_dl=True)
        stats = build_doc_stats(corpus)
        plain = bm25_topk(corpus, "hash", 10).collect()
        weighted = bm25_weighted_topk(
            [("hash", 1.0)], 10, postings,
            id_col="doc_id", doc_stats=stats,
        ).collect()
        assert [r.doc_id for r in plain] == [r.doc_id for r in weighted]
        for p, w in zip(plain, weighted):
            assert w.score == pytest.approx(p.score, abs=2e-6)


class TestDSIRFast:
    """xxhash64 fast family (dsir.py fast twin): same statistical
    behavior as the md5 family, an order of magnitude less hash work;
    deliberately not oracle-checkable (JVM-only hash)."""

    @pytest.fixture(scope="class")
    def pool(self, spark):
        rows = []
        for i in range(40):
            if i % 2 == 0:
                rows.append((i, "query planner index scan join optimizer", 1))
            else:
                rows.append((i, "rain cloud wind sunny storm forecast", 0))
        return spark.createDataFrame(rows, ["doc_id", "text", "is_t"])

    def test_fast_fit_layout_independent(self, pool):
        from documents_vector_search_spark.operators.dsir import (
            fit_dsir_log_ratios_fast,
        )

        a = fit_dsir_log_ratios_fast(pool, F.col("is_t") == 1)
        b = fit_dsir_log_ratios_fast(
            pool.repartition(7, "doc_id"), F.col("is_t") == 1
        )
        assert a == b and len(a) == 256

    def test_fast_selection_enriches_target(self, pool):
        from documents_vector_search_spark.operators.dsir import (
            dsir_select_fast,
            fit_dsir_log_ratios_fast,
        )

        ratios = fit_dsir_log_ratios_fast(pool, F.col("is_t") == 1)
        picked = dsir_select_fast(pool, ratios, 10).collect()
        assert sum(1 for r in picked if r.doc_id % 2 == 0) >= 8
        logw = {
            r.doc_id: r.logw
            for r in dsir_select_fast(pool, ratios, 40).collect()
        }
        assert min(
            v for k, v in logw.items() if k % 2 == 0
        ) > max(v for k, v in logw.items() if k % 2 == 1)

    def test_fast_deterministic(self, pool):
        from documents_vector_search_spark.operators.dsir import (
            dsir_select_fast,
            fit_dsir_log_ratios_fast,
        )

        ratios = fit_dsir_log_ratios_fast(pool, F.col("is_t") == 1)
        assert (
            dsir_select_fast(pool, ratios, 5).collect()
            == dsir_select_fast(pool, ratios, 5).collect()
        )


class TestRocchio:
    def test_pure_update_quantized(self):
        from documents_vector_search_spark.operators.rocchio import (
            rocchio_vector,
        )

        q1 = rocchio_vector(
            [1.0, 0.0], [[0.0, 1.0], [0.0, 0.5]], alpha=1.0, beta=0.8
        )
        # mean = [0, 0.75]; q1 = [1 + 0, 0 + 0.8*0.75]
        assert q1 == [1.0, 0.6]

    def test_empty_feedback_neutral(self):
        from documents_vector_search_spark.operators.rocchio import (
            rocchio_vector,
        )

        assert rocchio_vector([0.25, -0.5], []) == [0.25, -0.5]

    def test_dim_mismatch_raises(self):
        from documents_vector_search_spark.operators.rocchio import (
            rocchio_vector,
        )

        with pytest.raises(ValueError):
            rocchio_vector([1.0], [[1.0, 2.0]])

    def test_registry_query_moves_toward_feedback(self, spark):
        from documents_vector_search_spark import registry

        base = {
            r.vec_id
            for r in registry.q_knn_cosine(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        roc = registry.q_knn_rocchio(spark, "/root/testdata/sf0.001")
        rows = roc.collect()
        assert len(rows) == 10
        # the feedback centroid keeps the neighborhood coherent: the
        # updated query still retrieves most of the original top-10
        assert len(base & {r.vec_id for r in rows}) >= 5


class TestCorpusDrift:
    def test_disjoint_vocab_diverges(self, spark):
        from documents_vector_search_spark.operators.drift import (
            corpus_drift_report,
        )

        rows = [
            (i, "query planner index scan join" if i % 2 == 0
             else "rain cloud wind sunny storm", i % 2 == 0)
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "is_a"])
        out = corpus_drift_report(df, F.col("is_a")).collect()
        # the tiny vocab occupies fewer than `top` buckets
        assert 10 <= len(out) <= 20
        assert out[0].js_c > 0.0
        # descending contribution order, ties on bucket
        vals = [(r.js_c, r.bucket) for r in out]
        assert vals == sorted(vals, key=lambda t: (-t[0], t[1]))
        # diverging buckets are one-sided: the top bucket's mass sits
        # in one slice only
        assert out[0].a_cnt == 0 or out[0].b_cnt == 0

    def test_identical_sides_near_zero(self, spark):
        from documents_vector_search_spark.operators.drift import (
            corpus_drift_report,
        )

        rows = [(i, "same text every row", i % 2 == 0) for i in range(40)]
        df = spark.createDataFrame(rows, ["doc_id", "text", "is_a"])
        out = corpus_drift_report(df, F.col("is_a")).collect()
        # both sides see the same distribution — only the add-one
        # smoothing differs; every contribution is ~0
        assert all(abs(r.js_c) < 1e-4 for r in out)

    def test_deterministic(self, spark):
        from documents_vector_search_spark.operators.drift import (
            corpus_drift_report,
        )

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = corpus_drift_report(df, F.col("lang") == "en").collect()
        b = corpus_drift_report(
            df.repartition(5), F.col("lang") == "en"
        ).collect()
        assert a == b


class TestPsiDrift:
    def _df(self, spark, vals_a, vals_b):
        rows = [(float(v), True) for v in vals_a] + [
            (float(v), False) for v in vals_b
        ]
        return spark.createDataFrame(rows, ["value", "is_a"])

    def test_identical_sides_near_zero_and_dense(self, spark):
        from documents_vector_search_spark.operators.drift import psi_report

        vals = [v % 100 for v in range(500)]
        df = self._df(spark, vals, vals)
        out = psi_report(df, F.col("is_a"), n_bins=10, lo=0.0, hi=100.0)
        rows = out.collect()
        assert [r.bin for r in rows] == list(range(10))  # dense spine
        assert all(r.psi_c == 0.0 for r in rows)
        assert all(r.a_cnt == r.b_cnt == 50 for r in rows)

    def test_shift_is_positive_and_localized(self, spark):
        from documents_vector_search_spark.operators.drift import psi_report

        # A sits in [0, 50), B in [50, 100): total PSI large, and each
        # bin's contribution is positive (p != q everywhere)
        df = self._df(
            spark, [v % 50 for v in range(300)],
            [50 + v % 50 for v in range(300)],
        )
        rows = psi_report(
            df, F.col("is_a"), n_bins=10, lo=0.0, hi=100.0
        ).collect()
        total = sum(r.psi_c for r in rows)
        assert total > 0.25  # the classic "drifted" threshold
        assert all(r.psi_c > 0 for r in rows)

    def test_out_of_range_clamps_into_edge_bins(self, spark):
        from documents_vector_search_spark.operators.drift import psi_report

        df = self._df(spark, [-5.0, 120.0], [55.0])
        rows = {
            r.bin: (r.a_cnt, r.b_cnt)
            for r in psi_report(
                df, F.col("is_a"), n_bins=10, lo=0.0, hi=100.0
            ).collect()
        }
        assert rows[0] == (1, 0)  # -5 clamps down
        assert rows[9] == (1, 0)  # 120 clamps up
        assert rows[5] == (0, 1)

    def test_indivisible_range_raises(self, spark):
        from documents_vector_search_spark.operators.drift import psi_report

        df = self._df(spark, [1.0], [2.0])
        with pytest.raises(ValueError, match="divide"):
            psi_report(df, F.col("is_a"), n_bins=3, lo=0.0, hi=1.0)
