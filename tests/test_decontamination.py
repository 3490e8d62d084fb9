"""Benchmark decontamination contracts (operators/decontamination.py)."""

from __future__ import annotations

import pytest

from documents_vector_search_spark.operators.decontamination import (
    contamination_report,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpora(spark):
    docs = spark.createDataFrame(
        [
            # shares the benchmark's full 5-gram
            (1, "the quick brown fox jumps over the lazy dog"),
            # clean: no 5-gram overlap
            (2, "completely unrelated text about spark shuffle tuning"),
            # shares tokens but never five in a row
            (3, "quick brown dog sleeps near the fox"),
            # short doc (< 5 tokens) identical to a short benchmark doc
            (4, "tiny shared snippet"),
            # short doc, no overlap
            (5, "another small note"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps high"),
            (101, "tiny shared snippet"),
        ],
        ["doc_id", "text"],
    )
    return docs, bench


class TestReport:
    def test_flags_and_counts(self, corpora):
        docs, bench = corpora
        got = {
            r.doc_id: (r.contaminated_ngrams, r.contaminated)
            for r in contamination_report(docs, bench, n=5).collect()
        }
        assert set(got) == {1, 2, 3, 4, 5}  # every doc reported
        assert got[1] == (1, True)  # "the quick brown fox jumps"
        assert got[2] == (0, False)
        assert got[3] == (0, False)  # token overlap is not 5-gram overlap
        assert got[4] == (1, True)  # short-doc whole-text shingle
        assert got[5] == (0, False)

    def test_min_hits_threshold(self, corpora):
        docs, bench = corpora
        got = {
            r.doc_id: r.contaminated
            for r in contamination_report(docs, bench, n=5, min_hits=2).collect()
        }
        assert got[1] is False  # one shared 5-gram < threshold 2

    def test_hashed_grams_match_string_grams(self, corpora):
        """hash_grams=True must produce the same report (collisions are
        ~n²/2⁶⁴ — impossible on this fixture)."""
        docs, bench = corpora
        plain = sorted(
            (r.doc_id, r.contaminated_ngrams, r.contaminated)
            for r in contamination_report(docs, bench, n=5).collect()
        )
        hashed = sorted(
            (r.doc_id, r.contaminated_ngrams, r.contaminated)
            for r in contamination_report(
                docs, bench, n=5, hash_grams=True
            ).collect()
        )
        assert plain == hashed

    def test_benchmark_side_is_broadcast(self, corpora):
        """The benchmark grams must enter the join as a broadcast — the
        100 TB training side never shuffles its exploded n-grams."""
        docs, bench = corpora
        plan = (
            contamination_report(docs, bench)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_auto_cutover_picks_join_by_estimated_size(self, corpora):
        """broadcast=None (the default) must choose the physical join
        from the benchmark-side size estimate, Spark-threshold style:
        under the budget → BroadcastHashJoin, over it (forced by a
        1-byte budget) → shuffle join — with identical results."""
        docs, bench = corpora
        small = contamination_report(docs, bench, n=5, broadcast=None)
        plan_small = small._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_small

        big = contamination_report(
            docs, bench, n=5, broadcast=None, auto_broadcast_bytes=1
        )
        plan_big = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_big

        rows = lambda df: sorted(  # noqa: E731
            (r.doc_id, r.contaminated_ngrams, r.contaminated)
            for r in df.collect()
        )
        assert rows(small) == rows(big)

    def test_shuffle_path_matches_broadcast_path(self, corpora):
        """broadcast=False (the huge-eval-suite scale path) must produce
        the identical report through a shuffle hash join — only the
        physical join strategy moves, never the results."""
        docs, bench = corpora
        shuffled = contamination_report(docs, bench, n=5, broadcast=False)
        plan = shuffled._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        via_broadcast = sorted(
            (r.doc_id, r.contaminated_ngrams, r.contaminated)
            for r in contamination_report(docs, bench, n=5).collect()
        )
        via_shuffle = sorted(
            (r.doc_id, r.contaminated_ngrams, r.contaminated)
            for r in shuffled.collect()
        )
        assert via_broadcast == via_shuffle


class TestTokenReuse:
    def test_precomputed_tokens_match_internal_tokenize(self, corpora):
        """tokens_col (the composed-pipeline no-double-tokenize path)
        must produce the identical report."""
        from documents_vector_search_spark.functions.text import tokenize

        docs, bench = corpora
        pre = docs.withColumn("_toks", tokenize("text"))
        via_tokens = sorted(
            (r.doc_id, r.contaminated_ngrams, r.contaminated)
            for r in contamination_report(
                pre, bench, n=5, tokens_col="_toks"
            ).collect()
        )
        direct = sorted(
            (r.doc_id, r.contaminated_ngrams, r.contaminated)
            for r in contamination_report(docs, bench, n=5).collect()
        )
        assert via_tokens == direct


class TestApply:
    def test_decontaminate_drops_flagged(self, corpora):
        docs, bench = corpora
        kept = {r.doc_id for r in decontaminate(docs, bench, n=5).collect()}
        assert kept == {2, 3, 5}


class TestBenchmarkSide:
    """The flipped view (benchmark_hit_report / contamination_rate):
    the signoff numbers — which EVAL docs are compromised, per suite."""

    def _frames(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely unrelated text about spark shuffle tuning"),
            ],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame(
            [
                # s1: one compromised (5-gram inside doc 1), one clean
                (100, "the quick brown fox jumps high", "s1"),
                (101, "nothing here matches any training text", "s1"),
                # s2: compromised short doc (< 5 tokens -> whole-text
                # shingle, a substring-run of doc 2's token stream)
                (102, "text about spark shuffle tuning", "s2"),
            ],
            ["doc_id", "text", "suite"],
        )
        return docs, bench

    def test_hit_report_counts_per_bench_doc(self, spark):
        from documents_vector_search_spark.operators.decontamination import (
            benchmark_hit_report,
        )

        docs, bench = self._frames(spark)
        got = {
            r.doc_id: (r.shared_ngrams, r.compromised)
            for r in benchmark_hit_report(
                docs, bench, n=5, suite_col="suite"
            ).collect()
        }
        assert got[100] == (1, True)   # "the quick brown fox jumps"
        assert got[101] == (0, False)
        assert got[102] == (1, True)

    def test_rate_rollup_micro_floored(self, spark):
        from documents_vector_search_spark.operators.decontamination import (
            benchmark_contamination_rate,
        )

        docs, bench = self._frames(spark)
        got = {
            r.suite: (r.n_bench_docs, r.n_compromised, r.contamination_rate)
            for r in benchmark_contamination_rate(docs, bench, n=5).collect()
        }
        assert got == {"s1": (2, 1, 0.5), "s2": (1, 1, 1.0)}

    def test_min_hits_threshold(self, spark):
        from documents_vector_search_spark.operators.decontamination import (
            benchmark_hit_report,
        )

        docs, bench = self._frames(spark)
        got = {
            r.doc_id: r.compromised
            for r in benchmark_hit_report(
                docs, bench, n=5, min_hits=2, suite_col="suite"
            ).collect()
        }
        assert got == {100: False, 101: False, 102: False}

    def test_both_sides_count_the_same_matches(self, spark):
        """Conservation: total gram matches seen from the training side
        (contamination_report) equals the total seen from the benchmark
        side when train and bench gram sets are deduped per doc on both
        reports' own keys — here each matched gram is counted once per
        (doc, gram) pair on its own side, so equality holds on this
        fixture where no gram repeats across docs of one side."""
        from documents_vector_search_spark.operators.decontamination import (
            benchmark_hit_report,
            contamination_report,
        )

        docs, bench = self._frames(spark)
        train_total = sum(
            r.contaminated_ngrams
            for r in contamination_report(docs, bench, n=5).collect()
        )
        bench_total = sum(
            r.shared_ngrams
            for r in benchmark_hit_report(docs, bench, n=5).collect()
        )
        assert train_total == bench_total == 2
