"""SymSpell fuzzy matching, spell correction, prefix suggest.

The registry compare pins oracle parity for the spell_correct /
fuzzy_search / suggest_prefix keys; these tests pin what the oracle
can't see — that the deletion-index pruning is LOSSLESS against a
brute-force levenshtein scan, the expression/driver deletion twins
agree, and the correction tie-breaks behave."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.bm25 import (
    bm25_topk,
    build_postings,
)
from documents_vector_search_spark.operators.fuzzy import (
    _deletions_of,
    build_deletion_index,
    build_term_dictionary,
    deletions_py,
    fuzzy_bm25_topk,
    fuzzy_candidates,
    spell_corrections,
    suggest_prefix,
)

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vocab(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return build_term_dictionary(build_postings(docs)).cache()


class TestDeletions:
    def test_deletions_py(self):
        assert deletions_py("abc") == ["ab", "abc", "ac", "bc"]
        # d=2 includes single chars and the originals' deletions
        d2 = set(deletions_py("abc", 2))
        assert {"a", "b", "c", "ab", "ac", "bc", "abc"} <= d2

    @pytest.mark.parametrize("max_edits", [1, 2])
    def test_expression_matches_python_twin(self, spark, max_edits):
        terms = ["a", "ab", "hash", "query"]
        df = spark.createDataFrame([(t,) for t in terms], "term string")
        got = {
            r["term"]: sorted(set(r["variants"]))
            for r in build_deletion_index(df, max_edits=max_edits)
            .groupBy("term")
            .agg(F.collect_list("variant").alias("variants"))
            .collect()
        }
        for t in terms:
            assert got[t] == deletions_py(t, max_edits), t


class TestFuzzyCandidates:
    @pytest.mark.parametrize("probe,max_edits", [("hash", 1), ("hsh", 1), ("hsah", 2)])
    def test_symspell_pruning_is_lossless(self, spark, vocab, probe, max_edits):
        """deletion-index probe + verify == brute-force levenshtein
        scan of the whole vocabulary."""
        didx = build_deletion_index(vocab, max_edits=max_edits)
        via_index = {
            r["term"]
            for r in fuzzy_candidates(didx, probe, max_edits=max_edits).collect()
        }
        brute = {
            r["term"]
            for r in vocab.filter(
                F.levenshtein(F.col("term"), F.lit(probe)) <= max_edits
            ).collect()
        }
        assert via_index == brute and brute  # non-trivial on this corpus


class TestSpellCorrections:
    def test_prefer_exact_keeps_in_vocab_terms(self, spark):
        # 'b' is rare, 'bb' frequent and at distance 1
        docs = spark.createDataFrame(
            [(1, "b bb bb bb bb")], "doc_id bigint, text string"
        )
        v = build_term_dictionary(build_postings(docs))
        corrected = {
            r["qraw"]: r["suggestion"]
            for r in spell_corrections(v, ["b"], prefer_exact=True).collect()
        }
        assert corrected == {"b": "b"}
        freq_first = {
            r["qraw"]: r["suggestion"]
            for r in spell_corrections(v, ["b"], prefer_exact=False).collect()
        }
        assert freq_first == {"b": "bb"}

    def test_no_candidate_gives_null(self, vocab):
        rows = spell_corrections(vocab, ["zzqzzq"]).collect()
        assert rows[0]["suggestion"] is None and rows[0]["ctf"] is None

    def test_case_folds_and_dedupes(self, vocab):
        rows = spell_corrections(vocab, ["Hash", "HASH"]).collect()
        assert len(rows) == 1 and rows[0]["qraw"] == "hash"


class TestFuzzySearch:
    def test_corrected_equals_clean_query(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        fuzzy = fuzzy_bm25_topk(docs, "hashe joinn", 10).collect()
        clean = bm25_topk(docs, "hash join", 10).collect()
        assert [(r["doc_id"], r["score"]) for r in fuzzy] == [
            (r["doc_id"], r["score"]) for r in clean
        ]

    def test_uncorrectable_query_returns_empty(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        assert fuzzy_bm25_topk(docs, "zzqzzq", 5).count() == 0


class TestSuggestPrefix:
    def test_ordering_and_prefix(self, vocab):
        rows = suggest_prefix(vocab, "s", 5).collect()
        assert rows and all(r["term"].startswith("s") for r in rows)
        ctfs = [r["ctf"] for r in rows]
        assert ctfs == sorted(ctfs, reverse=True)
