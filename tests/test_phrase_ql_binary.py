"""Phrase search, Dirichlet query-likelihood, and binary-sign ANN.

The registry compare (dev/compare.py keys phrase_search / ql_dirichlet
/ binary_ann / tpch_q3) pins oracle parity; these tests pin the
operator semantics the oracle can't see — overlapping occurrences,
the positional-index == naive-scan equivalence, OOV query handling,
signature packing, and the binary-retrieval recall floor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.binary_ann import (
    binary_topk,
    hamming_to_literal,
    sign_signature,
    sign_signature_py,
)
from documents_vector_search_spark.operators.bm25 import ql_dirichlet_topk
from documents_vector_search_spark.operators.phrase import (
    build_positional_postings,
    phrase_match_counts,
    phrase_match_counts_scan,
    phrase_topk,
    tokenize_phrase,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestPhrase:
    def test_overlapping_occurrences_count_individually(self, spark):
        docs = _docs(spark, [(1, "a a a a"), (2, "a b a"), (3, "b b")])
        got = {
            r["doc_id"]: r["phrase_tf"]
            for r in phrase_match_counts(
                build_positional_postings(docs), ["a", "a"]
            ).collect()
        }
        assert got == {1: 3, 2: 0} or got == {1: 3}  # doc 2 has no "a a"

    def test_adjacency_required_and_order_matters(self, spark):
        docs = _docs(
            spark,
            [
                (1, "hash join wins"),      # exact phrase
                (2, "join hash wins"),      # both terms, wrong order
                (3, "hash fast join"),      # both terms, gap
                (4, "hash hash join"),      # one occurrence at offset 1
            ],
        )
        got = {
            r["doc_id"]: r["phrase_tf"]
            for r in phrase_match_counts(
                build_positional_postings(docs), ["hash", "join"]
            ).collect()
        }
        assert got == {1: 1, 4: 1}

    def test_three_term_phrase(self, spark):
        docs = _docs(spark, [(1, "x a b c y a b c"), (2, "a b x c")])
        got = phrase_match_counts(
            build_positional_postings(docs), ["a", "b", "c"]
        ).collect()
        assert {(r["doc_id"], r["phrase_tf"]) for r in got} == {(1, 2)}

    def test_short_docs_and_missing_terms_drop_out(self, spark):
        docs = _docs(spark, [(1, "hash"), (2, ""), (3, "join join")])
        assert (
            phrase_match_counts(
                build_positional_postings(docs), ["hash", "join"]
            ).count()
            == 0
        )
        # the scan twin must survive docs shorter than the phrase too
        assert phrase_match_counts_scan(docs, "hash join").count() == 0

    def test_positional_index_equals_naive_scan_on_corpus(self, spark):
        """The positional-intersection algebra == the sliding-window
        definition, over every document of the smoke corpus."""
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        via_index = {
            (r["doc_id"], r["phrase_tf"])
            for r in phrase_match_counts(
                build_positional_postings(docs), tokenize_phrase("hash join")
            ).collect()
        }
        via_scan = {
            (r["doc_id"], r["phrase_tf"])
            for r in phrase_match_counts_scan(docs, "hash join").collect()
        }
        assert via_index == via_scan and via_index

    def test_topk_ordering_deterministic(self, spark):
        docs = _docs(
            spark,
            [(1, "p q p q"), (2, "p q"), (3, "p q p q"), (4, "nothing")],
        )
        rows = phrase_topk(docs, "p q", 3).collect()
        assert [(r["doc_id"], r["phrase_tf"]) for r in rows] == [
            (1, 2),
            (3, 2),
            (2, 1),
        ]

    def test_empty_phrase_rejected(self, spark):
        docs = _docs(spark, [(1, "a")])
        with pytest.raises(ValueError):
            phrase_match_counts(build_positional_postings(docs), [])


class TestQLDirichlet:
    def test_matching_more_terms_beats_fewer_at_equal_length(self, spark):
        docs = _docs(
            spark,
            [
                (1, "hash join fast fast"),
                (2, "hash slow fast fast"),
                (3, "slow slow fast fast"),
            ],
        )
        rows = ql_dirichlet_topk(docs, "hash join", 10).collect()
        ids = [r["doc_id"] for r in rows]
        assert ids[0] == 1           # both terms
        assert 3 not in ids          # no query term -> not a candidate

    def test_oov_terms_ignored(self, spark):
        docs = _docs(spark, [(1, "hash join a"), (2, "hash b c")])
        with_oov = ql_dirichlet_topk(docs, "hash join zzzunseen", 10).collect()
        without = ql_dirichlet_topk(docs, "hash join", 10).collect()
        assert [(r["doc_id"], r["score"]) for r in with_oov] == [
            (r["doc_id"], r["score"]) for r in without
        ]

    def test_repeated_query_term_weights_double(self, spark):
        """qtf multiplies the term component: 'hash hash' doubles the
        hash component relative to 'hash' (same candidates)."""
        docs = _docs(spark, [(1, "hash a b"), (2, "a b c")])
        single = ql_dirichlet_topk(docs, "hash", 10, round_to=None).collect()
        double = ql_dirichlet_topk(docs, "hash hash", 10, round_to=None).collect()
        assert len(single) == len(double) == 1
        import math

        # score = qtf*comp + qtf*len_norm => doubled everywhere
        assert math.isclose(double[0]["score"], 2 * single[0]["score"], rel_tol=1e-12)

    def test_empty_query_returns_empty(self, spark):
        docs = _docs(spark, [(1, "a")])
        assert ql_dirichlet_topk(docs, "...", 5).count() == 0


class TestBinaryAnn:
    def test_signature_packing_matches_python_twin(self, spark):
        vecs = [
            [1.0, -1.0, 0.0, -2.0] * 16,        # dim 64, mixed signs
            [-1.0] * 64,
            [1.0] * 64,
        ]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "id int, v array<double>"
        )
        got = {
            r["id"]: r["sig"]
            for r in df.select(
                "id", sign_signature(F.col("v"), 64).alias("sig")
            ).collect()
        }
        for i, v in enumerate(vecs):
            assert got[i] == sign_signature_py(v), f"vec {i}"
        # >= 0 convention: the zero dimension sets its bit
        assert got[0][0] & (1 << 2)

    def test_hamming_expression(self, spark):
        a = [1.0] * 64
        b = [1.0] * 32 + [-1.0] * 32
        df = spark.createDataFrame([(0, a)], "id int, v array<double>")
        ham = df.select(
            hamming_to_literal(
                sign_signature(F.col("v"), 64), sign_signature_py(b)
            ).alias("h")
        ).collect()[0]["h"]
        assert ham == 32

    def test_self_query_is_top1_and_recall_floor(self, spark):
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        probe = emb.orderBy("vec_id").limit(1).collect()[0]
        qv = [float(x) for x in probe["embedding"]]
        rows = binary_topk(emb, qv, 10, n_rerank=64).collect()
        assert rows[0]["vec_id"] == probe["vec_id"]
        # recall@10 of the two-stage binary pipeline vs exact cosine
        from documents_vector_search_spark.functions.vectors import (
            cosine_similarity,
            lit_double_array,
        )

        exact = {
            r["vec_id"]
            for r in emb.select(
                "vec_id",
                F.round(
                    cosine_similarity(
                        F.col("embedding").cast("array<double>"),
                        lit_double_array(qv),
                    ),
                    6,
                ).alias("s"),
            )
            .orderBy(F.col("s").desc(), F.col("vec_id"))
            .limit(10)
            .collect()
        }
        got = {r["vec_id"] for r in rows}
        assert len(got & exact) >= 5, f"recall@10 {len(got & exact)}/10"

    def test_materialized_sig_column_matches_inline(self, spark):
        """sig_col path (index-layout form: candidates scan packed
        words, not floats) returns exactly the inline-packed result."""
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        from documents_vector_search_spark.registry import QUERY_VEC

        with_sig = emb.withColumn(
            "sig",
            sign_signature(F.col("embedding").cast("array<double>"), 64),
        )
        via_sig = binary_topk(with_sig, QUERY_VEC, 10, sig_col="sig").collect()
        inline = binary_topk(emb, QUERY_VEC, 10).collect()
        assert [(r["vec_id"], r["similarity"]) for r in via_sig] == [
            (r["vec_id"], r["similarity"]) for r in inline
        ]


class TestPhraseProperty:
    def test_positional_equals_scan_on_random_corpora(self, spark):
        """Property: for random small-alphabet corpora and random
        phrases, the positional-index algebra == the sliding-window
        scan. One Spark round-trip over many generated cases (a
        hypothesis @given would pay Spark latency per example)."""
        import random

        from documents_vector_search_spark.operators.phrase import (
            build_positional_postings,
            phrase_match_counts,
            phrase_match_counts_scan,
        )

        rng = random.Random(1234)
        alphabet = ["a", "b", "c"]
        docs = [
            (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))))
            for i in range(120)
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        pos = build_positional_postings(df).localCheckpoint()
        for trial in range(12):
            n = rng.randint(1, 3)
            phrase_terms = [rng.choice(alphabet) for _ in range(n)]
            phrase = " ".join(phrase_terms)
            via_index = {
                (r["doc_id"], r["phrase_tf"])
                for r in phrase_match_counts(pos, phrase_terms).collect()
            }
            via_scan = {
                (r["doc_id"], r["phrase_tf"])
                for r in phrase_match_counts_scan(df, phrase).collect()
            }
            # python ground truth as the third witness
            truth = set()
            for doc_id, text in docs:
                toks = text.split()
                tf = sum(
                    1
                    for i in range(len(toks) - n + 1)
                    if toks[i : i + n] == phrase_terms
                )
                if tf:
                    truth.add((doc_id, tf))
            assert via_index == via_scan == truth, (phrase, trial)
