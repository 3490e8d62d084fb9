"""functions/: tokenizer, shingles, portable hashing, vector math."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.hashing import (
    md5_hash64,
    md5_hash64_sql,
    minhash_signature,
    simhash32,
)
from documents_vector_search_spark.functions.text import tokenize, word_shingles
from documents_vector_search_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


class TestTokenize:
    def test_basic(self, spark):
        got = one(spark, tokenize(F.lit("The fast, FAST join!")))
        assert got == ["the", "fast", "fast", "join"]

    def test_empty_and_separators_only(self, spark):
        assert one(spark, tokenize(F.lit(""))) == []
        assert one(spark, tokenize(F.lit("..., !!"))) == []

    def test_digits_kept(self, spark):
        assert one(spark, tokenize(F.lit("a1 b2-c3"))) == ["a1", "b2", "c3"]


class TestShingles:
    def test_standard(self, spark):
        got = one(spark, word_shingles(F.array(*[F.lit(x) for x in "abcd"]), 3))
        assert got == ["a b c", "b c d"]

    def test_short_doc_single_shingle(self, spark):
        got = one(spark, word_shingles(F.array(F.lit("a"), F.lit("b")), 3))
        assert got == ["a b"]

    def test_regex_form_matches_slice_reference(self, spark):
        """The r12 one-pass regex form must agree with the positional
        slice+array_join reference on every (tokens, n) shape: empty,
        short-doc padding, exact-length, long, multi-char tokens,
        digits, repeated tokens — over tokenize-style inputs (the
        documented precondition: space-free, non-null elements)."""
        texts = [
            "",
            "one",
            "one two",
            "one two three",
            "one two three four five",
            "a1 b2 c3 d4 e5 f6 g7",
            "dup dup dup dup",
            "x " * 40,
        ]
        for n in (1, 2, 3, 5):
            for txt in texts:
                toks = tokenize(F.lit(txt))
                got = one(spark, word_shingles(toks, n))
                ref_count = F.greatest(
                    F.size(toks) - F.lit(n - 1), F.lit(1)
                )
                ref = one(
                    spark,
                    F.transform(
                        F.sequence(F.lit(1), ref_count),
                        lambda i: F.array_join(F.slice(toks, i, n), " "),
                    ),
                )
                assert got == ref, (txt, n, got, ref)


class TestHashing:
    def test_matches_duckdb(self, spark):
        for value, salt in [("hello world", 0), ("hello world", 3), ("", 1)]:
            spark_h = one(spark, md5_hash64(F.lit(value), salt))
            duck_h = duckdb.sql(
                f"SELECT {md5_hash64_sql(repr(value), salt)}"
            ).fetchone()[0]
            assert spark_h == duck_h

    def test_nonnegative_int64(self, spark):
        h = one(spark, md5_hash64(F.lit("x")))
        assert 0 <= h < 2**60

    def test_python_twin_matches_column(self, spark):
        """All three dialects of md5_hash64 (Column / SQL / Python) must
        agree — term_bucket_py derives from the Python twin, and drift
        would silently prune every BM25 posting."""
        from documents_vector_search_spark.functions.hashing import (
            md5_hash64_py,
        )

        for value, salt in [("hello world", 0), ("spark", 3), ("", 1)]:
            assert one(spark, md5_hash64(F.lit(value), salt)) == md5_hash64_py(
                value, salt
            )

    def test_term_bucket_py_matches_write_side(self, spark):
        from documents_vector_search_spark.operators.bm25 import (
            term_bucket,
            term_bucket_py,
        )

        for term in ["hash", "join", "vector", "scan", "über"]:
            assert one(spark, term_bucket(F.lit(term))) == term_bucket_py(term)

    def test_minhash_estimates_jaccard(self, spark):
        # identical arrays → identical signatures
        arr = F.array(*[F.lit(f"sh{i}") for i in range(20)])
        sig1 = one(spark, minhash_signature(arr, 8))
        sig2 = one(spark, minhash_signature(arr, 8))
        assert sig1 == sig2
        # disjoint arrays → (almost surely) different signatures
        other = F.array(*[F.lit(f"zz{i}") for i in range(20)])
        sig3 = one(spark, minhash_signature(other, 8))
        assert sig1 != sig3

    def test_minhash_family_is_unbiased_not_degenerate(self, spark):
        """Statistical guard for the Carter-Wegman family: the fraction
        of matching signature components must track the true Jaccard.
        This catches DEGENERATE families specifically — a round-5 bug
        made i*b a cosmetic perturbation of a (every family picked the
        same argmin shingle), so components matched all-or-nothing:
        estimates snapped to 0.0 or 1.0 and every mid-similarity pair
        broke LSH. 64 components at J≈0.5: binomial std ≈ 0.0625, so
        the ±0.2 window is a >3-sigma guard, loose enough to never
        flake, tight enough that all-or-nothing can't pass."""
        shared = [f"sh{i}" for i in range(30)]
        a = F.array(*[F.lit(s) for s in shared + [f"a{i}" for i in range(15)]])
        b = F.array(*[F.lit(s) for s in shared + [f"b{i}" for i in range(15)]])
        true_j = 30 / 60  # |inter|=30, |union|=60
        sig_a = one(spark, minhash_signature(a, 64))
        sig_b = one(spark, minhash_signature(b, 64))
        est = sum(x == y for x, y in zip(sig_a, sig_b)) / 64
        assert abs(est - true_j) < 0.2, f"estimate {est} vs true {true_j}"
        # and the components are genuinely independent draws, not one
        # shingle's arithmetic progression: consecutive diffs must vary
        diffs = {sig_a[i + 1] - sig_a[i] for i in range(len(sig_a) - 1)}
        assert len(diffs) > 1

    def test_minhash_family_index_bound(self, spark):
        from documents_vector_search_spark.functions.hashing import (
            MINHASH_MAX_FAMILIES,
            minhash_from_hex,
        )

        with pytest.raises(ValueError, match="out of range"):
            minhash_from_hex(F.lit("ab" * 16), MINHASH_MAX_FAMILIES)

    def test_simhash_similar_docs_close(self, spark):
        a = one(spark, simhash32(tokenize(F.lit("the quick brown fox jumps"))))
        b = one(spark, simhash32(tokenize(F.lit("the quick brown fox leaps"))))
        c = one(spark, simhash32(tokenize(F.lit("entirely different content here"))))
        ham_ab = bin(a ^ b).count("1")
        ham_ac = bin(a ^ c).count("1")
        assert ham_ab < ham_ac

    def test_simhash_empty_is_zero(self, spark):
        assert one(spark, simhash32(tokenize(F.lit("")))) == 0


class TestVectors:
    def test_dot_l2_cosine(self, spark):
        a = F.array(F.lit(1.0), F.lit(2.0), F.lit(2.0))
        b = F.array(F.lit(2.0), F.lit(0.0), F.lit(1.0))
        assert one(spark, dot_product(a, b)) == pytest.approx(4.0)
        assert one(spark, l2_norm(a)) == pytest.approx(3.0)
        assert one(spark, l2_distance(a, b)) == pytest.approx(math.sqrt(1 + 4 + 1))
        assert one(spark, cosine_similarity(a, b)) == pytest.approx(
            4.0 / (3.0 * math.sqrt(5))
        )

    def test_cosine_zero_vector_guard(self, spark):
        z = F.array(F.lit(0.0), F.lit(0.0))
        a = F.array(F.lit(1.0), F.lit(0.0))
        assert one(spark, cosine_similarity(z, a)) == 0.0
