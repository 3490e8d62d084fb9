"""Scalar quantization (SQ8) operator contracts (operators/sq.py)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.knn import knn_l2
from documents_vector_search_spark.operators.sq import (
    fit_sq_bounds,
    sq_encode_expr,
    sq_search_l2,
)

DIM = 4


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [0.0, 10.0, -5.0, 7.0]),
        (1, [1.0, 12.0, -5.0, 7.0]),
        (2, [2.0, 14.0, -5.0, 7.0]),
        (3, [3.0, 16.0, -5.0, 7.0]),
        (4, [4.0, 18.0, -5.0, 7.0]),
        (5, [5.0, 20.0, -5.0, 7.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    df.count()
    return df


class TestEncode:
    def test_codes_span_full_range(self, emb):
        """Corpus min encodes to 0, corpus max to 255, codes in [0, 255]."""
        mins, maxs = fit_sq_bounds(emb, DIM)
        assert mins[0] == 0.0 and maxs[0] == 5.0
        codes = {
            r.vec_id: r.codes
            for r in emb.select(
                "vec_id",
                sq_encode_expr(
                    F.col("embedding").cast("array<double>"), mins, maxs
                ).alias("codes"),
            ).collect()
        }
        assert codes[0][0] == 0 and codes[5][0] == 255
        assert codes[0][1] == 0 and codes[5][1] == 255
        assert all(0 <= c <= 255 for cs in codes.values() for c in cs)

    def test_degenerate_dimension_encodes_zero(self, emb):
        """Constant dimensions (max == min) encode 0 — no div-by-zero."""
        mins, maxs = fit_sq_bounds(emb, DIM)
        assert mins[2] == maxs[2] == -5.0
        codes = emb.select(
            sq_encode_expr(
                F.col("embedding").cast("array<double>"), mins, maxs
            ).alias("codes")
        ).collect()
        assert all(r.codes[2] == 0 for r in codes)


class TestQuantizationError:
    @given(
        st.lists(
            st.lists(
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
                min_size=3,
                max_size=3,
            ),
            min_size=2,
            max_size=12,
        )
    )
    @settings(max_examples=20, deadline=None)
    def test_roundtrip_error_within_half_step(self, spark, vectors):
        """Pure-Python mirror of the encode/decode expressions: for any
        corpus, |decode(encode(x)) - x| <= (max-min)/255/2 per
        dimension (half a quantization step) — the bound that makes the
        decoded-distance shortlist trustworthy. The Spark expressions
        are exercised by TestEncode/TestSearch and the sq8_ann oracle;
        this pins the numeric contract itself across random corpora."""
        dims = 3
        mins = [min(v[i] for v in vectors) for i in range(dims)]
        maxs = [max(v[i] for v in vectors) for i in range(dims)]
        import math

        for v in vectors:
            for i in range(dims):
                mn, mx = mins[i], maxs[i]
                if mx == mn:
                    code, decoded = 0, mn
                else:
                    code = math.floor((v[i] - mn) / (mx - mn) * 255 + 0.5)
                    code = max(0, min(255, code))
                    decoded = mn + (code / 255.0) * (mx - mn)
                step = (mx - mn) / 255.0
                assert abs(decoded - v[i]) <= step / 2 + 1e-9 * max(
                    1.0, abs(mx), abs(mn)
                )


class TestSearch:
    def test_full_shortlist_equals_exact_knn(self, emb):
        """With shortlist >= corpus size the re-rank sees every row, so
        SQ8 search must equal exact kNN bit-for-bit (quantization can
        only affect the SHORTLIST, never the re-ranked distances)."""
        q = [2.2, 13.0, -5.0, 7.0]
        got = sq_search_l2(emb, q, 3, shortlist=100).collect()
        exact = knn_l2(emb, q, 3).collect()
        assert [(r.vec_id, r.distance) for r in got] == [
            (r.vec_id, r.distance) for r in exact
        ]

    def test_quantized_shortlist_finds_near_neighbor(self, emb):
        """Even a 1-row shortlist finds the nearest row on this
        well-separated fixture — decoded distances preserve ordering."""
        q = [5.0, 20.0, -5.0, 7.0]
        got = sq_search_l2(emb, q, 1, shortlist=1).collect()
        assert got[0].vec_id == 5


class TestVectorizedEncoder:
    def test_pandas_encoder_matches_expression(self, emb):
        from documents_vector_search_spark.operators.sq import (
            fit_sq_bounds,
            sq_encode_pandas,
        )

        mins, maxs = fit_sq_bounds(emb, DIM)
        both = emb.select(
            "vec_id",
            sq_encode_expr(
                F.col("embedding").cast("array<double>"), mins, maxs
            ).alias("by_expr"),
            sq_encode_pandas(
                F.col("embedding").cast("array<double>"), mins, maxs
            ).alias("by_pandas"),
        ).collect()
        assert all(list(r.by_expr) == list(r.by_pandas) for r in both)
