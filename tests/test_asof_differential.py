"""Differential test: asof_join vs pandas.merge_asof on random inputs.

pandas' merge_asof is an independent, widely-trusted implementation of
the same semantics (backward/forward inclusive match, by-key, numeric
tolerance) — hypothesis drives both over random key/timestamp/value
combinations and every disagreement is a bug in one of them. This
complements the fixture tests (known answers) and the DuckDB oracle
(one deterministic dataset) with adversarial coverage of tie, gap,
no-match, and tolerance-boundary cases.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from documents_vector_search_spark.operators.asof import asof_join

ROW = st.tuples(
    st.sampled_from(["a", "b", "c"]),
    st.integers(0, 40),
    st.integers(0, 99),
)


def _expected(left_pdf, right_pdf, direction, tolerance):
    out = pd.merge_asof(
        left_pdf.sort_values("ts", kind="stable"),
        right_pdf.sort_values("ts", kind="stable"),
        on="ts",
        by="key",
        direction=direction,
        tolerance=tolerance,
        suffixes=("", "_r"),
    )
    return {
        int(r.n): None if math.isnan(r.v) else int(r.v)
        for r in out.itertuples()
    }


@pytest.mark.usefixtures("spark")
class TestAsofVsPandas:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        left_rows=st.lists(ROW, min_size=1, max_size=20),
        right_rows=st.lists(ROW, min_size=1, max_size=20),
        direction=st.sampled_from(["backward", "forward"]),
        tolerance=st.sampled_from([None, 3.0, 10.0]),
        bucket=st.sampled_from([None, 7.0]),
    )
    def test_agrees_with_merge_asof(
        self, spark, left_rows, right_rows, direction, tolerance, bucket
    ):
        # operator contract: right side unique per (key, ts)
        rdict = {(k, t): v for k, t, v in right_rows}
        right_pdf = pd.DataFrame(
            [
                {"key": k, "ts": float(t), "v": float(v)}
                for (k, t), v in sorted(rdict.items())
            ]
        )
        left_pdf = pd.DataFrame(
            [
                {"key": k, "ts": float(t), "n": i}
                for i, (k, t, _v) in enumerate(left_rows)
            ]
        )

        left = spark.createDataFrame(left_pdf)
        right = spark.createDataFrame(right_pdf)
        got_df = asof_join(
            left, right, on="key", direction=direction,
            tolerance_s=tolerance, coarse_bucket_s=bucket,
        )
        got = {
            int(r.n): None if r.v_r is None else int(r.v_r)
            for r in got_df.collect()
        }
        want = _expected(left_pdf, right_pdf, direction, tolerance)
        assert got == want
