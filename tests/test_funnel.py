"""Funnel analysis: earliest-completion semantics, out-of-order steps,
ties, and the single-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.funnel import (
    funnel_report,
    funnel_stage_times,
)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1: full funnel in order
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 00:01:00", "click"),
        (3, 1, "2024-01-01 00:02:00", "purchase"),
        # u2: view then purchase — purchase must NOT count without click
        (4, 2, "2024-01-01 00:00:00", "view"),
        (5, 2, "2024-01-01 00:01:00", "purchase"),
        # u3: click BEFORE view is ignored; later click counts
        (6, 3, "2024-01-01 00:00:00", "click"),
        (7, 3, "2024-01-01 00:01:00", "view"),
        (8, 3, "2024-01-01 00:02:00", "click"),
        # u4: same-timestamp view+click — event_id breaks the tie, the
        # click at the same ts but HIGHER event_id counts as "after"
        (9, 4, "2024-01-01 00:00:00", "view"),
        (10, 4, "2024-01-01 00:00:00", "click"),
        # u5: never views
        (11, 5, "2024-01-01 00:00:00", "purchase"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestFunnel:
    def test_report_counts_and_conversion(self, events):
        rows = funnel_report(events, ["view", "click", "purchase"]).collect()
        assert [(r.stage, r.step, r.n_users, r.pct_of_first) for r in rows] == [
            (1, "view", 4, 1.0),       # u1 u2 u3 u4
            (2, "click", 3, 0.75),     # u1 u3 u4
            (3, "purchase", 1, 0.25),  # u1 only
        ]

    def test_stage_times_earliest_completion(self, events):
        got = {
            r.user: [t and str(t) for t in r.stage_ts]
            for r in funnel_stage_times(
                events, ["view", "click", "purchase"]
            ).collect()
        }
        # u3's counted click is the LATER one (00:02), not the pre-view
        assert got[3] == [
            "2024-01-01 00:01:00", "2024-01-01 00:02:00", None
        ]
        # u2 stops after view — the un-clicked purchase never fills
        assert got[2] == ["2024-01-01 00:00:00", None, None]
        # u4's same-ts click counts (event_id order)
        assert got[4][1] == "2024-01-01 00:00:00"
        assert got[5] == [None, None, None]

    def test_duplicate_steps_rejected(self, events):
        with pytest.raises(ValueError, match="distinct"):
            funnel_report(events, ["view", "view"])

    def test_single_shuffle_no_udf(self, events):
        df = funnel_report(events, ["view", "click", "purchase"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
