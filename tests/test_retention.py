"""Cohort retention: hand-checked cohorts, offset-0 convention, and
period arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.retention import (
    cohort_retention,
)


@pytest.fixture(scope="module")
def events(spark):
    # day-long periods for readable fixtures: cohorts day0 {u1,u2},
    # day1 {u3}; u1 returns day1 and day2, u2 never returns, u3
    # returns day2
    rows = [
        (1, 1, "2024-01-01 10:00:00"),
        (2, 1, "2024-01-02 09:00:00"),
        (3, 1, "2024-01-03 23:00:00"),
        (4, 2, "2024-01-01 11:00:00"),
        (5, 3, "2024-01-02 05:00:00"),
        (6, 3, "2024-01-03 05:00:00"),
        # u1 twice in one day: distinct (user, period) counts once
        (7, 1, "2024-01-02 10:00:00"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestRetention:
    def test_counts_and_fractions(self, events):
        rows = cohort_retention(events, period_days=1).collect()
        got = {
            (r.cohort_period - rows[0].cohort_period, r.period_offset): (
                r.n_active, r.cohort_size, r.retention,
            )
            for r in rows
        }
        assert got[(0, 0)] == (2, 2, 1.0)   # u1, u2
        assert got[(0, 1)] == (1, 2, 0.5)   # u1 back next day
        assert got[(0, 2)] == (1, 2, 0.5)   # u1 back day 2
        assert got[(1, 0)] == (1, 1, 1.0)   # u3's own cohort
        assert got[(1, 1)] == (1, 1, 1.0)   # u3 back next day
        assert len(got) == 5  # u2 contributes no later offsets

    def test_max_offset_bounds_output(self, events):
        rows = cohort_retention(events, period_days=1, max_offset=1).collect()
        assert all(r.period_offset <= 1 for r in rows)

    def test_no_udf(self, events):
        plan = (
            cohort_retention(events, period_days=1)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
