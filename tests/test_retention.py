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


class TestSurvivalCurve:
    """survival_curve (operators/retention.py): the Kaplan-Meier
    product-limit estimator vs a pure-Python reference on a censoring
    mix, plus the at-risk bookkeeping laws and the factor==0
    degenerate step (ln(0)-is-NULL trap handled explicitly)."""

    @staticmethod
    def _events(spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    @staticmethod
    def _km_reference(lifetimes, churn_gap_days, corpus_max_day):
        """(user -> (first_day, last_day)) -> [(d, n, churned, censored,
        S)] in pure Python floats."""
        obs = []
        for first, last in lifetimes.values():
            dur = last - first
            churned = (corpus_max_day - last) > churn_gap_days
            obs.append((dur, churned))
        out, s = [], 1.0
        for d in sorted({d for d, _ in obs}):
            n = sum(1 for dd, _ in obs if dd >= d)
            ch = sum(1 for dd, c in obs if dd == d and c)
            ce = sum(1 for dd, c in obs if dd == d and not c)
            s *= 1.0 - ch / n
            out.append((d, n, ch, ce, round(s, 6)))
        return out

    def test_matches_python_km(self, spark):
        from documents_vector_search_spark.operators.retention import (
            survival_curve,
        )

        # corpus max = day 30. churn gap 5: last-day <= 24 churned.
        lifetimes = {
            "u1": (0, 2),    # churned at 2
            "u2": (0, 2),    # churned at 2
            "u3": (1, 4),    # churned at 3
            "u4": (0, 28),   # censored at 28
            "u5": (2, 30),   # censored at 28
            "u6": (0, 0),    # churned at 0
        }
        rows, eid = [], 0
        for u, (f, l) in lifetimes.items():
            for day in (f, l):
                eid += 1
                rows.append((eid, u, f"2024-01-{day + 1:02d} 00:00:00"))
        got = [
            (r["duration_days"], r["n_at_risk"], r["churned"],
             r["censored"], r["survival"])
            for r in survival_curve(
                self._events(spark, rows), churn_gap_days=5
            ).collect()
        ]
        assert got == self._km_reference(lifetimes, 5, 30)
        # bookkeeping law: at-risk drops by exactly churned+censored
        for (d1, n1, c1, e1, _), (d2, n2, _, _, _) in zip(got, got[1:]):
            assert n2 == n1 - c1 - e1

    def test_everyone_churns_at_once_hits_zero(self, spark):
        from documents_vector_search_spark.operators.retention import (
            survival_curve,
        )

        rows = [
            (1, "a", "2024-01-01 00:00:00"), (2, "a", "2024-01-03 00:00:00"),
            (3, "b", "2024-01-01 00:00:00"), (4, "b", "2024-01-03 00:00:00"),
            # a late lone user supplies the corpus max so a and b churn
            (5, "z", "2024-02-01 00:00:00"),
        ]
        got = {
            r["duration_days"]: r["survival"]
            for r in survival_curve(
                self._events(spark, rows), churn_gap_days=3
            ).collect()
        }
        # a and b both churn at duration 2; z censored at 0
        assert got[2] == 0.0


class TestSessionizeAndMetrics:
    """operators/sessions.py: batch sessionize (the reusable twin of
    the registry's q_sessionize and streaming sessionize_stream) and
    the one-row quality rollup."""

    @staticmethod
    def _ev(spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def test_sessions_split_on_gap(self, spark):
        from documents_vector_search_spark.operators.sessions import (
            sessionize,
        )

        rows = [
            (1, "u1", "2024-01-01 00:00:00"),
            (2, "u1", "2024-01-01 00:10:00"),   # same session (gap 30m)
            (3, "u1", "2024-01-01 01:00:00"),   # 50m gap: new session
            (4, "u2", "2024-01-01 00:00:00"),   # bounce
        ]
        got = {
            (r["user"], r["session_id"]): (r["n_events"], r["duration_s"])
            for r in sessionize(self._ev(spark, rows)).collect()
        }
        assert got[("u1", 1)] == (2, 600.0)
        assert got[("u1", 2)] == (1, 0.0)
        assert got[("u2", 1)] == (1, 0.0)

    def test_metrics_rollup(self, spark):
        from documents_vector_search_spark.operators.sessions import (
            session_metrics,
        )

        rows = [
            (1, "u1", "2024-01-01 00:00:00"),
            (2, "u1", "2024-01-01 00:10:00"),
            (3, "u1", "2024-01-01 01:00:00"),
            (4, "u2", "2024-01-01 00:00:00"),
        ]
        m = session_metrics(self._ev(spark, rows)).collect()[0]
        assert m["n_sessions"] == 3 and m["n_users"] == 2
        assert m["sessions_per_user"] == 1.5
        assert m["bounce_rate"] == round(2 / 3, 6)
        assert m["avg_events"] == round(4 / 3, 6)
        assert m["p50_duration_s"] == 0.0

    def test_matches_registry_sessionize(self, spark):
        """The reusable operator must draw the same boundaries as the
        oracle-checked registry query on the shared events table."""
        from documents_vector_search_spark.operators.sessions import (
            sessionize,
        )
        from documents_vector_search_spark import registry

        sf = "/root/testdata/sf0.001"
        reg = {
            (r["user_id"], r["session_id"]): (
                r["n_events"], r["session_start_us"], r["session_end_us"]
            )
            for r in registry.q_sessionize(spark, sf).collect()
        }
        ops = {
            (r["user"], r["session_id"]): (
                r["n_events"], r["session_start_us"], r["session_end_us"]
            )
            for r in sessionize(registry._events(spark, sf)).collect()
        }
        assert reg == ops
