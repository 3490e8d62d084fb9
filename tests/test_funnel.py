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

    def test_empty_input_reports_all_stages_zero(self, events):
        rows = funnel_report(
            events.limit(0), ["view", "click", "purchase"]
        ).collect()
        assert [(r.stage, r.step, r.n_users, r.pct_of_first) for r in rows] == [
            (1, "view", 0, 0.0),
            (2, "click", 0, 0.0),
            (3, "purchase", 0, 0.0),
        ]

    def test_custom_event_id_column(self, events):
        renamed = events.withColumnRenamed("event_id", "eid_custom")
        got = {
            r.user: [t and str(t) for t in r.stage_ts]
            for r in funnel_stage_times(
                renamed,
                ["view", "click", "purchase"],
                event_id_col="eid_custom",
            ).collect()
        }
        # u4's same-ts tie still breaks on the renamed id column
        assert got[4][1] == "2024-01-01 00:00:00"


class TestFunnelSkewHatch:
    def test_bucketed_matches_direct_on_fixture(self, events):
        direct = {
            r.user: r.stage_ts
            for r in funnel_stage_times(
                events, ["view", "click", "purchase"]
            ).collect()
        }
        bucketed = {
            r.user: r.stage_ts
            for r in funnel_stage_times(
                events, ["view", "click", "purchase"], ts_bucket="1 minute"
            ).collect()
        }
        assert bucketed == direct

    def test_power_user_property(self, spark):
        """One user with ~1e5 events spanning months: the ts-bucketed
        two-level fold must produce IDENTICAL stage_ts to the direct
        fold, and its plan must stay UDF-free. Deterministic event
        types from a hash so completions happen mid-stream at
        unpredictable offsets."""
        n = 100_000
        ev = (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                F.lit(7).alias("user_id"),
                (
                    F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                    + F.make_interval(secs=F.col("id").cast("double") * 97)
                ).alias("ts"),
                F.element_at(
                    F.array(
                        F.lit("view"), F.lit("click"), F.lit("purchase"),
                        F.lit("noise_a"), F.lit("noise_b"), F.lit("noise_c"),
                        F.lit("noise_d"), F.lit("noise_e"),
                    ),
                    ((F.xxhash64(F.col("id")) % 8 + 8) % 8 + 1).cast("int"),
                ).alias("event_type"),
            )
        )
        steps = ["view", "click", "purchase"]
        direct = funnel_stage_times(ev, steps).collect()
        bucketed_df = funnel_stage_times(ev, steps, ts_bucket="1 day")
        bucketed = bucketed_df.collect()
        assert len(direct) == len(bucketed) == 1
        assert bucketed[0].stage_ts == direct[0].stage_ts
        assert all(t is not None for t in direct[0].stage_ts)
        plan = bucketed_df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan

    def test_report_with_bucket_matches_direct(self, events):
        a = funnel_report(events, ["view", "click", "purchase"]).collect()
        b = funnel_report(
            events, ["view", "click", "purchase"], ts_bucket="1 minute"
        ).collect()
        assert a == b


class TestFunnelLatency:
    def test_latency_stats(self, events):
        from documents_vector_search_spark.operators.funnel import (
            funnel_latency,
        )

        [r] = funnel_latency(events, ["view", "click", "purchase"]).collect()
        # u1 u2 u3 u4 entered; only u1 converted (120s view->purchase)
        assert r.n_entered == 4 and r.n_converted == 1
        assert r.conversion_rate == 0.25
        assert r.p50_seconds == 120.0 and r.mean_seconds == 120.0

    def test_no_conversions_yields_null_percentiles(self, events):
        from documents_vector_search_spark.operators.funnel import (
            funnel_latency,
        )

        [r] = funnel_latency(
            events, ["view", "click", "signup_never_happens"]
        ).collect()
        assert r.n_converted == 0 and r.p50_seconds is None
        assert r.n_entered == 4


class TestFunnelWindowed:
    """funnel_windowed: conversion-window semantics with greedy
    restart — a pure-Python greedy reference replayed on random-ish
    fixtures, plus the three contract pins (expiry restarts, late
    conversion rejected, mid-attempt entry NOT forked)."""

    STEPS = ["view", "click", "purchase"]

    @staticmethod
    def _ev(spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    @classmethod
    def _greedy(cls, evs, window_s):
        """Pure-Python greedy windowed funnel over (ts_s, eid, tp)."""
        import datetime as dt

        done, cur = None, [None] * len(cls.STEPS)
        for ts_s, eid, tp in sorted(evs):
            if done:
                break
            t = dt.datetime.fromisoformat(ts_s)
            if cur[0] is not None and (
                t - dt.datetime.fromisoformat(cur[0])
            ).total_seconds() > window_s:
                cur = [None] * len(cls.STEPS)
            n = sum(1 for x in cur if x is not None)
            if n < len(cls.STEPS) and cls.STEPS[n] == tp:
                cur[n] = ts_s
                if n + 1 == len(cls.STEPS):
                    done = list(cur)
        return done or cur

    def test_expiry_restarts_and_converts(self, spark):
        rows = [
            # attempt 1 opens at 00:00, expires (window 10 min)
            (1, 1, "2024-01-01 00:00:00", "view"),
            (2, 1, "2024-01-01 00:05:00", "click"),
            # attempt 2: full conversion inside the window
            (3, 1, "2024-01-01 00:20:00", "view"),
            (4, 1, "2024-01-01 00:21:00", "click"),
            (5, 1, "2024-01-01 00:25:00", "purchase"),
        ]
        from documents_vector_search_spark.operators.funnel import (
            funnel_windowed,
        )

        out = funnel_windowed(
            self._ev(spark, rows), self.STEPS, "10 minutes"
        ).collect()
        got = [str(t)[:19] if t else None for t in out[0]["stage_ts"]]
        assert got == ["2024-01-01 00:20:00", "2024-01-01 00:21:00",
                       "2024-01-01 00:25:00"]

    def test_late_conversion_rejected_unbounded_accepts(self, spark):
        rows = [
            (1, 1, "2024-01-01 00:00:00", "view"),
            (2, 1, "2024-01-01 00:01:00", "click"),
            (3, 1, "2024-06-01 00:00:00", "purchase"),  # months later
        ]
        from documents_vector_search_spark.operators.funnel import (
            funnel_stage_times,
            funnel_windowed,
        )

        win = funnel_windowed(
            self._ev(spark, rows), self.STEPS, "7 days"
        ).collect()[0]["stage_ts"]
        unb = funnel_stage_times(self._ev(spark, rows), self.STEPS).collect()[
            0
        ]["stage_ts"]
        assert unb[2] is not None  # unbounded funnel converts
        assert win[2] is None  # windowed rejects; the June purchase
        # also expired the attempt, so stage 1/2 reset too
        assert win[0] is None and win[1] is None

    def test_greedy_no_fork_documented(self, spark):
        """A second view INSIDE the active attempt does not fork: the
        conversion reachable only from that later entry is missed —
        the documented greedy contract."""
        rows = [
            (1, 1, "2024-01-01 00:00:00", "view"),
            (2, 1, "2024-01-01 00:09:00", "view"),    # mid-attempt entry
            (3, 1, "2024-01-01 00:12:00", "click"),   # in window of e2 only
            (4, 1, "2024-01-01 00:15:00", "purchase"),
        ]
        from documents_vector_search_spark.operators.funnel import (
            funnel_windowed,
        )

        out = funnel_windowed(
            self._ev(spark, rows), self.STEPS, "10 minutes"
        ).collect()[0]["stage_ts"]
        # attempt from e1 expired at e3 (00:12 > 00:10); greedy restart
        # needs a NEW view after expiry, so nothing converts
        assert out[2] is None

    def test_matches_python_greedy_sweep(self, spark):
        """Deterministic pseudo-random schedules, Spark == greedy
        reference user-for-user."""
        from documents_vector_search_spark.operators.funnel import (
            funnel_windowed,
        )

        state, rows, eid = 987654321, [], 0
        per_user = {}
        types = ["view", "click", "purchase", "noise"]
        for u in range(1, 21):
            evs = []
            for j in range(12):
                state = (1103515245 * state + 12345) % (2**31)
                minute = state % 120
                state = (1103515245 * state + 12345) % (2**31)
                tp = types[state % 4]
                eid += 1
                ts_s = f"2024-01-01 {minute // 60:02d}:{minute % 60:02d}:00"
                evs.append((ts_s, eid, tp))
                rows.append((eid, u, ts_s, tp))
            per_user[u] = evs
        out = {
            r["user"]: [str(t)[:19] if t else None for t in r["stage_ts"]]
            for r in funnel_windowed(
                self._ev(spark, rows), self.STEPS, "30 minutes"
            ).collect()
        }
        for u, evs in per_user.items():
            assert out[u] == self._greedy(evs, 1800), f"user {u}"


class TestFunnelReportWindowPlumb:
    def test_windowed_report_and_exclusivity(self, spark, events):
        from documents_vector_search_spark.operators.funnel import (
            funnel_report,
        )

        rows = funnel_report(
            events, ["view", "click", "purchase"], window="1 minute"
        ).collect()
        # u1's purchase at +2min EXPIRES its attempt (greedy reset, no
        # later re-entry), dropping u1 everywhere; u2/u3/u4 keep their
        # in-window stages; stage 3 converts nobody
        assert [(r.stage, r.n_users) for r in rows] == [(1, 3), (2, 2), (3, 0)]
        with pytest.raises(ValueError):
            funnel_report(
                events, ["view", "click"], window="1 day", ts_bucket="1 day"
            )


class TestFunnelLatencyWindowPlumb:
    def test_windowed_latency_counts_windowed_walks(self, spark):
        from documents_vector_search_spark.operators.funnel import (
            funnel_latency,
        )

        rows = [
            # u1 converts in 2 minutes (inside a 5-minute window)
            (1, 1, "2024-01-01 00:00:00", "view"),
            (2, 1, "2024-01-01 00:01:00", "click"),
            (3, 1, "2024-01-01 00:02:00", "purchase"),
            # u2's purchase lands an hour later: outside the window
            (4, 2, "2024-01-01 00:00:00", "view"),
            (5, 2, "2024-01-01 00:01:00", "click"),
            (6, 2, "2024-01-01 01:00:00", "purchase"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        steps = ["view", "click", "purchase"]
        unb = funnel_latency(ev, steps).collect()[0]
        win = funnel_latency(ev, steps, window="5 minutes").collect()[0]
        assert unb["n_converted"] == 2
        assert win["n_converted"] == 1
        assert win["p50_seconds"] == 120.0
        import pytest as _pt

        with _pt.raises(ValueError):
            funnel_latency(ev, steps, window="1 day", ts_bucket="1 day")
