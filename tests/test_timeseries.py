"""Time-series operators (operators/timeseries.py) + journey/
inequality additions (paths.top_paths, profiling.spend_concentration):
semantic pins the DuckDB oracle hash cannot express — spike detection,
gap filling, caps, and closed-form Gini values."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.paths import top_paths
from documents_vector_search_spark.operators.profiling import (
    spend_concentration,
)
from documents_vector_search_spark.operators.timeseries import (
    resample_daily,
    rolling_zscore,
)

SCHEMA = "event_id bigint, ts timestamp, user_id string, event_type string, value double"


def _ev(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _day(d):
    return dt.datetime(2024, 1, d, 12, 0, 0)


class TestRollingZscore:
    def test_flat_baseline_spike_is_flagged(self, spark):
        """Ten identical days then a 10× day: the spike must flag; the
        flat days must not (zero variance -> z NULL, flag false)."""
        rows = [(i, _day(i + 1), "u", "click", 10.0) for i in range(10)]
        rows.append((99, _day(11), "u", "click", 100.0))
        out = rolling_zscore(_ev(spark, rows)).collect()
        by_day = {r["day"].day: r for r in out}
        assert by_day[11]["is_anomaly"] is True
        # flat-baseline days: variance 0 -> no z, no flag
        for d in range(4, 11):
            assert by_day[d]["is_anomaly"] is False
            assert by_day[d]["z"] is None

    def test_short_baseline_never_flags(self, spark):
        """min_periods=3: days 1-3 have <3 trailing days — no flag even
        for wild values."""
        rows = [
            (1, _day(1), "u", "click", 1.0),
            (2, _day(2), "u", "click", 1000.0),
            (3, _day(3), "u", "click", 0.5),
        ]
        out = rolling_zscore(_ev(spark, rows)).collect()
        assert all(r["is_anomaly"] is False for r in out)
        assert all(r["z"] is None for r in out)

    def test_flag_matches_float_z_off_boundary(self, spark):
        """Away from the τ boundary the integer inequality and the
        reported float z agree: |z| > 3 ⟺ flagged."""
        vals = [10.0, 12.0, 11.0, 13.0, 9.0, 11.5, 10.5, 12.5, 60.0, 11.0]
        rows = [(i, _day(i + 1), "u", "click", v) for i, v in enumerate(vals)]
        for r in rolling_zscore(_ev(spark, rows)).collect():
            if r["z"] is not None:
                assert (abs(r["z"]) > 3) == bool(r["is_anomaly"])

    def test_window_excludes_self(self, spark):
        """The day under test is NOT part of its own baseline: a lone
        spike after a noisy-but-stable week flags even though including
        it would inflate the std enough to hide it."""
        vals = [10.0, 11.0, 10.0, 11.0, 10.0, 11.0, 10.0, 25.0]
        rows = [(i, _day(i + 1), "u", "click", v) for i, v in enumerate(vals)]
        out = {r["day"].day: r for r in rolling_zscore(_ev(spark, rows)).collect()}
        assert out[8]["is_anomaly"] is True


class TestResampleDaily:
    def test_missing_days_filled_with_zeros(self, spark):
        rows = [
            (1, _day(1), "u", "click", 5.0),
            (2, _day(4), "u", "click", 7.0),
        ]
        out = resample_daily(_ev(spark, rows)).orderBy("day").collect()
        assert [r["day"].day for r in out] == [1, 2, 3, 4]
        assert [r["n"] for r in out] == [1, 0, 0, 1]
        assert [r["total"] for r in out] == [5.0, 0.0, 0.0, 7.0]
        assert [r["cum_total"] for r in out] == [5.0, 5.0, 5.0, 12.0]

    def test_every_series_gets_the_full_spine(self, spark):
        """A series observed on one day still spans the global range."""
        rows = [
            (1, _day(1), "u", "click", 1.0),
            (2, _day(5), "u", "click", 1.0),
            (3, _day(3), "u", "error", 2.0),
        ]
        out = resample_daily(_ev(spark, rows))
        counts = dict(
            out.groupBy("series").count().collect()
        )
        assert counts == {"click": 5, "error": 5}


class TestTopPaths:
    def test_cap_and_ordering(self, spark):
        """A 10-event user contributes a 5-step path in (ts, event_id)
        order; counts rank deterministically."""
        rows = [(i, _day(1 + i), "u1", t, 1.0)
                for i, t in enumerate("abcdefghij")]
        rows += [(100 + i, _day(1 + i), "u2", t, 1.0)
                 for i, t in enumerate("abcde")]
        rows += [(200 + i, _day(1 + i), "u3", t, 1.0)
                 for i, t in enumerate("xy")]
        out = top_paths(_ev(spark, rows)).collect()
        assert out[0]["path"] == "a>b>c>d>e" and out[0]["n"] == 2
        assert out[1]["path"] == "x>y" and out[1]["n"] == 1

    def test_same_timestamp_ties_break_on_event_id(self, spark):
        ts = _day(1)
        rows = [(3, ts, "u", "c", 1.0), (1, ts, "u", "a", 1.0),
                (2, ts, "u", "b", 1.0)]
        out = top_paths(_ev(spark, rows)).collect()
        assert out[0]["path"] == "a>b>c"


class TestSpendConcentration:
    def test_perfect_equality(self, spark):
        rows = [(i, _day(1), f"u{i}", "purchase", 10.0) for i in range(8)]
        r = spend_concentration(_ev(spark, rows)).collect()[0]
        assert r["n_users"] == 8
        assert r["gini"] == 0.0
        # top decile = 1 of 8 users under ntile(10) -> 1/8 of spend
        assert r["top_decile_share"] == pytest.approx(0.125)

    def test_total_concentration(self, spark):
        """One whale, n-1 zero spenders: G = (n-1)/n exactly."""
        rows = [(i, _day(1), f"u{i}", "purchase", 0.0) for i in range(9)]
        rows.append((99, _day(1), "whale", "purchase", 500.0))
        r = spend_concentration(_ev(spark, rows)).collect()[0]
        assert r["gini"] == pytest.approx(0.9)
        assert r["top_decile_share"] == pytest.approx(1.0)
        assert r["total_spend"] == pytest.approx(500.0)

    def test_known_small_case(self, spark):
        """x = (1, 2, 3, 4): G = (2·(1+4+9+16) − 5·10)/(4·10) = 0.25."""
        rows = [(i, _day(1), f"u{i}", "purchase", float(i + 1))
                for i in range(4)]
        r = spend_concentration(_ev(spark, rows)).collect()[0]
        assert r["gini"] == pytest.approx(0.25)

    def test_no_unpartitioned_window(self, spark):
        """The two-phase global rank (r10 verdict #5) must leave NO
        unpartitioned Window in the plan: every windowspecdefinition
        is keyed by the physical range-partition id."""
        rows = [(i, _day(1), f"u{i}", "purchase", float(i + 1))
                for i in range(4)]
        plan = (
            spend_concentration(_ev(spark, rows))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_specs = plan.count("windowspecdefinition(")
        assert n_specs >= 1  # the per-partition row_number survives
        assert n_specs == plan.count("windowspecdefinition(_pid")

    def test_many_partitions_rank_parity(self, spark):
        """Ranks from the two-phase path must equal the single global
        row_number — exercised with enough users that the range
        exchange actually spreads over multiple partitions."""
        rows = [
            (i, _day(1 + i % 9), f"u{i:03d}", "purchase", float((i * 37) % 101))
            for i in range(200)
        ]
        r = spend_concentration(_ev(spark, rows)).collect()[0]
        # pure-Python twin of the rank-formula Gini in integer cents
        spend = {}
        for _i, _ts, u, _t, v in rows:
            import math

            spend[u] = spend.get(u, 0) + int(math.floor(v * 100 + 0.5))
        xs = [c for _u, c in sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))]
        n, tot = len(xs), sum(xs)
        iwx = sum((i + 1) * x for i, x in enumerate(xs))
        import math

        gini = math.floor((2 * iwx - (n + 1) * tot) * 1e6 / (n * tot) + 0.5) / 1e6
        top_k = (n + 9) // 10
        top = math.floor(sum(xs[-top_k:]) * 1e6 / tot + 0.5) / 1e6
        assert r["n_users"] == n
        assert r["gini"] == pytest.approx(gini, abs=1e-9)
        assert r["top_decile_share"] == pytest.approx(top, abs=1e-9)


class TestActiveUsers:
    """active_users (operators/timeseries.py): DAU/WAU laws on a hand
    fixture plus a brute-force parity sweep — wau(d) must equal the
    distinct-user union of the trailing window, computed naively."""

    def test_hand_fixture(self, spark):
        from documents_vector_search_spark.operators.timeseries import (
            active_users,
        )

        rows = [
            (1, _day(1), "a", "click", 1.0),
            (2, _day(1), "b", "click", 1.0),
            (3, _day(3), "a", "click", 1.0),
            (4, _day(9), "c", "click", 1.0),  # > 7 days after day 1
        ]
        out = {r["day"].day: r for r in active_users(_ev(spark, rows)).collect()}
        assert set(out) == {1, 3, 9}  # inactive days emit no row
        assert out[1]["dau"] == 2 and out[1]["wau"] == 2
        assert out[3]["dau"] == 1 and out[3]["wau"] == 2  # a,b in window
        # day 9's window is days 3-9: a (day 3) still in, day-1 users out
        assert out[9]["dau"] == 1 and out[9]["wau"] == 2

    def test_brute_force_parity(self, spark):
        from documents_vector_search_spark.operators.timeseries import (
            active_users,
        )

        rows = [
            (i, _day(1 + (i * 7) % 20), f"u{i % 11}", "click", 1.0)
            for i in range(120)
        ]
        got = {
            r["day"].day: (r["dau"], r["wau"])
            for r in active_users(_ev(spark, rows), window_days=7).collect()
        }
        days: dict[int, set] = {}
        for i, ts, u, _t, _v in rows:
            days.setdefault(ts.day, set()).add(u)
        for d, users in days.items():
            wau = set()
            for back in range(7):
                wau |= days.get(d - back, set())
            assert got[d] == (len(users), len(wau)), d

    def test_wau_at_least_dau_and_single_day_equal(self, spark):
        from documents_vector_search_spark.operators.timeseries import (
            active_users,
        )

        rows = [(i, _day(5), f"u{i}", "click", 1.0) for i in range(6)]
        out = active_users(_ev(spark, rows)).collect()
        assert len(out) == 1
        assert out[0]["dau"] == out[0]["wau"] == 6


class TestValuePercentilesContract:
    """value_percentiles (operators/profiling.py): the exact-vs-approx
    contract — identical on integer-rank quantiles of a tie-free
    fixture, and the approx path returns an ELEMENT (never an
    interpolation) where the exact path interpolates."""

    ROWS = [
        (i, _day(1), f"u{i}", "a", float(v))
        for i, v in enumerate([10, 20, 30, 40, 50])
    ]

    def test_exact_equals_approx_on_integer_ranks(self, spark):
        from documents_vector_search_spark.operators.profiling import (
            value_percentiles,
        )

        ev = _ev(spark, self.ROWS)
        # n=5: ranks p*(n-1)+1 = 2, 3, 4 — all integer, both paths exact
        exact = value_percentiles(ev, probs=(0.25, 0.5, 0.75)).collect()[0]
        approx = value_percentiles(
            ev, probs=(0.25, 0.5, 0.75), approx=True
        ).collect()[0]
        assert (exact["p25"], exact["p50"], exact["p75"]) == (20.0, 30.0, 40.0)
        assert (approx["p25"], approx["p50"], approx["p75"]) == (
            20.0,
            30.0,
            40.0,
        )
        assert exact["n"] == approx["n"] == 5

    def test_p95_divergence_is_the_documented_one(self, spark):
        from documents_vector_search_spark.operators.profiling import (
            value_percentiles,
        )

        ev = _ev(spark, self.ROWS)
        exact = value_percentiles(ev, probs=(0.95,)).collect()[0]
        approx = value_percentiles(ev, probs=(0.95,), approx=True).collect()[0]
        # exact interpolates: rank 0.95*4+1 = 4.8 -> 40 + 0.8*10
        assert exact["p95"] == pytest.approx(48.0)
        # approx returns an element of the group, never an interpolation
        assert approx["p95"] in (40.0, 50.0)
        assert approx["p95"] != exact["p95"]

    def test_fractional_percent_names_cannot_collide(self, spark):
        """ADVICE r11: p-column names derive from the full decimal —
        0.125 is p12_5 (Python round() would banker's-round it to p12)
        and near-misses like 0.245 vs 0.25 stay distinct columns."""
        from documents_vector_search_spark.operators.profiling import (
            value_percentiles,
        )

        ev = _ev(spark, self.ROWS)
        out = value_percentiles(ev, probs=(0.125, 0.245, 0.25))
        assert out.columns[1:4] == ["p12_5", "p24_5", "p25"]
        with pytest.raises(ValueError, match="duplicate"):
            value_percentiles(ev, probs=(0.25, 0.25))


class TestPlanShapes:
    def test_zscore_single_raw_shuffle(self, spark):
        """The rolling window runs over the per-day AGGREGATE: exactly
        one exchange keyed by the raw stream's (series, day), then the
        series-keyed window exchange — and no Python on the path."""
        rows = [(i, _day(1 + i % 9), "u", "click", 1.0) for i in range(40)]
        plan = rolling_zscore(_ev(spark, rows))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan

    def test_resample_spine_is_broadcast(self, spark):
        """The date spine must reach the series list as a broadcast —
        the corpus is never reshuffled to build the spine."""
        rows = [(i, _day(1 + i % 9), "u", "click", 1.0) for i in range(40)]
        plan = resample_daily(_ev(spark, rows))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "BatchEvalPython" not in plan


class TestAnomalyStream:
    """streaming/stateful.py::anomaly_stream — the rolling_zscore twin
    with per-series trailing-baseline state across micro-batches."""

    def test_matches_batch_on_closed_days(self, spark, tmp_path):
        """Two micro-batches splitting a 12-day series mid-window (and
        a query restart between them): every day closed by the stream
        must score exactly as the batch operator scores it; the final
        open day must not be emitted."""
        import datetime as dt

        from documents_vector_search_spark.streaming.stateful import (
            anomaly_stream,
        )

        src = tmp_path / "an_events"
        src.mkdir()
        ckpt = str(tmp_path / "an_ckpt")
        out = str(tmp_path / "an_out")
        schema = ("event_id long, ts timestamp, user_id string, "
                  "event_type string, value double")
        vals = [10.0, 12.0, 11.0, 13.0, 9.0, 11.5, 10.5, 12.5,
                60.0, 11.0, 10.0, 12.0]
        rows = [
            (i, dt.datetime(2024, 1, i + 1, 12, 0, 0), "u", "click", v)
            for i, v in enumerate(vals)
        ]

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out)

        def run(batch_rows):
            spark.createDataFrame(batch_rows, schema).coalesce(1) \
                .write.mode("append").parquet(str(src))
            q = (
                anomaly_stream(
                    spark.readStream.schema(schema).parquet(str(src))
                )
                .writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run(rows[:7])   # days 1-7; day 7 stays open
        run(rows[7:])   # days 8-12 after a restart; day 12 stays open

        got = {
            r["day"].day: r
            for r in spark.read.parquet(out).collect()
        }
        expected = {
            r["day"].day: r
            for r in rolling_zscore(_ev(spark, rows)).collect()
        }
        assert set(got) == {d for d in expected if d != 12}  # 12 open
        for d, g in got.items():
            e = expected[d]
            assert g["total"] == e["total"], d
            assert bool(g["is_anomaly"]) == bool(e["is_anomaly"]), d
            if e["z"] is None:
                assert g["z"] is None, d
            else:
                assert g["z"] == pytest.approx(e["z"], abs=1e-6), d
        assert got[9]["is_anomaly"] is True  # the 60.0 spike

    def test_late_day_dropped_and_state_bounded(self, spark, tmp_path):
        """An event for an already-closed day is dropped; the trailing
        state never exceeds window_days entries."""
        import datetime as dt

        from documents_vector_search_spark.streaming.stateful import (
            anomaly_stream,
        )

        src = tmp_path / "an2_events"
        src.mkdir()
        ckpt = str(tmp_path / "an2_ckpt")
        out = str(tmp_path / "an2_out")
        schema = ("event_id long, ts timestamp, user_id string, "
                  "event_type string, value double")

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out)

        def run(batch_rows):
            spark.createDataFrame(batch_rows, schema).coalesce(1) \
                .write.mode("append").parquet(str(src))
            q = (
                anomaly_stream(
                    spark.readStream.schema(schema).parquet(str(src)),
                    window_days=3,
                )
                .writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        b1 = [(i, dt.datetime(2024, 1, i + 1), "u", "click", 10.0)
              for i in range(6)]
        run(b1)
        # day 2 is long closed: this event must not resurface it
        run([(99, dt.datetime(2024, 1, 2, 6), "u", "click", 500.0),
             (100, dt.datetime(2024, 1, 7), "u", "click", 10.0)])

        got = spark.read.parquet(out).collect()
        days = sorted(r["day"].day for r in got)
        assert days == [1, 2, 3, 4, 5, 6]  # each day exactly once
        d2 = [r for r in got if r["day"].day == 2][0]
        assert d2["total"] == 10.0  # the late 500.0 never landed


class TestAttribution:
    def test_first_and_last_touch_credits(self, spark):
        """view→click→buy(10)→email→buy(20): first-touch credits view
        for both conversions; last-touch splits click/email."""
        rows = [
            (1, _day(1), "u", "view", 0.0),
            (2, _day(2), "u", "click", 0.0),
            (3, _day(3), "u", "purchase", 10.0),
            (4, _day(4), "u", "email", 0.0),
            (5, _day(5), "u", "purchase", 20.0),
        ]
        from documents_vector_search_spark.operators.paths import attribution

        out = {r["channel"]: r for r in
               attribution(_ev(spark, rows)).collect()}
        assert out["view"]["first_touch_n"] == 2
        assert out["view"]["first_touch_revenue"] == 30.0
        assert out["view"]["last_touch_n"] == 0
        assert out["click"]["last_touch_n"] == 1
        assert out["click"]["last_touch_revenue"] == 10.0
        assert out["email"]["last_touch_n"] == 1
        assert out["email"]["last_touch_revenue"] == 20.0

    def test_conversion_without_channel_is_none_bucket(self, spark):
        rows = [
            (1, _day(1), "u", "purchase", 5.0),
            (2, _day(2), "u", "view", 0.0),
            (3, _day(3), "u", "purchase", 7.0),
        ]
        from documents_vector_search_spark.operators.paths import attribution

        out = {r["channel"]: r for r in
               attribution(_ev(spark, rows)).collect()}
        assert out["(none)"]["first_touch_n"] == 1
        assert out["(none)"]["first_touch_revenue"] == 5.0
        assert out["view"]["last_touch_n"] == 1
        assert out["view"]["last_touch_revenue"] == 7.0


class TestAbTest:
    def test_assignment_is_md5_stable(self, spark):
        from documents_vector_search_spark.functions.hashing import (
            md5_hash64_py,
        )
        from documents_vector_search_spark.operators.experiments import (
            assign_variant,
        )

        df = spark.createDataFrame(
            [(f"user{i}",) for i in range(40)], "u string"
        ).select("u", assign_variant(F.col("u")).alias("v"))
        for r in df.collect():
            assert r["v"] == md5_hash64_py(r["u"]) % 2

    def test_welch_z_matches_reference_math(self, spark):
        """Closed-form check against a plain-Python Welch computation
        over the same deterministic assignment."""
        import math

        from documents_vector_search_spark.functions.hashing import (
            md5_hash64_py,
        )
        from documents_vector_search_spark.operators.experiments import (
            ab_test,
        )

        rows = []
        spend = {}
        for i in range(60):
            u = f"u{i}"
            v = (i % 7) * 2.5 + 1.0
            rows.append((i, _day(1 + i % 20), u, "purchase", v))
            spend[u] = spend.get(u, 0) + round(v * 100)
            if i % 3 == 0:  # noise events must not count
                rows.append((1000 + i, _day(2), u, "view", 99.0))
        r = ab_test(_ev(spark, rows)).collect()[0]
        xa = [c for u, c in spend.items() if md5_hash64_py(str(u)) % 2 == 0]
        xb = [c for u, c in spend.items() if md5_hash64_py(str(u)) % 2 == 1]
        assert r["n_a"] == len(xa) and r["n_b"] == len(xb)
        ma, mb = sum(xa) / len(xa), sum(xb) / len(xb)
        va = sum((x - ma) ** 2 for x in xa) / (len(xa) - 1)
        vb = sum((x - mb) ** 2 for x in xb) / (len(xb) - 1)
        z = (ma - mb) / math.sqrt(va / len(xa) + vb / len(xb))
        assert r["z"] == pytest.approx(z, abs=1e-5)
        assert r["mean_a"] == pytest.approx(ma / 100.0, abs=1e-6)

    def test_intent_to_treat_includes_non_converters(self, spark):
        """A user with only view events still lands in a variant with
        metric 0 — the denominator is ASSIGNED users."""
        rows = [(1, _day(1), "buyer", "purchase", 10.0),
                (2, _day(1), "lurker1", "view", 0.0),
                (3, _day(1), "lurker2", "view", 0.0),
                (4, _day(1), "lurker3", "view", 0.0)]
        from documents_vector_search_spark.operators.experiments import (
            ab_test,
        )

        r = ab_test(_ev(spark, rows)).collect()[0]
        assert r["n_a"] + r["n_b"] == 4


class TestAnomalyCLI:
    def test_cli_flags_spike_and_exit_code(self, spark, tmp_path, capsys):
        import json

        from documents_vector_search_spark import cli

        rows = [(i, _day(i + 1), "u", "click", 10.0) for i in range(10)]
        rows.append((99, _day(11), "u", "click", 100.0))
        src = str(tmp_path / "ev")
        _ev(spark, rows).write.parquet(src)
        rc = cli.main(["anomaly", "--input", src, "--format", "json"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 1  # anomalies exist -> gate-able exit code
        assert out["nAnomalies"] == 1
        assert out["days"][0]["day"].startswith("2024-01-11")

    def test_cli_quiet_corpus_exits_zero(self, spark, tmp_path, capsys):
        from documents_vector_search_spark import cli

        rows = [(i, _day(i + 1), "u", "click", 10.0 + (i % 2))
                for i in range(10)]
        src = str(tmp_path / "ev_ok")
        _ev(spark, rows).write.parquet(src)
        rc = cli.main(["anomaly", "--input", src])
        capsys.readouterr()
        assert rc == 0


class TestAttributionMultitouch:
    """attribution_multitouch (operators/paths.py): linear and
    U-shaped credit over the touches since the previous conversion —
    semantics pins plus a DuckDB twin replaying the same windows and
    integer floor-division (the oracle-grade check; no registry slot —
    rotation capacity is saturated at 156 keys, registry candidate
    when capacity allows)."""

    ROWS = [
        # u1: view,click -> buy(10); email -> buy(20); trailing view
        (1, _day(1), "u1", "view", 0.0),
        (2, _day(2), "u1", "click", 0.0),
        (3, _day(3), "u1", "purchase", 10.0),
        (4, _day(4), "u1", "email", 0.0),
        (5, _day(5), "u1", "purchase", 20.0),
        (6, _day(6), "u1", "view", 0.0),       # after last conv: dropped
        # u2: three touches then one conversion (position: 40/20/40)
        (7, _day(1), "u2", "view", 0.0),
        (8, _day(2), "u2", "email", 0.0),
        (9, _day(3), "u2", "click", 0.0),
        (10, _day(4), "u2", "purchase", 100.0),
        # u3: conversion with no touches: contributes nothing
        (11, _day(1), "u3", "purchase", 7.0),
    ]

    def test_linear_credits(self, spark):
        from documents_vector_search_spark.operators.paths import (
            attribution_multitouch,
        )

        out = {
            r["channel"]: r
            for r in attribution_multitouch(_ev(spark, self.ROWS)).collect()
        }
        # u1 conv1 (10): view+click share 5/5; conv2 (20): email alone;
        # u2 conv (100): view/email/click share 33.333333 each (floor)
        assert out["view"]["touches"] == 2
        assert out["view"]["conversions_touched"] == 2
        assert abs(out["view"]["credit"] - (5.0 + 100.0 / 3)) < 1e-4
        assert abs(out["click"]["credit"] - (5.0 + 100.0 / 3)) < 1e-4
        assert abs(out["email"]["credit"] - (20.0 + 100.0 / 3)) < 1e-4
        # conservation: total credit <= total converted value with
        # touches (30 + 100), within floor loss
        total = sum(r["credit"] for r in out.values())
        assert 129.999 < total <= 130.0

    def test_position_credits(self, spark):
        from documents_vector_search_spark.operators.paths import (
            attribution_multitouch,
        )

        out = {
            r["channel"]: r
            for r in attribution_multitouch(
                _ev(spark, self.ROWS), model="position"
            ).collect()
        }
        # u2's 100: view(first)=40, click(last)=40, email(middle)=20;
        # u1 conv1 n=2: 5/5, conv2 n=1: email gets all 20
        assert abs(out["view"]["credit"] - 45.0) < 1e-6
        assert abs(out["click"]["credit"] - 45.0) < 1e-6
        assert abs(out["email"]["credit"] - 40.0) < 1e-6

    def test_matches_duckdb_twin_linear(self, spark):
        import duckdb

        from documents_vector_search_spark.operators.paths import (
            attribution_multitouch,
        )

        got = sorted(
            (r["channel"], r["touches"], r["conversions_touched"],
             round(r["credit"], 6))
            for r in attribution_multitouch(_ev(spark, self.ROWS)).collect()
        )
        con = duckdb.connect()
        con.sql(
            "CREATE TABLE ev AS SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, TIMESTAMP '{ts}', '{u}', '{t}', {v})"
                for i, ts, u, t, v in self.ROWS
            )
            + ") t(event_id, ts, user_id, event_type, value)"
        )
        rows = con.sql("""
WITH staged AS (
  SELECT *, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS g
  FROM ev
),
grp AS (
  SELECT *,
    sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id, g) AS n,
    max(CASE WHEN event_type = 'purchase'
             THEN CAST(floor(value * 100 + 0.5) AS BIGINT) * 1000000 END)
      OVER (PARTITION BY user_id, g) AS conv_vm
  FROM staged WHERE g > 0
),
touches AS (
  SELECT event_type AS channel, user_id, g, conv_vm // n AS credit_m
  FROM grp
  WHERE event_type <> 'purchase' AND conv_vm IS NOT NULL
)
SELECT channel, count(*)::BIGINT AS touches,
       count(DISTINCT (user_id, g))::BIGINT AS conversions_touched,
       round(sum(credit_m) / 1e8, 6) AS credit
FROM touches GROUP BY channel ORDER BY channel
""").fetchall()
        assert got == [tuple(r) for r in rows]


class TestCusumChangepoints:
    """cusum_changepoints (operators/timeseries.py): the clamp-at-zero
    closed form (prefix sum minus running extremum) must equal the
    textbook sequential recurrence exactly, and a deliberate level
    shift must flag while the pre-shift plateau stays quiet."""

    @staticmethod
    def _reference(xs, slack_pct, threshold_pct):
        """Sequential Page (1954) recurrence in scaled integer units."""
        d = len(xs)
        mu = sum(xs)  # x scaled by d, mu = plain sum
        k = mu * slack_pct // 100
        h = mu * threshold_pct // 100
        s_hi = s_lo = 0
        out = []
        for x in xs:
            xs_scaled = x * d
            s_hi = max(0, s_hi + xs_scaled - mu - k)
            s_lo = max(0, s_lo - (xs_scaled - mu + k))
            out.append((s_hi > h, s_lo > h))
        return out

    def test_matches_sequential_recurrence(self, spark):
        from documents_vector_search_spark.operators.timeseries import (
            cusum_changepoints,
        )

        # 6 quiet days at ~100 then a sustained jump to 400
        vals = [100.0, 102.0, 98.0, 101.0, 99.0, 100.0,
                400.0, 410.0, 390.0, 405.0]
        rows = [
            (i + 1, _day(i + 1), "u", "volume", v)
            for i, v in enumerate(vals)
        ]
        got = [
            (r["shift_up"], r["shift_down"])
            for r in cusum_changepoints(
                _ev(spark, rows), threshold_pct=100
            ).collect()
        ]
        expect = self._reference(
            [int(v * 100) for v in vals], 50, 100
        )
        assert got == expect
        assert got[0][0] is False and got[-1][0] is True  # shift caught
        assert not any(dn for _, dn in got)  # no down-shift here

    def test_down_shift_flags_mirror(self, spark):
        from documents_vector_search_spark.operators.timeseries import (
            cusum_changepoints,
        )

        vals = [400.0, 410.0, 390.0, 405.0, 100.0, 102.0, 98.0, 99.0,
                101.0, 100.0]
        rows = [
            (i + 1, _day(i + 1), "u", "volume", v)
            for i, v in enumerate(vals)
        ]
        got = [
            (r["shift_up"], r["shift_down"])
            for r in cusum_changepoints(
                _ev(spark, rows), slack_pct=20, threshold_pct=100
            ).collect()
        ]
        expect = self._reference([int(v * 100) for v in vals], 20, 100)
        assert got == expect
        assert got[-1][1] is True and got[0][1] is False


class TestCusumStream:
    """streaming/stateful.py::cusum_stream — the known-target CUSUM
    twin: days closed by the stream (across a restart) must carry the
    SAME (S+, S-, flags) trajectory as the batch operator's
    target_c form."""

    def test_matches_batch_target_form_across_restart(self, spark, tmp_path):
        import datetime as dt

        from documents_vector_search_spark.operators.timeseries import (
            cusum_changepoints,
        )
        from documents_vector_search_spark.streaming.stateful import (
            cusum_stream,
        )

        src = tmp_path / "cu_events"
        src.mkdir()
        ckpt = str(tmp_path / "cu_ckpt")
        out = str(tmp_path / "cu_out")
        schema = ("event_id long, ts timestamp, user_id string, "
                  "event_type string, value double")
        vals = [100.0, 102.0, 98.0, 101.0, 99.0, 100.0,
                400.0, 410.0, 390.0, 405.0]
        rows = [
            (i, dt.datetime(2024, 1, i + 1, 12), "u", "click", v)
            for i, v in enumerate(vals)
        ]

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out)

        def run(batch_rows):
            spark.createDataFrame(batch_rows, schema).coalesce(1) \
                .write.mode("append").parquet(str(src))
            q = (
                cusum_stream(
                    spark.readStream.schema(schema).parquet(str(src)),
                    target_c=10000,  # 100.00 — the quiet level
                    threshold_pct=100,
                )
                .writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run(rows[:6])   # days 1-6; day 6 stays open
        run(rows[6:])   # restart; days 7-10, day 10 stays open

        got = {
            r["day"].day: (r["cusum_hi_c"], r["cusum_lo_c"],
                           bool(r["shift_up"]), bool(r["shift_down"]))
            for r in spark.read.parquet(out).collect()
        }
        expected = {
            r["day"].day: (r["cusum_hi_c"], r["cusum_lo_c"],
                           bool(r["shift_up"]), bool(r["shift_down"]))
            for r in cusum_changepoints(
                _ev(spark, rows), target_c=10000, threshold_pct=100
            ).collect()
        }
        assert set(got) == {d for d in expected if d != 10}  # 10 open
        for d, g in got.items():
            assert g == expected[d], f"day {d}"
        # the sustained 400-level shift must have flagged by day 9
        assert got[9][2] is True


class TestUserBurstiness:
    def _fixture(self, spark):
        base = dt.datetime(2024, 1, 1)

        def at(s):
            return base + dt.timedelta(seconds=s)

        rows = (
            # metronome: gaps 10, 10, 10
            [(i, at(s), "metro", "a", 1.0) for i, s in enumerate([0, 10, 20, 30])]
            # bursty: gaps 1, 1, 100
            + [(10 + i, at(s), "burst", "a", 1.0) for i, s in enumerate([0, 1, 2, 102])]
            # one event: no gaps -> filtered by min_gaps
            + [(20, at(0), "lone", "a", 1.0)]
            # all ties: gaps 0, 0 -> S = 0 -> NULL cv/burstiness
            + [(30 + i, at(7), "tied", "a", 1.0) for i in range(3)]
        )
        return _ev(spark, rows)

    def test_metronome_and_burst_exact(self, spark):
        from documents_vector_search_spark.operators.timeseries import (
            user_burstiness,
        )

        got = {
            r.user: r for r in user_burstiness(self._fixture(spark)).collect()
        }
        m = got["metro"]
        assert (m.n_events, m.n_gaps, m.mean_gap_s) == (4, 3, 10.0)
        assert m.cv == 0.0 and m.burstiness == -1.0  # zero variance
        b = got["burst"]
        # S=102, Q=10002, n=3: r=sqrt(3*10002-102^2)=sqrt(19602)
        import math

        r = math.sqrt(19602)
        assert b.mean_gap_s == 34.0
        assert b.cv == round(r / 102, 6)
        assert b.burstiness == round((r - 102) / (r + 102), 6)
        assert b.burstiness > 0  # bursty side of Poisson

    def test_min_gaps_filter_and_null_contract(self, spark):
        from documents_vector_search_spark.operators.timeseries import (
            user_burstiness,
        )

        got = {
            r.user: r for r in user_burstiness(self._fixture(spark)).collect()
        }
        assert "lone" not in got  # n_gaps 0 < min_gaps
        t = got["tied"]  # gaps all zero: mean 0, sigma/mu undefined
        assert (t.n_gaps, t.mean_gap_s) == (2, 0.0)
        assert t.cv is None and t.burstiness is None

    def test_tie_order_cannot_change_gaps(self, spark):
        """The gap multiset depends only on the sorted ts values —
        shuffling row order (and event ids) must not move any metric."""
        from documents_vector_search_spark.operators.timeseries import (
            user_burstiness,
        )

        base = dt.datetime(2024, 1, 1)
        rows1 = [
            (1, base, "u", "a", 1.0),
            (2, base, "u", "a", 1.0),
            (3, base + dt.timedelta(seconds=30), "u", "a", 1.0),
        ]
        rows2 = [rows1[1], rows1[2], rows1[0]]
        a = user_burstiness(_ev(spark, rows1)).collect()[0]
        b = user_burstiness(_ev(spark, rows2)).collect()[0]
        assert (a.mean_gap_s, a.cv, a.burstiness) == (
            b.mean_gap_s,
            b.cv,
            b.burstiness,
        )


class TestDauKmv:
    def test_under_k_keeps_all_hashes_and_matches_reference(self, spark):
        from documents_vector_search_spark.functions.hashing import (
            md5_hash64_py,
        )
        from documents_vector_search_spark.operators.timeseries import dau_kmv

        rows = []
        eid = 0
        for d, users in [(1, 5), (2, 3)]:
            for u in range(users):
                for _ in range(2):  # repeats must not change the sketch
                    rows.append((eid, _day(d), f"u{u}", "a", 1.0))
                    eid += 1
        got = {r.day.isoformat(): r for r in dau_kmv(_ev(spark, rows)).collect()}
        assert got["2024-01-01"].k_used == 5
        assert got["2024-01-02"].k_used == 3
        # the estimate is the exact KMV formula over the md5 hashes
        for day, users in [("2024-01-01", 5), ("2024-01-02", 3)]:
            hs = sorted(md5_hash64_py(f"u{u}") for u in range(users))
            est = round((users - 1) / (hs[-1] / float(1 << 60)), 6)
            assert got[day].est_dau == est

    def test_k_caps_the_sketch(self, spark):
        from documents_vector_search_spark.operators.timeseries import dau_kmv

        rows = [
            (i, _day(1), f"u{i}", "a", 1.0) for i in range(50)
        ]
        out = dau_kmv(_ev(spark, rows), k=8).collect()[0]
        assert out.k_used == 8
        # 50 distinct users, k=8: estimate within the ~1/sqrt(k) band
        assert 20 < out.est_dau < 120
