"""As-of join operator: backward/forward, tolerance, left-join nulls."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("AAPL", _ts("2024-01-01 10:00:03"), 100),
            ("AAPL", _ts("2024-01-01 10:00:10"), 200),
            ("MSFT", _ts("2024-01-01 10:00:01"), 300),
            ("NVDA", _ts("2024-01-01 10:00:05"), 400),  # no quotes at all
        ],
        ["sym", "ts", "qty"],
    )
    quotes = spark.createDataFrame(
        [
            ("AAPL", _ts("2024-01-01 10:00:01"), 1.0),
            ("AAPL", _ts("2024-01-01 10:00:03"), 2.0),  # equal ts: inclusive
            ("AAPL", _ts("2024-01-01 10:00:09"), 3.0),
            ("MSFT", _ts("2024-01-01 10:00:02"), 9.0),  # after the only trade
        ],
        ["sym", "ts", "px"],
    )
    return trades, quotes


class TestAsofJoin:
    def test_backward(self, trades_quotes):
        trades, quotes = trades_quotes
        out = asof_join(trades, quotes, on="sym")
        rows = {(r.sym, r.qty): r for r in out.collect()}
        assert len(rows) == 4  # every left row survives
        assert rows[("AAPL", 100)].px_r == 2.0  # equal-ts quote matches
        assert rows[("AAPL", 200)].px_r == 3.0
        assert rows[("MSFT", 300)].px_r is None  # quote is later
        assert rows[("NVDA", 400)].px_r is None  # no right rows for key

    def test_forward(self, trades_quotes):
        trades, quotes = trades_quotes
        out = asof_join(trades, quotes, on="sym", direction="forward")
        rows = {(r.sym, r.qty): r for r in out.collect()}
        assert rows[("AAPL", 100)].px_r == 2.0  # inclusive at equal ts
        assert rows[("AAPL", 200)].px_r is None  # nothing at/after 10s
        assert rows[("MSFT", 300)].px_r == 9.0

    def test_tolerance(self, trades_quotes):
        trades, quotes = trades_quotes
        out = asof_join(trades, quotes, on="sym", tolerance_s=1.0)
        rows = {(r.sym, r.qty): r for r in out.collect()}
        assert rows[("AAPL", 100)].px_r == 2.0  # age 0s
        assert rows[("AAPL", 200)].px_r == 3.0  # age exactly 1.0s: inclusive

        tight = asof_join(trades, quotes, on="sym", tolerance_s=0.5)
        rows = {(r.sym, r.qty): r for r in tight.collect()}
        assert rows[("AAPL", 100)].px_r == 2.0  # age 0s survives
        assert rows[("AAPL", 200)].px_r is None  # age 1.0s > 0.5s: nulled
        assert rows[("AAPL", 200)].ts_r is None

    def test_single_shuffle_plan(self, trades_quotes):
        trades, quotes = trades_quotes
        plan = (
            asof_join(trades, quotes, on="sym")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one Exchange for the window; no join operators at all
        assert plan.count("Exchange hashpartitioning") == 1
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan

    def test_bad_direction(self, trades_quotes):
        trades, quotes = trades_quotes
        with pytest.raises(ValueError, match="direction"):
            asof_join(trades, quotes, on="sym", direction="nearest")


class TestAsofCompositeKey:
    def test_multi_column_key(self, spark):
        from datetime import datetime

        left = spark.createDataFrame(
            [("A", "x", datetime(2024, 1, 1, 10, 0, 5), 1),
             ("A", "y", datetime(2024, 1, 1, 10, 0, 5), 2)],
            ["k1", "k2", "ts", "n"],
        )
        right = spark.createDataFrame(
            [("A", "x", datetime(2024, 1, 1, 10, 0, 1), 10.0),
             ("A", "y", datetime(2024, 1, 1, 10, 0, 2), 20.0)],
            ["k1", "k2", "ts", "v"],
        )
        out = asof_join(left, right, on=["k1", "k2"])
        rows = {r.n: r for r in out.collect()}
        # composite key: (A,x) must NOT see (A,y)'s quote
        assert rows[1].v_r == 10.0
        assert rows[2].v_r == 20.0


class TestAsofBucketed:
    """coarse_bucket_s mega-key mitigation: identical results to the
    single-window path, with per-key windows split by time bucket."""

    def test_matches_base_on_fixture(self, trades_quotes):
        trades, quotes = trades_quotes
        base = asof_join(trades, quotes, on="sym")
        bucketed = asof_join(trades, quotes, on="sym", coarse_bucket_s=4.0)
        key = lambda r: (r.sym, r.qty)  # noqa: E731
        b = {key(r): (r.ts_r, r.px_r) for r in base.collect()}
        g = {key(r): (r.ts_r, r.px_r) for r in bucketed.collect()}
        assert b == g

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_matches_base_on_random_mega_key(self, spark, direction):
        """One key, thousands of rows, bucket boundaries everywhere —
        both formulations must agree row for row (carry-in correctness
        across empty and occupied buckets alike)."""
        import random

        rng = random.Random(7)
        n_r, n_l = 3000, 500
        right_rows = [
            ("k", float(rng.randrange(0, 100_000)), float(i))
            for i in range(n_r)
        ]
        # unique (key, ts) per the operator's determinism contract
        seen = {}
        for k, ts, v in right_rows:
            seen[ts] = (k, ts, v)
        right_rows = list(seen.values())
        left_rows = [
            ("k", float(rng.randrange(0, 100_000)), i) for i in range(n_l)
        ]
        right = spark.createDataFrame(right_rows, ["key", "ts", "v"])
        left = spark.createDataFrame(left_rows, ["key", "ts", "n"])

        base = asof_join(
            left, right, on="key", direction=direction, tolerance_s=5000.0
        )
        bucketed = asof_join(
            left, right, on="key", direction=direction, tolerance_s=5000.0,
            coarse_bucket_s=1000.0,
        )
        b = {r.n: (r.ts_r, r.v_r) for r in base.collect()}
        g = {r.n: (r.ts_r, r.v_r) for r in bucketed.collect()}
        assert b == g

    def test_window_partitions_include_time_bucket(self, trades_quotes):
        """The event-level window must partition by (key, bucket) —
        that's the whole point: no task sorts a full key history."""
        trades, quotes = trades_quotes
        plan = (
            asof_join(trades, quotes, on="sym", coarse_bucket_s=60.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "_tb" in plan
        assert "hashpartitioning(sym" in plan and "_tb" in plan


class TestIntervalJoin:
    def test_containment_and_overlaps(self, spark):
        """Events land in every interval containing them (overlapping
        windows duplicate by design), [start, end) boundaries are
        half-open, and results match a brute-force join."""
        from datetime import datetime

        from documents_vector_search_spark.operators.interval_join import (
            interval_join,
        )

        ev = spark.createDataFrame(
            [
                (1, datetime(2024, 1, 1, 12)),
                (2, datetime(2024, 1, 3, 0)),    # exactly at wA start
                (3, datetime(2024, 1, 5, 0)),    # exactly at wA end (excluded)
                (4, datetime(2024, 2, 1, 0)),    # outside everything
            ],
            ["event_id", "ts"],
        )
        iv = spark.createDataFrame(
            [
                ("wA", datetime(2024, 1, 3), datetime(2024, 1, 5)),
                ("wB", datetime(2024, 1, 1), datetime(2024, 1, 4)),  # overlaps wA
            ],
            ["label", "start", "end"],
        )
        got = {
            (r.event_id, r.label)
            for r in interval_join(ev, iv, bin_seconds=3600).collect()
        }
        assert got == {(1, "wB"), (2, "wA"), (2, "wB")}

    def test_shared_column_names_and_bin_passthrough(self, spark):
        """Both sides may carry overlapping column names (qualified
        containment predicate), and a caller's own _bin-style column
        must survive untouched."""
        from datetime import datetime

        from documents_vector_search_spark.operators.interval_join import (
            interval_join,
        )

        ev = spark.createDataFrame(
            [(1, datetime(2024, 1, 2), "ev", 7)],
            ["event_id", "ts", "start", "_bin"],  # clashing names
        )
        iv = spark.createDataFrame(
            [("w", datetime(2024, 1, 1), datetime(2024, 1, 3))],
            ["label", "start", "end"],
        )
        got = interval_join(ev, iv).collect()
        assert len(got) == 1
        assert got[0]._bin == 7  # caller's column passed through
        assert got[0].label == "w"

    def test_bin_width_never_changes_results(self, spark):
        """Binning is pure physical strategy: any bin width yields the
        identical joined set."""
        from datetime import datetime, timedelta

        from documents_vector_search_spark.operators.interval_join import (
            interval_join,
        )

        base = datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [(i, base + timedelta(hours=7 * i)) for i in range(60)],
            ["event_id", "ts"],
        )
        iv = spark.createDataFrame(
            [
                ("a", base + timedelta(days=1), base + timedelta(days=4)),
                ("b", base + timedelta(days=3, hours=5), base + timedelta(days=9)),
            ],
            ["label", "start", "end"],
        )
        results = [
            sorted(
                (r.event_id, r.label)
                for r in interval_join(ev, iv, bin_seconds=w).collect()
            )
            for w in (600, 3600, 86400, 7 * 86400)
        ]
        assert all(r == results[0] for r in results)
        assert len(results[0]) > 0
