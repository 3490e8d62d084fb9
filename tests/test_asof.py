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
