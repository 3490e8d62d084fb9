"""Event path analysis: Markov transition counts over user journeys.

The product-analytics companion to funnel/retention (operators/
funnel.py, retention.py): instead of checking a FIXED step sequence,
count every observed (event → next event) transition over each user's
time-ordered stream — the first-order Markov view that answers "where
do users actually go after X", feeds next-step recommendation
baselines, and surfaces drop-off edges a predefined funnel misses.

Determinism: each user's walk is ordered by (ts, event_id) — a total
order (the funnel/sessionize convention), so same-timestamp events
resolve identically in any engine and the SQL oracle reproduces the
exact transitions with lead() over the same ordering.

Scale notes (100 TB): ONE user-keyed shuffle for the lead() window
(the same bound sessionization accepts), then an aggregation whose key
space is |event types|² — map-side combinable into a tiny reduce. No
self-joins, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Transition counts — ``(from_type, to_type, n)`` over every
    adjacent pair in each user's (ts, event_id)-ordered stream. A
    user's last event has no successor and contributes nothing."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(event_id_col).asc()
    )
    return (
        events.withColumn("_next", F.lead(type_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"),
            F.col("_next").alias("to_type"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """Row-normalized first-order Markov matrix — ``(from_type,
    to_type, n, p)`` where ``p = n / Σ n over the from_type row``
    (rounded): the "what fraction of X-doers do Y next" view. The
    normalizing sum is a window over the tiny (from, to) aggregate —
    no second pass over the events."""
    t = event_transitions(events, user_col, ts_col, type_col, event_id_col)
    row_total = F.sum("n").over(Window.partitionBy("from_type"))
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / row_total, round_to).alias("p"),
    )
