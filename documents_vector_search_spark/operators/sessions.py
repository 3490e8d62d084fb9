"""Gap-based sessionization and the session-quality rollup.

The batch twin of ``streaming/stateful.py::sessionize_stream`` (and
the reusable form of the registry's oracle-checked ``q_sessionize``):
a session is a maximal run of a user's events with no gap exceeding
``gap_seconds``. Session boundaries are integer-microsecond
comparisons under the (ts, event_id) total order, so any engine draws
the same boundaries.

Scale shape: sessionize is two window passes over the user-keyed
stream (lag to flag session starts, running sum to number them) + one
(user, session) aggregate — ONE shuffle on the user key, state bounded
per task by Spark's window machinery (no per-user array
materializes, unlike the funnel fold). session_metrics is one further
single-row aggregate over the O(sessions) table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_metrics"]


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """One row per session: ``(user, session_id, n_events,
    session_start_us, session_end_us, duration_s)`` — session_id is
    1-based per user in time order; timestamps are int64 epoch micros
    (the registry convention); duration in float seconds rounded to 6.
    """
    order = Window.partitionBy(user_col).orderBy(ts_col, event_id_col)
    prev = F.lag(ts_col).over(order)
    gap_us = int(gap_seconds) * 1_000_000
    is_new = F.when(
        prev.isNull()
        | (F.unix_micros(ts_col) - F.unix_micros(prev) > gap_us),
        1,
    ).otherwise(0)
    # the running sum orders exactly like the lag window (incl. the
    # event_id tiebreak) so boundary flags and numbering agree
    flagged = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("_ts"),
        F.col(event_id_col).alias("_eid"),
        is_new.alias("_new"),
    )
    running2 = (
        Window.partitionBy("user")
        .orderBy("_ts", "_eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.select(
        "user",
        "_ts",
        F.sum("_new").over(running2).cast("bigint").alias("session_id"),
    )
    return (
        numbered.groupBy("user", "session_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.unix_micros(F.min("_ts")).alias("session_start_us"),
            F.unix_micros(F.max("_ts")).alias("session_end_us"),
        )
        .withColumn(
            "duration_s",
            F.round(
                (F.col("session_end_us") - F.col("session_start_us"))
                / F.lit(1e6),
                6,
            ),
        )
    )


def session_metrics(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """ONE-row session-quality report — ``(n_sessions, n_users,
    sessions_per_user, bounce_rate, avg_events, avg_duration_s,
    p50_duration_s)``:

    - ``bounce_rate`` = share of single-event sessions (the classic
      engagement red flag);
    - ``p50_duration_s`` uses percentile() ≡ quantile_cont (the
      value_percentiles convention).

    One aggregate over the O(sessions) table sessionize produces."""
    s = sessionize(events, gap_seconds, user_col, ts_col, event_id_col)
    return s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.count_distinct("user").cast("bigint").alias("n_users"),
        F.round(
            F.count(F.lit(1)) / F.count_distinct("user"), round_to
        ).alias("sessions_per_user"),
        F.round(
            F.avg((F.col("n_events") == 1).cast("int")), round_to
        ).alias("bounce_rate"),
        F.round(F.avg("n_events"), round_to).alias("avg_events"),
        F.round(F.avg("duration_s"), round_to).alias("avg_duration_s"),
        F.round(
            F.expr("percentile(duration_s, 0.5)"), round_to
        ).alias("p50_duration_s"),
    )
