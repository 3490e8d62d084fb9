"""Cohort retention analysis over an event stream.

The second product-analytics staple beside the funnel: group users into
cohorts by their FIRST-ACTIVITY period, then for each later period
count how many of the cohort came back. The whole computation is two
bounded aggregations:

1. one user-keyed aggregate for each user's cohort period (min event
   time, truncated to the period),
2. one (user, period) distinct pass joined back to the cohort map —
   the join is user-keyed (broadcast-able when the user dimension is
   bounded; a shuffle join at 100 TB), followed by a
   (cohort, period_offset)-keyed count whose key space is tiny
   (periods²), so map-side partials collapse everything before the
   final shuffle.

Determinism: period truncation is integer floor arithmetic on epoch
micros (identical in any engine — no calendar functions whose week
conventions differ between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS_PER_DAY = 86_400_000_000


def cohort_retention(
    events: DataFrame,
    period_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """``(cohort_period, period_offset, n_active, cohort_size,
    retention)`` — for each first-activity cohort (period index =
    floor(epoch_us / period)), the count and fraction of its users
    active ``period_offset`` periods later. Offset 0 is the cohort
    itself (retention 1.0 by construction); ``max_offset`` bounds the
    output rows."""
    period_us = period_days * MICROS_PER_DAY
    pcol = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(period_us)).cast(
        "bigint"
    )
    activity = events.select(
        F.col(user_col).alias("user"), pcol.alias("period")
    ).distinct()
    cohorts = activity.groupBy("user").agg(
        F.min("period").alias("cohort_period")
    )
    sizes = cohorts.groupBy("cohort_period").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    joined = activity.join(cohorts, "user").select(
        "cohort_period",
        (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        "user",
    )
    if max_offset is not None:
        joined = joined.filter(F.col("period_offset") <= max_offset)
    counts = joined.groupBy("cohort_period", "period_offset").agg(
        F.count("*").cast("bigint").alias("n_active")  # (user, period) distinct upstream
    )
    return (
        counts.join(sizes, "cohort_period")
        .select(
            "cohort_period",
            F.col("period_offset").cast("bigint").alias("period_offset"),
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"),
                round_to,
            ).alias("retention"),
        )
        .orderBy("cohort_period", "period_offset")
    )
