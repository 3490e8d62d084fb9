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


def survival_curve(
    events: DataFrame,
    churn_gap_days: int = 14,
    user_col: str = "user_id",
    ts_col: str = "ts",
    round_to: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival over user lifetimes — ``(duration_days,
    n_at_risk, churned, censored, survival)`` ascending, the retention
    family's third staple (Kaplan & Meier 1958): "what fraction of
    users survive past d days of tenure", right-censoring the users
    the data can't condemn yet.

    Lifetime = last event − first event in whole days (integer floor
    on epoch micros). A user whose last activity is more than
    ``churn_gap_days`` before the corpus max-ts CHURNED at their
    lifetime; anyone still active that recently is CENSORED (alive as
    far as the data knows). S(d) = Π_{d_i ≤ d} (1 − churned_i /
    n_at_risk_i), with censored users leaving the risk set after d_i
    without contributing an event — the standard product-limit
    estimator.

    Scale shape: ONE user-keyed aggregate (map-side combinable) + a
    broadcast one-row corpus max, then a duration-keyed aggregate whose
    key space is O(corpus span in days) — the single unpartitioned
    window that finishes the estimator runs over that bounded table,
    never over users. Survival is exp(Σ ln(...)) in IEEE doubles
    rounded to ``round_to`` (the float-key convention; the per-step
    factors are exact integer ratios)."""
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        F.unix_micros(F.min(ts_col)).alias("_first_us"),
        F.unix_micros(F.max(ts_col)).alias("_last_us"),
    )
    corpus = events.agg(F.unix_micros(F.max(ts_col)).alias("_cmax_us"))
    gap_us = churn_gap_days * MICROS_PER_DAY
    staged = per_user.crossJoin(F.broadcast(corpus)).select(
        F.floor(
            (F.col("_last_us") - F.col("_first_us")) / F.lit(MICROS_PER_DAY)
        )
        .cast("bigint")
        .alias("duration_days"),
        (F.col("_cmax_us") - F.col("_last_us") > gap_us)
        .cast("int")
        .alias("_churned"),
    )
    by_d = staged.groupBy("duration_days").agg(
        F.sum("_churned").cast("bigint").alias("churned"),
        F.sum(1 - F.col("_churned")).cast("bigint").alias("censored"),
    )
    from pyspark.sql import Window

    w_ge = Window.orderBy(F.col("duration_days").asc()).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_le = Window.orderBy(F.col("duration_days").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged2 = by_d.withColumn(
        "n_at_risk",
        F.sum(F.col("churned") + F.col("censored")).over(w_ge),
    ).withColumn(
        "_factor", 1.0 - F.col("churned") / F.col("n_at_risk")
    )
    # once a step's factor hits 0 (everyone at risk churned there) the
    # curve is 0 forever — handled explicitly because ln(0) is NULL in
    # SQL engines and a NULL would silently drop out of the sum
    survival = F.when(
        F.min("_factor").over(w_le) == 0.0, F.lit(0.0)
    ).otherwise(F.exp(F.sum(F.log("_factor")).over(w_le)))
    return (
        staged2.withColumn("survival", F.round(survival, round_to))
        .select(
            "duration_days", "n_at_risk", "churned", "censored", "survival"
        )
        .orderBy("duration_days")
    )
