"""A/B experiment analysis: deterministic assignment + two-sample
z-statistics from exact integer sums.

The reference engine has no experimentation support; a data platform
serving product teams needs the read side of experiments: hash users
into variants (the SAME md5 family the sampling gates use — stable
across runs, engines, and languages), aggregate a per-user metric, and
report the variant contrast with a significance statistic.

Determinism contract: every mean/variance derives from exact int64
cent sums; the z statistic is one expression tree of divisions and a
sqrt over those integers, bit-identical in any IEEE-754 engine. The
lift ratio is floored to micros (the engine-wide ratio recipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.hashing import md5_hash64


def assign_variant(user_col, n_variants: int = 2, seed: int = 0):
    """Deterministic experiment bucket in [0, n_variants) from the
    md5 family — evaluable on any engine and stable forever (the
    property assignment systems need: a user never flips variants)."""
    return F.pmod(md5_hash64(user_col.cast("string"), salt=seed), n_variants)


def ab_test(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    metric_type: str | None = "purchase",
    type_col: str = "event_type",
    seed: int = 0,
) -> DataFrame:
    """Two-variant experiment readout — one row: ``(n_a, n_b, mean_a,
    mean_b, lift, z)``.

    Users hash 50/50 into A/B via :func:`assign_variant`; the metric
    is each user's total ``value_col`` over ``metric_type`` events
    (every assigned user counts, zero if they never converted — the
    intent-to-treat denominator, which is why the user table comes
    from ALL events, not just metric events). ``z`` is the Welch
    two-sample statistic (mean_a − mean_b) / √(s²_a/n_a + s²_b/n_b)
    with sample variances; ``lift`` = (mean_a − mean_b)/mean_b floored
    to micros. An arm with fewer than two users has no sample
    variance: ``z`` reports NULL rather than a division error.

    Scale shape: one user-keyed aggregation over raw events (map-side
    combinable), then ONE 2-row variant aggregation — no windows, no
    sorts, no collect.
    """
    per_user = (
        events.groupBy(F.col(user_col).alias("user"))
        .agg(
            F.sum(
                F.when(
                    F.lit(metric_type is None)
                    | (F.col(type_col) == F.lit(metric_type)),
                    F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast(
                        "bigint"
                    ),
                ).otherwise(F.lit(0))
            ).alias("x_c")
        )
        .withColumn("variant", assign_variant(F.col("user"), 2, seed))
    )
    stats = per_user.groupBy("variant").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x_c").alias("s"),
        F.sum(F.col("x_c") * F.col("x_c")).alias("sq"),
    )
    a = stats.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"),
        F.col("sq").alias("sq_a"),
    )
    b = stats.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"),
        F.col("sq").alias("sq_b"),
    )
    j = a.crossJoin(F.broadcast(b))
    mean_a = F.col("s_a") / F.col("n_a") / 100.0
    mean_b = F.col("s_b") / F.col("n_b") / 100.0
    # sample variance in cents²: (n·Σx² − (Σx)²) / (n·(n−1)) — only
    # defined for n ≥ 2 (the F.when guard keeps ANSI mode's
    # divide-by-zero away from single-user arms)
    var_a = (F.col("n_a") * F.col("sq_a") - F.col("s_a") * F.col("s_a")) / (
        F.col("n_a") * (F.col("n_a") - 1)
    )
    var_b = (F.col("n_b") * F.col("sq_b") - F.col("s_b") * F.col("s_b")) / (
        F.col("n_b") * (F.col("n_b") - 1)
    )
    both_sized = (F.col("n_a") > 1) & (F.col("n_b") > 1)
    return j.select(
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        (
            F.floor(
                (F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a"))
                * 1000000.0
                / (F.col("s_b") * F.col("n_a"))
                + 0.5
            ).cast("bigint")
            / 1000000.0
        ).alias("lift"),
        F.when(
            both_sized,
            F.round(
                (mean_a - mean_b) * 100.0
                / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b")),
                6,
            ),
        ).alias("z"),
    )
