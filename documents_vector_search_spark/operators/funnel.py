"""Funnel analysis: ordered-step conversion over an event stream.

The product-analytics staple: of the users who did step 1, how many
later did step 2, then step 3 (earliest-completion semantics)? The
naive plan is one self-join per step — K-1 shuffles of the event
table. Here the whole funnel is ONE user-keyed shuffle: collect each
user's events as a (ts, event_id, type)-sorted array and run a single
``F.aggregate`` fold whose accumulator is the array of stage
timestamps — pure Column algebra (whole-stage codegen, no UDF), the
same sorted-fold idiom as the engine's sessionization.

Determinism: the walk order is (ts, event_id) — a total order, so
same-timestamp events resolve identically in any engine, and the SQL
oracle reproduces the exact same stage decisions with per-user
row_number sequences.

Scale notes (100 TB): one shuffle keyed by user; per-user state is the
user's own event list (the same bound sessionization already accepts —
skewed power users are the caveat, and a ts-bucketed pre-aggregation
is the escape hatch). The output is K rows.

Steps must be distinct event types (a repeated step would need
first-unfilled-match tie-breaking that the single-pass transform does
not implement — asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest funnel completion — ``(user, stage_ts)`` where
    ``stage_ts[k]`` is when the user first completed step k AFTER
    completing step k-1 (null = never reached)."""
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])

    ordered = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col("event_id").alias("eid"),
                F.col(type_col).alias("tp"),
            )
        )
    )
    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    def step_fold(acc, e):
        def upd(i):
            # i is a 0-based int Column from sequence()
            prev_ok = F.when(i == 0, F.lit(True)).otherwise(
                F.element_at(acc, i).isNotNull()
            )
            cond = (
                F.element_at(acc, i + 1).isNull()
                & (F.element_at(steps_arr, i + 1) == e["tp"])
                & prev_ok
            )
            return F.when(cond, e["ts"]).otherwise(F.element_at(acc, i + 1))

        return F.transform(F.sequence(F.lit(0), F.lit(k - 1)), upd)

    return events.groupBy(F.col(user_col).alias("user")).agg(
        F.aggregate(ordered, init, step_fold).alias("stage_ts")
    )


def funnel_report(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_to: int = 6,
) -> DataFrame:
    """Stage-conversion report — ``(stage, step, n_users,
    pct_of_first)`` ordered by stage; ``n_users`` = users whose
    earliest-completion walk reached the stage, ``pct_of_first``
    relative to stage 1."""
    stage_ts = funnel_stage_times(events, steps, user_col, ts_col, type_col)
    per_stage = (
        stage_ts.select(
            F.posexplode(F.col("stage_ts")).alias("pos", "t")
        )
        .groupBy("pos")
        .agg(F.count("t").alias("n_users"))  # count() skips nulls
    )
    first = per_stage.filter(F.col("pos") == 0).select(
        F.col("n_users").alias("_n0")
    )
    steps_df = events.sparkSession.createDataFrame(
        [(i, s) for i, s in enumerate(steps)], "pos int, step string"
    )
    return (
        steps_df.join(per_stage, "pos", "left")
        .crossJoin(F.broadcast(first))
        .select(
            (F.col("pos") + 1).cast("int").alias("stage"),
            "step",
            F.coalesce(F.col("n_users"), F.lit(0)).cast("bigint").alias(
                "n_users"
            ),
            F.round(
                F.when(
                    F.col("_n0") > 0,
                    F.coalesce(F.col("n_users"), F.lit(0))
                    / F.col("_n0").cast("double"),
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("pct_of_first"),
        )
        .orderBy("stage")
    )
