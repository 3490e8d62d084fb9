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
user's own event list — the same bound sessionization already accepts.
For skewed power users, ``ts_bucket`` opts into the two-level escape
hatch: events first aggregate per (user, time bucket) into a bounded
COMPOSABLE segment summary, then the per-user fold runs over segment
summaries instead of raw events, so no single task ever materializes a
power user's full event list. The summary exploits that funnel state
entering a segment is fully characterized by HOW MANY stages are
already filled (stages fill strictly in order, and every event in a
later time bucket is later than every event in an earlier one): it is
the (k+1)-row table "stage timestamps this segment would contribute if
entered with j stages filled", and segments compose left-to-right with
an element-wise coalesce — identical results to the direct fold, still
zero UDFs. The output is K rows.

Steps must be distinct event types (a repeated step would need
first-unfilled-match tie-breaking that the single-pass transform does
not implement — asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stage_fold(steps: list[str], k: int):
    """The funnel accumulator step: acc = array of k stage timestamps
    (null = unreached), e = (ts, eid, tp) event struct."""
    steps_arr = F.array(*[F.lit(s) for s in steps])

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

    return step_fold


def funnel_stage_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
    ts_bucket: str | None = None,
) -> DataFrame:
    """Per-user earliest funnel completion — ``(user, stage_ts)`` where
    ``stage_ts[k]`` is when the user first completed step k AFTER
    completing step k-1 (null = never reached).

    ``ts_bucket`` (e.g. ``"1 day"``) enables the skew escape hatch:
    per-(user, bucket) composable partial folds, then a per-user fold
    over bucket summaries — identical results (property-tested), with
    per-task state bounded by a power user's busiest bucket instead of
    their lifetime event count."""
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    k = len(steps)
    step_fold = _stage_fold(steps, k)
    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    ev_struct = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(event_id_col).alias("eid"),
        F.col(type_col).alias("tp"),
    )

    if ts_bucket is None:
        ordered = F.sort_array(F.collect_list(ev_struct))
        return events.groupBy(F.col(user_col).alias("user")).agg(
            F.aggregate(ordered, init, step_fold).alias("stage_ts")
        )

    # --- skew escape hatch: two-level fold -----------------------------
    # Level 1: per (user, time bucket) — sort the bucket's events and
    # fold them k+1 times, once per possible entry state j = number of
    # stages already filled on entry. Entry stages get a sentinel
    # non-null timestamp so prev_ok passes; the sentinel never reaches
    # the output (the level-2 coalesce prefers the accumulator, which is
    # non-null exactly on those stages). Buckets partition time, so
    # every event here is later than every event of earlier buckets —
    # the entry COUNT is the complete cross-bucket state.
    sentinel = F.to_timestamp(F.lit("1900-01-01 00:00:00"))

    def entry_init(j: int):
        return F.array(
            *[
                (sentinel if i < j else F.lit(None).cast("timestamp"))
                for i in range(k)
            ]
        )

    bucket_start = F.window(F.col(ts_col), ts_bucket).start
    per_bucket = events.groupBy(
        F.col(user_col).alias("user"),
        bucket_start.alias("_bkt"),
    ).agg(F.sort_array(F.collect_list(ev_struct)).alias("_evs"))
    summary = F.array(
        *[
            F.aggregate(F.col("_evs"), entry_init(j), step_fold)
            for j in range(k + 1)
        ]
    )
    segments = per_bucket.select(
        "user", F.struct(F.col("_bkt").alias("b"), summary.alias("s")).alias("_seg")
    )

    # Level 2: per user — fold bucket summaries in time order. The
    # per-user state is (#buckets × (k+1) × k) timestamps: bounded by
    # the funnel's time span, independent of the user's event count.
    def seg_fold(acc, seg):
        filled = F.size(F.filter(acc, lambda x: x.isNotNull()))
        contrib = F.element_at(seg["s"], filled + 1)
        return F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.coalesce(
                F.element_at(acc, i + 1), F.element_at(contrib, i + 1)
            ),
        )

    ordered_segs = F.sort_array(F.collect_list(F.col("_seg")))
    return segments.groupBy("user").agg(
        F.aggregate(ordered_segs, init, seg_fold).alias("stage_ts")
    )


def funnel_report(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
    round_to: int = 6,
    ts_bucket: str | None = None,
    window: str | None = None,
) -> DataFrame:
    """Stage-conversion report — ``(stage, step, n_users,
    pct_of_first)`` ordered by stage; ``n_users`` = users whose
    earliest-completion walk reached the stage, ``pct_of_first``
    relative to stage 1. Always K rows — an empty event stream reports
    every stage with ``n_users`` 0. ``window`` switches the walk to
    :func:`funnel_windowed` (conversion-window, greedy restart);
    ``window`` and ``ts_bucket`` are mutually exclusive (the windowed
    fold carries its own attempt state)."""
    if window is not None and ts_bucket is not None:
        raise ValueError("window and ts_bucket are mutually exclusive")
    if window is not None:
        stage_ts = funnel_windowed(
            events, steps, window, user_col, ts_col, type_col, event_id_col
        )
    else:
        stage_ts = funnel_stage_times(
            events, steps, user_col, ts_col, type_col, event_id_col, ts_bucket
        )
    per_stage = (
        stage_ts.select(
            F.posexplode(F.col("stage_ts")).alias("pos", "t")
        )
        .groupBy("pos")
        .agg(F.count("t").alias("n_users"))  # count() skips nulls
    )
    # single-row even on EMPTY input (agg over zero rows still yields
    # one row), so the broadcast join below always produces K rows
    first = per_stage.agg(
        F.coalesce(
            F.max(F.when(F.col("pos") == 0, F.col("n_users"))), F.lit(0)
        ).alias("_n0")
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


def funnel_latency(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
    round_to: int = 6,
    ts_bucket: str | None = None,
    window: str | None = None,
) -> DataFrame:
    """Time-to-convert distribution — ONE row ``(n_entered,
    n_converted, conversion_rate, p25_seconds, p50_seconds,
    p75_seconds, p90_seconds, mean_seconds)`` over users whose
    earliest-completion walk reached the LAST step: latency = stage K
    timestamp − stage 1 timestamp. Percentiles use Spark's
    ``percentile()`` ≡ DuckDB's ``quantile_cont`` linear interpolation
    (the engine's value_percentiles convention), so even quantiles are
    oracle-exact; empty conversions yield nulls.

    Cost: the funnel fold itself (one user-keyed shuffle, or the
    ts_bucket two-level form) + one single-row aggregation. ``window``
    switches the walk to :func:`funnel_windowed` (mutually exclusive
    with ``ts_bucket``) — the latency of conversions that happened
    WITHIN the window, the number a campaign report actually wants."""
    if window is not None and ts_bucket is not None:
        raise ValueError("window and ts_bucket are mutually exclusive")
    if window is not None:
        st = funnel_windowed(
            events, steps, window, user_col, ts_col, type_col, event_id_col
        )
    else:
        st = funnel_stage_times(
            events, steps, user_col, ts_col, type_col, event_id_col, ts_bucket
        )
    k = len(steps)
    first = F.element_at("stage_ts", 1)
    last = F.element_at("stage_ts", k)
    secs = F.when(
        last.isNotNull(),
        (F.unix_micros(last) - F.unix_micros(first)) / F.lit(1e6),
    )
    pct = lambda p, name: F.round(  # noqa: E731
        F.expr(f"percentile(_secs, {p})"), round_to
    ).alias(name)
    staged = st.select(
        first.alias("_f"), last.alias("_l"), secs.alias("_secs")
    )
    return staged.agg(
        F.count("_f").cast("bigint").alias("n_entered"),
        F.count("_l").cast("bigint").alias("n_converted"),
        F.round(
            F.when(
                F.count("_f") > 0, F.count("_l") / F.count("_f")
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("conversion_rate"),
        pct(0.25, "p25_seconds"),
        pct(0.5, "p50_seconds"),
        pct(0.75, "p75_seconds"),
        pct(0.9, "p90_seconds"),
        F.round(F.avg("_secs"), round_to).alias("mean_seconds"),
    )


def funnel_windowed(
    events: DataFrame,
    steps: list[str],
    window: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Conversion-window funnel — ``(user, stage_ts)`` like
    funnel_stage_times, but every stage must land within ``window``
    (an INTERVAL string, e.g. ``"7 days"``) of the attempt's FIRST
    stage, with GREEDY RESTART: when the active attempt's window
    lapses, the next step-1 event opens a fresh attempt. The output is
    the user's first COMPLETED attempt (all nulls after the last
    reached stage of the final attempt otherwise) — the semantics
    product-analytics tools ship, and the one an unbounded funnel
    can't emulate ("signed up in January, purchased in June" is not a
    conversion).

    Greedy means step-1 events INSIDE an active attempt do not fork
    parallel attempts (state stays O(k) per user; a retroactive
    best-entry search would need O(attempts) state). Consequence,
    documented and pytest-pinned: a conversion reachable only from a
    mid-attempt entry is missed. This matches the standard
    sessionized-funnel contract.

    Same shape as the direct fold: ONE user-keyed sorted-array
    aggregate, no UDF — the fold is a Column expression, so the whole
    operator stays in whole-stage codegen. Scale note: the per-user
    event list materializes like the direct fold's; the ts_bucket
    composability hatch does NOT port here (an attempt's cross-bucket
    state is (entry_ts, fill count), not a fill count alone, so bucket
    summaries would need one fold per possible entry timestamp) — for
    pathological power users, pre-filter to the funnel's event types
    first, which bounds the list by steps actually taken."""
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    win = F.expr(f"INTERVAL {window}")

    ev_struct = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(event_id_col).alias("eid"),
        F.col(type_col).alias("tp"),
    )
    # acc = struct(done: array<ts> (the completed attempt; null until
    # one completes), cur: array<ts> (the active attempt's stage times))
    empty = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])
    init = F.struct(
        F.lit(None).cast("array<timestamp>").alias("done"),
        empty.alias("cur"),
    )

    def step(acc, e):
        done = acc["done"]
        # expire the active attempt when the event falls outside the
        # window of its entry (stage-1) timestamp
        entry = F.element_at(acc["cur"], 1)
        expired = entry.isNotNull() & (e["ts"] > entry + win)
        cur = F.when(expired, empty).otherwise(acc["cur"])

        def upd(i):
            prev_ok = F.when(i == 0, F.lit(True)).otherwise(
                F.element_at(cur, i).isNotNull()
            )
            cond = (
                F.element_at(cur, i + 1).isNull()
                & (F.element_at(steps_arr, i + 1) == e["tp"])
                & prev_ok
            )
            return F.when(cond, e["ts"]).otherwise(F.element_at(cur, i + 1))

        nxt = F.transform(F.sequence(F.lit(0), F.lit(k - 1)), upd)
        completed = F.element_at(nxt, k).isNotNull()
        return F.when(done.isNotNull(), acc).otherwise(
            F.struct(
                F.when(completed, nxt)
                .otherwise(F.lit(None).cast("array<timestamp>"))
                .alias("done"),
                nxt.alias("cur"),
            )
        )

    ordered = F.sort_array(F.collect_list(ev_struct))
    folded = F.aggregate(ordered, init, step)
    return events.groupBy(F.col(user_col).alias("user")).agg(
        F.coalesce(folded["done"], folded["cur"]).alias("stage_ts")
    )
