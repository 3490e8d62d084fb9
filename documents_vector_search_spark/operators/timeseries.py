"""Time-series analytics over event streams: gap-filled resampling
and rolling-window anomaly detection.

The reference engine ships no time-series operators (its events
analysis stops at windowed aggregation); these are the two primitives
a monitoring / data-quality pipeline runs over ingest volumes at
100 TB: "give me a dense daily series even where days are missing"
(resample_daily) and "flag the days whose volume breaks from the
trailing baseline" (rolling_zscore).

Determinism contract (the DuckDB-oracle discipline used across the
registry): every mean/variance is derived from EXACT integer-cent
sums — the anomaly FLAG is a pure int64 inequality
((n·x − Σ)² > τ²·(n·Σx² − Σ²)), so no float-summation-order or
Welford-vs-textbook variance difference between engines can flip it.
The reported z itself is one sqrt + one division over those same
integers — bit-identical in any IEEE-754 engine.

Scale notes: both operators aggregate the raw stream down to
O(series × days) rows FIRST (one map-side-combinable shuffle keyed by
(series, day)), then run windows over the tiny aggregate — the rolling
frame never sees raw events. The date spine is a one-row min/max
aggregate exploded driver-free via sequence(); series×days output is
bounded regardless of input size. int64 sumsq holds to ~3·10⁹ cents
per day (‖daily total‖ < 2⁹·10⁹ before n·Σx² risks 2⁶³); past that,
swap the two sums to decimal(38,0) — the inequality stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _day(ts_col: str):
    return F.date_trunc("day", F.col(ts_col)).cast("date")


def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("bigint")


def daily_series(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(series, day) totals: ``(series, day, n, total_c)`` with the
    value summed in exact integer cents. The single raw-stream pass
    both operators below build on."""
    return events.groupBy(
        F.col(series_col).alias("series"), _day(ts_col).alias("day")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(_cents(F.col(value_col))).alias("total_c"),
    )


def resample_daily(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-filled daily resample: one row per (series, day) for EVERY
    day in the stream's [min, max] range — missing days appear with
    ``n = 0`` and ``total = 0.0`` — plus a running cumulative total
    per series. Output: ``(series, day, n, total, cum_total)``.

    Plan: the spine is a one-row global min/max aggregate whose day
    range explodes via sequence() and cross-joins the distinct series
    values (both broadcast — the corpus is never reshuffled for the
    spine); actual per-day totals left-join on (series, day). The
    cumulative window runs per series over O(days) rows.
    """
    per_day = daily_series(events, series_col, ts_col, value_col)
    span = events.agg(
        F.min(_day(ts_col)).alias("_d0"), F.max(_day(ts_col)).alias("_d1")
    )
    days = span.select(
        F.explode(F.sequence("_d0", "_d1", F.expr("INTERVAL 1 DAY"))).alias(
            "day"
        )
    )
    series = events.select(
        F.col(series_col).alias("series")
    ).distinct()
    spine = series.crossJoin(F.broadcast(days))
    filled = (
        spine.join(per_day, ["series", "day"], "left")
        .select(
            "series",
            "day",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.coalesce("total_c", F.lit(0)).cast("bigint").alias("_tc"),
        )
    )
    cum_w = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "series",
        "day",
        "n",
        (F.col("_tc") / 100.0).alias("total"),
        (F.sum("_tc").over(cum_w) / 100.0).alias("cum_total"),
    )


def rolling_zscore(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
    min_periods: int = 3,
    threshold: int = 3,
) -> DataFrame:
    """Trailing-baseline anomaly detection: for each (series, day),
    score the day's total against the mean/std of the PRIOR
    ``window_days`` observed days (the day itself excluded, so a spike
    cannot mask itself). Output: ``(series, day, total, z,
    is_anomaly)``.

    ``z = (n·x − Σ) / √(n·Σx² − Σ²)`` over the frame's integer-cent
    sums — the algebraic form of (x − μ)/σ with the population σ,
    computed entirely from exact int64 sums. ``is_anomaly`` is the
    INTEGER inequality (n·x − Σ)² > τ²·(n·Σx² − Σ²) given at least
    ``min_periods`` trailing days — immune to float rounding at the
    decision boundary. A FLAT baseline (zero variance) reports
    ``z = NULL`` (σ = 0 makes z undefined) but still flags ANY
    deviation from it — the inequality covers this case for free
    (right side 0, left side > 0 ⟺ x ≠ μ). Short baselines report
    ``z = NULL`` and never flag.

    The rolling frame is ROWS-based over OBSERVED days; feed
    ``resample_daily`` output (or this module's shared
    ``daily_series``) if calendar-gap semantics should count missing
    days as zeros — with the registry's dense streams the two agree.
    """
    per_day = daily_series(events, series_col, ts_col, value_col)
    frame = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(-window_days, -1)
    )
    x = F.col("total_c")
    n = F.count("total_c").over(frame)
    s = F.sum("total_c").over(frame)
    sq = F.sum(x * x).over(frame)
    dev = n * x - s  # n·(x − μ), scaled to stay integral
    varterm = n * sq - s * s  # n²·σ², same scaling
    scored = per_day.select(
        "series",
        "day",
        (x / 100.0).alias("total"),
        n.alias("_n"),
        dev.alias("_dev"),
        varterm.alias("_vt"),
    )
    enough = F.col("_n") >= min_periods
    return scored.select(
        "series",
        "day",
        "total",
        F.when(
            enough & (F.col("_vt") > 0),
            F.round(F.col("_dev") / F.sqrt("_vt"), 6),
        ).alias("z"),
        (
            enough
            & (
                F.col("_dev") * F.col("_dev")
                > F.lit(threshold * threshold) * F.col("_vt")
            )
        ).alias("is_anomaly"),
    ).orderBy("series", "day")


def active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Rolling active-user counts — ``(day, dau, wau)`` where ``dau``
    is the day's distinct users and ``wau`` the distinct users across
    the ``window_days`` window ENDING at that day (the DAU/WAU staple;
    window_days=30 gives MAU).

    Scale shape — no per-day rescan and no range self-join over the
    raw stream: distinct (user, day) pairs first (one dedup shuffle,
    output bounded by users×days), then each pair EXPLODES to the
    ``window_days`` rolling windows it serves (map-side fan-out, the
    end clipped at the corpus max day via a broadcast one-row
    aggregate) and ONE day-keyed distinct count finishes. Days with no
    activity emit no row (the gap-filled convention is
    :func:`resample_daily`'s job).

    COST NOTE: the fan-out amplifies the deduped (user, day) table by
    ×``window_days`` rows BEFORE the distinct count — ×7 for WAU, ×30
    for MAU. That input is already bounded by users×active-days (never
    the raw stream), so the amplified row count is users×days×window —
    fine at ×7/×30; for very large windows (e.g. a ×365 YAU) prefer a
    sketch-merge design (one HLL/KMV sketch per day, windows merge
    O(window) sketches) over this exact form."""
    ud = events.select(
        _day(ts_col).alias("day"), F.col(user_col).alias("user")
    ).distinct()
    dau = ud.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    span = events.agg(F.max(_day(ts_col)).alias("_dmax"))
    contrib = ud.crossJoin(F.broadcast(span)).select(
        "user",
        F.explode(
            F.sequence(
                F.col("day"),
                F.least(
                    F.col("_dmax"), F.date_add(F.col("day"), window_days - 1)
                ),
            )
        ).alias("day"),
    )
    wau = contrib.groupBy("day").agg(
        F.count_distinct("user").cast("bigint").alias("wau")
    )
    return dau.join(wau, "day").orderBy("day")


def user_burstiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_gaps: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Per-user inter-event timing profile — ``(user, n_events,
    n_gaps, mean_gap_s, cv, burstiness)`` ordered by user: the
    activity-rhythm signal behind bot/abuse triage and engagement
    segmentation. ``burstiness`` is the Goh-Barabási coefficient
    B = (σ−μ)/(σ+μ) over the user's inter-event gaps (Goh & Barabási,
    "Burstiness and memory in complex systems", EPL 2008 — public):
    −1 for a metronome, →0 Poisson, →1 heavy-tailed bursts. ``cv`` is
    the coefficient of variation σ/μ of the same gaps.

    Determinism contract (the rolling_zscore recipe): gaps are exact
    int64 SECONDS (micros floor-divided by 10⁶ — both engines floor on
    the non-negative operand), μ and σ derive from the exact sums
    S = Σgap and Q = Σgap²: ``mean_gap_s`` is the micro-floored ratio
    S·10⁶ DIV n, ``cv = √(n·Q − S²)/S`` and ``B = (√(n·Q − S²) − S)
    /(√(n·Q − S²) + S)`` (population σ; the n cancels), each one sqrt
    + one division over int64s, rounded to ``round_to`` — IEEE-exact
    in any engine. A user whose gaps are all zero (S = 0) reports
    NULL cv/burstiness (μ = 0 leaves both undefined). int64 bound:
    n·Q needs Σgap² · n < 2⁶³ — holds to ~30-year spans at 10⁵ events
    per user; past that, lift the two sums to decimal(38,0).

    Tie handling: rows sharing a timestamp contribute zero gaps; the
    gap MULTISET is a function of the user's sorted timestamp sequence
    alone, so the window's tie order cannot change any output.

    Scale shape: one lag window PARTITIONED by user, then one
    aggregation on the same key — the exchange is reused (one shuffle
    of (user, ts) pairs total), output is O(users)."""
    t_us = F.unix_micros(F.col(ts_col))
    gap = F.expr(
        # micros -> whole seconds; non-negative by the window order
        "(_t_us - _prev_us) DIV 1000000"
    )
    staged = (
        events.select(F.col(user_col).alias("user"), t_us.alias("_t_us"))
        .withColumn(
            "_prev_us",
            F.lag("_t_us").over(
                Window.partitionBy("user").orderBy("_t_us")
            ),
        )
        .withColumn("_gap", gap)
    )
    agg = staged.groupBy("user").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count("_gap").cast("bigint").alias("n_gaps"),
        F.coalesce(F.sum("_gap"), F.lit(0)).cast("bigint").alias("_s"),
        F.coalesce(F.sum(F.col("_gap") * F.col("_gap")), F.lit(0))
        .cast("bigint")
        .alias("_q"),
    )
    r = F.sqrt(
        (F.col("n_gaps") * F.col("_q") - F.col("_s") * F.col("_s")).cast(
            "double"
        )
    )
    s_pos = F.col("_s") > 0
    return (
        agg.filter(F.col("n_gaps") >= min_gaps)
        .select(
            "user",
            "n_events",
            "n_gaps",
            (F.expr("_s * 1000000 DIV n_gaps") / F.lit(1e6)).alias(
                "mean_gap_s"
            ),
            F.when(s_pos, F.round(r / F.col("_s"), round_to)).alias("cv"),
            F.when(
                s_pos, F.round((r - F.col("_s")) / (r + F.col("_s")), round_to)
            ).alias("burstiness"),
        )
        .orderBy("user")
    )


def dau_kmv(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    k: int = 256,
    round_to: int = 6,
) -> DataFrame:
    """Per-day APPROXIMATE distinct active users via the KMV sketch —
    ``(day, k_used, est_dau)`` ordered by day: the bounded-state form
    of :func:`active_users`' exact DAU, and the batch anchor of the
    streaming twin (streaming/stateful.py::dau_stream). Deterministic
    (md5-hashed users, Beyer et al. 2007 estimator — the
    operators/sketches.py recipe per day-group), so the estimate
    itself is oracle-checkable AND the stream==batch parity is exact.

    Per day the k smallest distinct user hashes survive: a day with
    d ≤ k distinct users keeps ALL d hashes (k_used = d, estimate
    (d−1)/U(d) from the complete sketch); relative error ~1/√k
    beyond that.

    Scale shape: distinct (day, user-hash) dedup (the same bounded
    first pass as active_users), a day-keyed top-k rank over a
    ≤ users-per-day frame, then one O(days × k) aggregate. State per
    day is k hashes — the contract that makes the STREAMING form
    viable where exact distinct-user state is unbounded."""
    from documents_vector_search_spark.functions.hashing import md5_hash64

    dh = events.select(
        _day(ts_col).alias("day"),
        md5_hash64(F.col(user_col).cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("day").orderBy(F.col("h").asc())
    topk = dh.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k
    )
    space = float(1 << 60)  # md5_hash64 is 60-bit (sketches.py)
    return (
        topk.groupBy("day")
        .agg(
            F.count("*").cast("bigint").alias("k_used"),
            F.max("h").alias("_kth"),
        )
        .select(
            "day",
            "k_used",
            F.round(
                (F.col("k_used") - 1) / (F.col("_kth") / F.lit(space)),
                round_to,
            ).alias("est_dau"),
        )
        .orderBy("day")
    )


def cusum_changepoints(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    slack_pct: int = 50,
    threshold_pct: int = 500,
    target_c: int | None = None,
) -> DataFrame:
    """Per-series CUSUM level-shift detection (Page 1954) over the
    daily totals — ``(series, day, total_c, cusum_hi_c, cusum_lo_c,
    shift_up, shift_down)``: the monitoring question rolling_zscore
    cannot answer ("did the LEVEL move and stay moved", vs "is this
    one day an outlier").

    Standard one-sided CUSUMs against the series' global mean μ with
    slack k = μ·slack_pct/100 and decision h = μ·threshold_pct/100:
    ``S⁺_t = max(0, S⁺_{t-1} + x_t − μ − k)`` flags up-shifts, the
    mirror S⁻ flags down-shifts. The recurrence LOOKS sequential, but
    clamp-at-zero running sums have a closed form — ``S⁺_t = C_t −
    min_{j≤t} C_j`` over the prefix sums C of the deviations — so both
    sides compute as ONE cumulative sum + ONE running extremum per
    series: two window passes over the O(series × days) aggregate,
    never the raw stream.

    EXACT integers throughout: deviations are day-total cents scaled
    ×100·n_days minus the integer-cent global sum apportioned per day
    (so μ never becomes a float), and both CUSUMs and the flags are
    int64 algebra — no float drift can flip a flag between engines.

    ``target_c`` switches to the classical KNOWN-target form: μ is the
    given integer-cent level (no data-derived mean, no ×days scaling)
    — the form whose streaming twin
    (streaming/stateful.py::cusum_stream) carries (S⁺, S⁻) as O(1)
    state per series and emits the identical trajectory
    (restart-parity pytest).
    """
    from pyspark.sql import Window

    base = daily_series(events, series_col, ts_col, value_col)
    if target_c is not None:
        staged = base.select(
            "series",
            "day",
            "total_c",
            F.col("total_c").alias("_x"),
            F.lit(int(target_c)).cast("bigint").alias("_mu"),
            F.lit(1).cast("bigint").alias("_d"),
        )
    else:
        tot = base.groupBy("series").agg(
            F.sum("total_c").cast("bigint").alias("_sum_c"),
            F.count(F.lit(1)).cast("bigint").alias("_days"),
        )
        # work in units of (cents × days): x_scaled = total_c · days,
        # μ_scaled = Σc; slack and threshold scale identically, so the
        # comparisons are exact integer inequalities
        staged = base.join(tot, "series").select(
            "series",
            "day",
            "total_c",
            (F.col("total_c") * F.col("_days")).alias("_x"),
            F.col("_sum_c").alias("_mu"),
            F.col("_days").alias("_d"),
        )
    dev_hi = F.col("_x") - F.col("_mu") - F.expr(
        f"_mu * {slack_pct} DIV 100"
    )
    dev_lo = F.col("_x") - F.col("_mu") + F.expr(
        f"_mu * {slack_pct} DIV 100"
    )
    w_cum = (
        Window.partitionBy("series")
        .orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = (
        staged.withColumn("_c_hi", F.sum(dev_hi).over(w_cum))
        .withColumn("_c_lo", F.sum(dev_lo).over(w_cum))
        .withColumn("_m_hi", F.min(F.least(F.col("_c_hi"), F.lit(0))).over(w_cum))
        .withColumn("_m_lo", F.max(F.greatest(F.col("_c_lo"), F.lit(0))).over(w_cum))
    )
    s_hi = F.col("_c_hi") - F.col("_m_hi")
    s_lo = F.col("_m_lo") - F.col("_c_lo")
    h = F.expr(f"_mu * {threshold_pct} DIV 100")
    return staged.select(
        "series",
        "day",
        "total_c",
        # report in plain cents (floor-div by days) for readability;
        # the FLAGS compare in the exact scaled units
        F.expr("(_c_hi - _m_hi) DIV _d").alias("cusum_hi_c"),
        F.expr("(_m_lo - _c_lo) DIV _d").alias("cusum_lo_c"),
        (s_hi > h).alias("shift_up"),
        (s_lo > h).alias("shift_down"),
    ).orderBy("series", "day")
