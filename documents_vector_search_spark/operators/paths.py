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


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    buckets: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """RFM segmentation — ``(user, recency_days, frequency, monetary,
    r, f, m, segment)``: the classic customer-value view (recency since
    the stream's last event, event count, value sum), each scored
    1..``buckets`` by ntile over (metric, user) — the user tiebreaker
    makes the quantile assignment a total order, so any engine
    reproduces the same segments. ``segment`` concatenates r·f·m
    ("555" = best).

    Scale shape: ONE user-keyed aggregation over the events (map-side
    combinable), then three rank windows over the AGGREGATED user table
    — O(users) rows, not O(events); the corpus max-ts is a broadcast
    one-row aggregate. Monetary sums in integer cents so the ordering
    under ties is exact cross-engine. The unpartitioned ntile windows
    are the exact-quantile design for user tables that fit a sort
    (hundreds of millions of rows); at billions of users use
    :func:`rfm_segments_approx` — broadcast approx-quantile cut
    points, no unpartitioned window — whose scores lose the exact-tie
    guarantee, which is why the exact form is the default."""
    staged = _rfm_staged(events, user_col, ts_col, value_col, round_to)
    # recency: SMALLER is better -> ntile ascending on (recency, user)
    # scores must INVERT so 5 = most recent
    r_w = Window.orderBy(F.col("recency_days").asc(), F.col("user").asc())
    f_w = Window.orderBy(F.col("frequency").asc(), F.col("user").asc())
    m_w = Window.orderBy(F.col("_mc").asc(), F.col("user").asc())
    out = staged.select(
        "user",
        "recency_days",
        "frequency",
        "monetary",
        (F.lit(buckets + 1) - F.ntile(buckets).over(r_w)).cast("int").alias("r"),
        F.ntile(buckets).over(f_w).cast("int").alias("f"),
        F.ntile(buckets).over(m_w).cast("int").alias("m"),
    )
    return out.withColumn(
        "segment",
        F.concat(F.col("r").cast("string"), F.col("f").cast("string"),
                 F.col("m").cast("string")),
    )


def _rfm_staged(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    round_to: int,
) -> DataFrame:
    """Shared RFM staging: one user-keyed aggregation (map-side
    combinable) + a broadcast one-row corpus-max — the metric table
    both the exact (ntile) and approx (cut-point) scorers consume."""
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        F.max(ts_col).alias("_last"),
        F.count("*").cast("bigint").alias("frequency"),
        F.sum(
            F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
        ).alias("_mon_c"),
    )
    corpus_max = events.agg(F.max(ts_col).alias("_cmax"))
    return per_user.crossJoin(F.broadcast(corpus_max)).select(
        "user",
        F.round(
            (F.unix_micros("_cmax") - F.unix_micros("_last"))
            / F.lit(86400.0 * 1e6),
            round_to,
        ).alias("recency_days"),
        "frequency",
        (F.col("_mon_c") / 100.0).alias("monetary"),
        F.col("_mon_c").alias("_mc"),
    )


def rfm_segments_approx(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    buckets: int = 5,
    round_to: int = 6,
    accuracy: int = 100000,
) -> DataFrame:
    """Billion-user scale path for :func:`rfm_segments` — same output
    schema, but r/f/m come from ``approx_percentile`` cut points
    (one broadcast one-row aggregate) applied as a map-only when-chain
    instead of three unpartitioned ntile windows. The plan has NO
    Window operator and no single-partition sort (pytest-asserted), so
    it scales to user tables that can't be globally sorted.

    Scoring rule: score = 1 + #(cuts < metric) with cuts at fractions
    i/buckets — equal metric values always land in the same bucket
    (unlike ntile's user-tiebreak split), and boundary assignment can
    differ from ntile by one bucket exactly where quantile ties sit;
    the parity pytest pins exact == approx on a tie-free fixture whose
    bucket boundaries are unambiguous."""
    staged = _rfm_staged(events, user_col, ts_col, value_col, round_to)
    fr = [i / buckets for i in range(1, buckets)]
    cuts = staged.agg(
        F.percentile_approx("recency_days", fr, accuracy).alias("_rcuts"),
        F.percentile_approx("frequency", fr, accuracy).alias("_fcuts"),
        F.percentile_approx("_mc", fr, accuracy).alias("_mcuts"),
    )

    def _score(metric: str, cuts_col: str):
        # 1 + #(cuts strictly below the value): JVM-side array fold
        return F.expr(
            f"1 + aggregate({cuts_col}, 0, "
            f"(acc, c) -> acc + CASE WHEN {metric} > c THEN 1 ELSE 0 END)"
        ).cast("int")

    out = staged.crossJoin(F.broadcast(cuts)).select(
        "user",
        "recency_days",
        "frequency",
        "monetary",
        # recency: smaller is better -> invert the ascending score
        (F.lit(buckets + 1) - _score("recency_days", "_rcuts"))
        .cast("int")
        .alias("r"),
        _score("frequency", "_fcuts").alias("f"),
        _score("_mc", "_mcuts").alias("m"),
    )
    return out.withColumn(
        "segment",
        F.concat(F.col("r").cast("string"), F.col("f").cast("string"),
                 F.col("m").cast("string")),
    )


def top_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
    max_steps: int = 5,
    top_k: int = 10,
) -> DataFrame:
    """Most common journey openings: each user's first ``max_steps``
    event types (ts, event_id)-ordered, joined into a '>'-delimited
    path string, counted across users, top ``top_k`` by (n desc, path
    asc). The full-sequence companion to event_transitions — "what do
    the first five steps actually look like", the view onboarding
    funnels are designed FROM.

    Scale shape: ONE user-keyed window pass caps every user at
    ``max_steps`` rows BEFORE any list materializes (the per-user
    collect is bounded by construction — no power-user blowup), then
    a path-keyed count and a TakeOrdered. Determinism: the (ts,
    event_id) total order fixes each path; array_sort on the (seq,
    type) struct rebuilds the order inside the aggregate, so the path
    string is engine-exact.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(event_id_col).asc()
    )
    capped = (
        events.withColumn("_seq", F.row_number().over(w))
        .filter(F.col("_seq") <= max_steps)
        .select(F.col(user_col).alias("_u"), "_seq", F.col(type_col).alias("_t"))
    )
    per_user = capped.groupBy("_u").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_seq", "_t"))),
                lambda s: s["_t"],
            ),
            ">",
        ).alias("path")
    )
    return (
        per_user.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(top_k)
    )


def attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """First-touch / last-touch conversion attribution: for every
    conversion event, credit the FIRST and the LAST non-conversion
    event type preceding it in the user's (ts, event_id)-ordered
    stream, then aggregate per channel — ``(channel, first_touch_n,
    first_touch_revenue, last_touch_n, last_touch_revenue)``.
    Conversions with no preceding channel land in ``(none)``. The
    marketing-analytics sibling of funnel/retention/event_paths.

    Scale shape: ONE user-keyed window pass carries both candidate
    channels (first/last ignore-nulls over the running frame — no
    self-join against the conversion set), then two channel-keyed
    aggregates over conversions only and a full outer join of two
    |channels|-row tables. Revenue in exact integer cents.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(event_id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    channel_ev = F.when(
        F.col(type_col) != conversion_type, F.col(type_col)
    )
    conv = (
        events.withColumn(
            "_ft", F.first(channel_ev, ignorenulls=True).over(w)
        )
        .withColumn("_lt", F.last(channel_ev, ignorenulls=True).over(w))
        .filter(F.col(type_col) == conversion_type)
        .withColumn(
            "_v_c",
            F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint"),
        )
    )
    ft = conv.groupBy(
        F.coalesce(F.col("_ft"), F.lit("(none)")).alias("channel")
    ).agg(
        F.count("*").cast("bigint").alias("first_touch_n"),
        F.sum("_v_c").alias("_fr_c"),
    )
    lt = conv.groupBy(
        F.coalesce(F.col("_lt"), F.lit("(none)")).alias("channel")
    ).agg(
        F.count("*").cast("bigint").alias("last_touch_n"),
        F.sum("_v_c").alias("_lr_c"),
    )
    return (
        ft.join(lt, "channel", "outer")
        .select(
            "channel",
            F.coalesce("first_touch_n", F.lit(0))
            .cast("bigint")
            .alias("first_touch_n"),
            (F.coalesce("_fr_c", F.lit(0)) / 100.0).alias(
                "first_touch_revenue"
            ),
            F.coalesce("last_touch_n", F.lit(0))
            .cast("bigint")
            .alias("last_touch_n"),
            (F.coalesce("_lr_c", F.lit(0)) / 100.0).alias(
                "last_touch_revenue"
            ),
        )
        .orderBy("channel")
    )


def attribution_multitouch(
    events: DataFrame,
    conversion_type: str = "purchase",
    model: str = "linear",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Multi-touch conversion attribution — every channel event since
    the user's PREVIOUS conversion shares the next conversion's value:
    ``(channel, touches, conversions_touched, credit)`` with credit in
    whole currency (internally exact integer MICRO-cents).

    Models:
    - ``linear``: each of the n touches gets value/n (floor micro);
    - ``position``: 40% first touch, 40% last, middles share the
      remaining 20% (the standard U-shape; n=1 → 100%, n=2 → 50/50).

    Scale shape — no self-join against the conversion set: a REVERSE
    running count of conversions over the user's (ts, event_id) order
    assigns every row its conversion group (the touches before
    conversion g share g), then group-scoped window stats (touch
    count, touch rank, the group's conversion value) price each touch,
    and ONE channel-keyed aggregate finishes. Cost: two window passes
    + one aggregate, all keyed by user/channel — the same single-pass
    discipline as :func:`attribution`. Floor division loses < 1 micro
    per touch, identically in any engine (DuckDB-parity pytest).
    """
    if model not in ("linear", "position"):
        raise ValueError(f"unknown attribution model: {model!r}")
    is_conv = (F.col(type_col) == conversion_type).cast("int")
    w_rev = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(event_id_col).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # group g = #conversions at-or-after this row: a conversion row and
    # the touches since the previous conversion share g (g=0 rows trail
    # the last conversion — unattributable, dropped)
    staged = events.withColumn("_g", F.sum(is_conv).over(w_rev)).filter(
        F.col("_g") > 0
    )
    wg = Window.partitionBy(user_col, "_g")
    wg_ord = wg.orderBy(F.col(ts_col).asc(), F.col(event_id_col).asc())
    is_touch = F.col(type_col) != conversion_type
    v_micro = (
        F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
        * F.lit(1_000_000)
    )
    staged = (
        staged.withColumn(
            "_n", F.sum(is_touch.cast("int")).over(wg).cast("bigint")
        )
        .withColumn(
            "_conv_vm",
            F.max(F.when(~is_touch, v_micro)).over(wg).cast("bigint"),
        )
        .withColumn(
            "_rk",
            F.sum(is_touch.cast("int")).over(
                wg_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(is_touch & F.col("_conv_vm").isNotNull())
    )
    if model == "linear":
        credit = F.expr("_conv_vm DIV _n")
    else:
        first = F.col("_rk") == 1
        last = F.col("_rk") == F.col("_n")
        credit = (
            F.when(F.col("_n") == 1, F.col("_conv_vm"))
            .when(
                F.col("_n") == 2, F.expr("_conv_vm DIV 2")
            )
            .when(first | last, F.expr("_conv_vm * 40 DIV 100"))
            .otherwise(F.expr("(_conv_vm * 20 DIV 100) DIV (_n - 2)"))
        )
    return (
        staged.withColumn("_credit", credit.cast("bigint"))
        .groupBy(F.col(type_col).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("touches"),
            F.count_distinct(F.col(user_col), F.col("_g"))
            .cast("bigint")
            .alias("conversions_touched"),
            (F.sum("_credit") / F.lit(1e8)).alias("credit"),
        )
        .orderBy("channel")
    )
