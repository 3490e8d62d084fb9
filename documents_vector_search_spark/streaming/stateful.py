"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no true streaming (its "incremental" path is a
batch re-scan, SURVEY §2.6); on Spark the engine gets Structured
Streaming natively. This module adds the CUSTOM-stateful-operator
pattern on top: per-key state carried across micro-batches in the
state store (checkpointed, restart-safe), Arrow-batched Python logic.

``sessionize_stream``: gap-based session windows — the canonical
example of semantics no built-in windowed aggregation can express
(a session's extent depends on the events themselves, not a fixed
grid). The batch twin is registry.q_sessionize (oracle-checked);
this is the streaming form.

Scale notes (100 TB/day streams):
- State is per-key (one open session per user): O(active users), not
  O(events). The state store shuffles by the group key — uniform for
  user-like keys.
- Events inside one micro-batch arrive as Arrow record batches; the
  per-group fold is O(batch events log batch events) for the sort.
- ``idle_flush=True`` adds the production event-time timeout
  (GroupStateTimeout.EventTimeTimeout): a session whose gap has
  elapsed relative to the WATERMARK is flushed and its state evicted
  even if its user never sends another event — without it, state is
  O(all users ever seen), with it O(recently active users). Requires
  the caller to put ``withWatermark(ts_col, ...)`` on the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SESSION_OUTPUT_SCHEMA = (
    "user_id string, session_start timestamp, session_end timestamp, "
    "n_events long"
)
# open-session state: epoch seconds (floats survive the state-store
# round trip losslessly for ms-precision timestamps) + event count
SESSION_STATE_SCHEMA = "start double, end double, n long"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    idle_flush: bool = False,
) -> DataFrame:
    """Gap-based sessionization of a STREAMING DataFrame.

    Emits a row per CLOSED session (a session closes when a later event
    of the same user arrives more than ``gap_seconds`` after it ends);
    the open session per user lives in the state store across
    micro-batches and query restarts.

    ``idle_flush=True`` also closes sessions by EVENT-TIME TIMEOUT:
    once the watermark passes a session's end + gap, the session is
    emitted and its state evicted — the state store stays bounded by
    the number of RECENTLY ACTIVE users instead of growing forever.
    The input stream must carry ``withWatermark(ts_col, ...)``.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap = float(gap_seconds)

    def fold_sessions(key, pdfs, state):
        import pandas as pd

        def emit(closed):
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": pd.to_datetime(
                        [s for s, _, _ in closed], unit="s"
                    ),
                    "session_end": pd.to_datetime(
                        [e for _, e, _ in closed], unit="s"
                    ),
                    "n_events": [c for _, _, c in closed],
                }
            )

        if idle_flush and state.hasTimedOut:
            # watermark passed end + gap with no new events: the open
            # session is definitively closed (later events would be
            # beyond-watermark late and dropped upstream)
            if state.exists:
                start, end, n = state.get
                yield emit([(start, end, n)])
            state.remove()
            return

        if state.exists:
            start, end, n = state.get
        else:
            start = end = None
            n = 0

        stamps: list[float] = []
        for pdf in pdfs:
            # datetime64[ns] -> epoch seconds
            stamps.extend(pdf[ts_col].astype("int64") / 1e9)

        closed: list[tuple[float, float, int]] = []
        for t in sorted(stamps):
            if start is None:
                start = end = t
                n = 1
            elif t - end <= gap:
                end = t
                n += 1
            else:
                closed.append((start, end, n))
                start = end = t
                n = 1
        if start is not None:
            state.update((float(start), float(end), int(n)))
            if idle_flush:
                # fire when the watermark passes the session's gap edge;
                # Spark requires a timestamp strictly beyond the current
                # watermark, so clamp for sessions already at the edge
                timeout_ms = int((end + gap) * 1000)
                state.setTimeoutTimestamp(
                    max(timeout_ms, state.getCurrentWatermarkMs() + 1)
                )
        if closed:
            yield emit(closed)

    return events.groupBy(user_col).applyInPandasWithState(
        fold_sessions,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if idle_flush
            else GroupStateTimeout.NoTimeout
        ),
    )


TRANSITIONS_OUTPUT_SCHEMA = (
    "user_id string, from_type string, to_type string"
)
# last-seen event per user: epoch seconds + the (event_id, type)
# tiebreaker/payload
TRANSITIONS_STATE_SCHEMA = "ts double, eid long, tp string"


def transitions_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of operators/paths.py::event_transitions: emit
    one ``(user, from_type, to_type)`` row per adjacent pair in each
    user's (ts, event_id)-ordered stream, INCLUDING the pair that
    spans a micro-batch boundary — the per-user last event lives in
    the state store across batches and restarts. Downstream, the same
    ``groupBy(from_type, to_type).count()`` as the batch operator
    turns the emitted pairs into the transition matrix.

    Late events — arriving after a LATER (ts, event_id) event of the
    same user has already been absorbed into state — are dropped (the
    watermark contract: an upstream ``withWatermark`` bounds how late
    that can happen; within one micro-batch, order doesn't matter
    because the batch sorts before folding).

    Scale shape: state is ONE row per active user (O(users), not
    O(events)); the state store shuffles on the user key once — the
    same bound as sessionize_stream.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold_transitions(key, pdfs, state):
        import pandas as pd

        if state.exists:
            last_ts, last_eid, last_tp = state.get
        else:
            last_ts = last_eid = last_tp = None

        rows: list[tuple[float, int, str]] = []
        for pdf in pdfs:
            ts = pdf[ts_col].astype("int64") / 1e9
            for t, e, tp in zip(ts, pdf[event_id_col], pdf[type_col]):
                rows.append((float(t), int(e), str(tp)))
        rows.sort()

        out_from: list[str] = []
        out_to: list[str] = []
        for t, e, tp in rows:
            if last_ts is not None and (t, e) < (last_ts, last_eid):
                continue  # late: a later event already extended state
            if last_tp is not None:
                out_from.append(last_tp)
                out_to.append(tp)
            last_ts, last_eid, last_tp = t, e, tp

        if last_ts is not None:
            state.update((float(last_ts), int(last_eid), str(last_tp)))
        if out_from:
            yield pd.DataFrame(
                {
                    "user_id": [str(key[0])] * len(out_from),
                    "from_type": out_from,
                    "to_type": out_to,
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fold_transitions,
        outputStructType=TRANSITIONS_OUTPUT_SCHEMA,
        stateStructType=TRANSITIONS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ANOMALY_OUTPUT_SCHEMA = (
    "series string, day timestamp, total double, z double, "
    "is_anomaly boolean"
)
# per-series trailing baseline: the OPEN day's accumulator plus the
# last `window` CLOSED days' (epoch-day, integer-cent total) pairs —
# bounded at window+1 entries per series regardless of stream length
ANOMALY_STATE_SCHEMA = (
    "open_day double, open_total long, days array<double>, "
    "totals array<long>"
)


def anomaly_stream(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
    min_periods: int = 3,
    threshold: int = 3,
) -> DataFrame:
    """Streaming twin of operators/timeseries.py::rolling_zscore: as a
    day CLOSES (a later day's first event arrives for the series), its
    total is scored against the trailing ``window_days`` closed days
    with the SAME exact-integer algebra as the batch operator — z from
    int64 sums, the flag a pure integer inequality — and one
    ``(series, day, total, z, is_anomaly)`` row is emitted.

    Contracts (mirroring the batch twin's observed-days frame):
    - A day emits only when a LATER day arrives for its series; the
      final open day of a stream is never scored (it could still
      receive events). Late events for an already-closed day are
      dropped — put ``withWatermark(ts_col, ...)`` upstream to bound
      how late that can happen.
    - State per series is the open-day accumulator plus at most
      ``window_days`` closed (day, total) pairs — O(series ×
      window), not O(events) and not O(days streamed).
    """
    import math

    from pyspark.sql.streaming.state import GroupStateTimeout

    day_secs = 86400.0

    def score(x, trail_totals):
        n = len(trail_totals)
        if n < min_periods:
            return None, False
        s = sum(trail_totals)
        sq = sum(t * t for t in trail_totals)
        dev = n * x - s
        vt = n * sq - s * s
        flagged = dev * dev > threshold * threshold * vt
        if vt <= 0:
            return None, flagged
        z = dev / math.sqrt(vt)
        return math.floor(z * 1e6 + 0.5) / 1e6, flagged

    def fold(key, pdfs, state):
        import pandas as pd

        if state.exists:
            open_day, open_total, days, totals = state.get
            days, totals = list(days), list(totals)
        else:
            open_day, open_total, days, totals = None, 0, [], []

        per_day: dict[float, int] = {}
        for pdf in pdfs:
            secs = pdf[ts_col].astype("int64") / 1e9
            for t, v in zip(secs, pdf[value_col]):
                d = math.floor(t / day_secs) * day_secs
                per_day[d] = per_day.get(d, 0) + int(
                    math.floor(v * 100 + 0.5)
                )

        out: list[tuple[float, int]] = []
        for d in sorted(per_day):
            if open_day is not None and d < open_day:
                continue  # late for a closed day: dropped (watermark)
            if open_day is None:
                open_day, open_total = d, 0
            elif d > open_day:
                out.append((open_day, open_total))
                open_day, open_total = d, 0
            open_total += per_day[d]

        if open_day is not None:
            new_days = (days + [d for d, _ in out])[-window_days:]
            new_totals = (totals + [t for _, t in out])[-window_days:]
            state.update(
                (
                    float(open_day),
                    int(open_total),
                    [float(x) for x in new_days],
                    [int(x) for x in new_totals],
                )
            )
        if out:
            rows = []
            # score each closed day against the trail AS OF its close:
            # the batch-start trail plus the days closed before it in
            # this batch, trimmed to the window
            for i, (d, tot) in enumerate(out):
                trail = (totals + [t for _, t in out[:i]])[-window_days:]
                z, flagged = score(tot, trail)
                rows.append((d, tot, z, flagged))
            yield pd.DataFrame(
                {
                    "series": [str(key[0])] * len(rows),
                    "day": pd.to_datetime([r[0] for r in rows], unit="s"),
                    "total": [r[1] / 100.0 for r in rows],
                    "z": [r[2] for r in rows],
                    "is_anomaly": [r[3] for r in rows],
                }
            )

    return events.groupBy(series_col).applyInPandasWithState(
        fold,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUTPUT_SCHEMA = "user_id string, stage long, stage_ts timestamp"
# per-user funnel progress: k stage timestamps (int64 epoch NANOSECONDS,
# -1 = unreached) + the last absorbed (ts, event_id) for late-event
# detection — one bounded row per user regardless of event volume.
# int64 ns, not float seconds: float64 collapses sub-~0.24µs ts
# differences at current epochs, which could flip the (ts, event_id)
# total order and the late-event gate vs the batch operator's exact
# nanosecond ordering for near-tie events.
FUNNEL_STATE_SCHEMA = "stages array<long>, last_ts long, last_eid long"


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of operators/funnel.py::funnel_stage_times — the
    REAL-TIME funnel. Emits one append-mode row ``(user, stage,
    stage_ts)`` the moment a user first completes stage ``stage``
    (1-based) having already completed every earlier stage; a stage
    fires AT MOST ONCE per user, so the emitted stream is exactly the
    conversion-moment log, and a plain
    ``groupBy(stage).count()`` downstream is the live funnel report.

    Semantics match the batch operator under the same (ts, event_id)
    total order: within a micro-batch events are sorted before
    folding; an event arriving in a LATER batch but event-time-earlier
    than the last absorbed event is dropped (the transitions_stream
    watermark contract — upstream ``withWatermark`` bounds how much
    can be lost, and the parity pytest pins stream == batch when
    batches split in order).

    Scale shape: state is ONE fixed-width row per user (k stage
    slots), shuffled once on the user key per micro-batch — the same
    O(active users) bound as sessionize_stream; a production deploy
    would add an event-time TTL timeout to evict users whose funnel
    window has lapsed (the sessionize idle_flush pattern)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    k = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}

    def fold(key, pdfs, state):
        import pandas as pd

        if state.exists:
            stages, last_ts, last_eid = state.get
            stages = list(stages)
        else:
            stages = [-1.0] * k
            last_ts = last_eid = None

        rows: list[tuple[int, int, str]] = []
        for pdf in pdfs:
            # raw int64 nanoseconds — exact, unlike float64 seconds
            ts = pdf[ts_col].astype("int64")
            for t, e, tp in zip(ts, pdf[event_id_col], pdf[type_col]):
                rows.append((int(t), int(e), str(tp)))
        rows.sort()

        fired: list[tuple[int, int]] = []
        for t, e, tp in rows:
            if last_ts is not None and (t, e) < (last_ts, last_eid):
                continue  # late: state already moved past this instant
            last_ts, last_eid = t, e
            n_filled = sum(1 for s in stages if s >= 0)
            if n_filled < k and step_idx.get(tp) == n_filled:
                stages[n_filled] = t
                fired.append((n_filled + 1, t))

        state.update(
            (
                [int(s) for s in stages],
                int(last_ts) if last_ts is not None else -1,
                int(last_eid) if last_eid is not None else -1,
            )
        )
        if fired:
            yield pd.DataFrame(
                {
                    "user_id": [str(key[0])] * len(fired),
                    "stage": [s for s, _ in fired],
                    "stage_ts": pd.to_datetime(
                        [t for _, t in fired], unit="ns"
                    ),
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_SCHEMA = (
    "series string, day timestamp, total double, "
    "cusum_hi_c long, cusum_lo_c long, shift_up boolean, shift_down boolean"
)
# per-series CUSUM state: the open day accumulator + the two one-sided
# cumulative sums (integer cents) — O(1) per series, the smallest
# stateful-analytics footprint in the engine. open_day is an integer
# day index (epoch ns DIV 86400e9), never float seconds: float64
# collapses sub-~0.24us timestamp differences, which could bucket an
# event within ~0.2us of midnight into the wrong day vs the batch
# daily_series truncation (same fix as funnel_stream's int64-ns state).
# CHECKPOINT COMPATIBILITY: open_day changed double -> long in r11.
# A cusum_stream restarted from a checkpoint written before that
# change fails Spark's state-schema validation (or, on versions
# without validation, misreads the stored doubles as longs) — discard
# the old checkpoint directory and replay from the source when
# upgrading across the schema change.
CUSUM_STATE_SCHEMA = "open_day long, open_total long, s_hi long, s_lo long"


DAU_OUTPUT_SCHEMA = "day date, k_used long, est_dau double"
# per-day KMV sketch state: the <= k smallest distinct md5 user
# hashes, sorted ascending. THE approx-distinct contract that makes
# streaming DAU viable at all: exact distinct-user state is unbounded
# (one entry per user per day — millions of longs per day at scale),
# so exact DAU stays batch-only (operators/timeseries.py::
# active_users); the stream carries O(k) longs per day (~2 KB at
# k=256, ~1/sqrt(k) ~ 6% relative error) and, because KMV is
# deterministic (Beyer et al. 2007 over md5 hashes), the stream's
# final per-day estimate equals operators/timeseries.py::dau_kmv
# BIT-EXACTLY (parity pytest) — not "approximately the same sketch",
# the same number.
DAU_STATE_SCHEMA = "hashes array<long>"


def dau_stream(
    events: DataFrame,
    k: int = 256,
    user_col: str = "user_id",
    ts_col: str = "ts",
    round_to: int = 6,
) -> DataFrame:
    """Streaming twin of operators/timeseries.py::dau_kmv — per-day
    approximate distinct active users with BOUNDED state (see
    DAU_STATE_SCHEMA for the contract). Emits ``(day, k_used,
    est_dau)`` for every day a micro-batch touches, with the estimate
    REFINED as the day's sketch absorbs more users: downstream sinks
    upsert on ``day`` (append mode re-emits the day's row each batch
    that updates it; the LAST row per day is the day's answer and
    equals the batch dau_kmv estimate exactly). Unlike the day-close
    operators (anomaly/cusum) nothing waits for a later day — a
    dashboard reads today's DAU all day long.

    The user hash is computed SPARK-side (functions/hashing.py
    md5_hash64 over the stringified user id) before the stateful fold,
    so the sketch is bit-identical to every batch KMV in the engine;
    the fold itself only merges int64s and keeps the k smallest
    distinct."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from documents_vector_search_spark.functions.hashing import md5_hash64

    space = float(1 << 60)  # md5_hash64 is 60-bit (sketches.py)
    keyed = events.select(
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("day"),
        md5_hash64(F.col(user_col).cast("string")).alias("h"),
    )

    def fold(key, pdfs, state):
        import pandas as pd

        kept = list(state.get[0]) if state.exists else []
        merged = set(kept)
        for pdf in pdfs:
            merged.update(int(h) for h in pdf["h"])
        kept = sorted(merged)[:k]
        state.update((kept,))
        k_used = len(kept)
        kth = kept[-1]
        est = round((k_used - 1) / (kth / space), round_to) if kth else 0.0
        yield pd.DataFrame(
            {"day": [key[0]], "k_used": [k_used], "est_dau": [est]}
        )

    return keyed.groupBy("day").applyInPandasWithState(
        fold,
        outputStructType=DAU_OUTPUT_SCHEMA,
        stateStructType=DAU_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_stream(
    events: DataFrame,
    target_c: int,
    slack_pct: int = 50,
    threshold_pct: int = 500,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of operators/timeseries.py::cusum_changepoints
    with a KNOWN target level (``target_c`` integer cents — the
    classical Page 1954 online form): per closed day, update the two
    one-sided cumulative sums and emit ``(series, day, total,
    cusum_hi_c, cusum_lo_c, shift_up, shift_down)`` exactly as the
    batch operator computes them (restart-parity pytest).

    Same day-close contract as anomaly_stream: a day emits only when a
    later day arrives for its series; late events for a closed day are
    dropped (bound it with ``withWatermark`` upstream). State is FOUR
    scalars per series — not the history, not the window — because the
    CUSUM recurrence is online by construction.
    """
    import math

    from pyspark.sql.streaming.state import GroupStateTimeout

    day_ns = 86400 * 10**9
    k = target_c * slack_pct // 100
    h = target_c * threshold_pct // 100

    def fold(key, pdfs, state):
        import pandas as pd

        if state.exists:
            open_day, open_total, s_hi, s_lo = state.get
        else:
            open_day, open_total, s_hi, s_lo = None, 0, 0, 0

        per_day: dict[int, int] = {}
        for pdf in pdfs:
            day_idx = pdf[ts_col].astype("int64") // day_ns
            for d, v in zip(day_idx, pdf[value_col]):
                d = int(d)
                per_day[d] = per_day.get(d, 0) + int(
                    math.floor(v * 100 + 0.5)
                )

        closed: list[tuple[int, int]] = []
        for d in sorted(per_day):
            if open_day is not None and d < open_day:
                continue  # late for a closed day: dropped (watermark)
            if open_day is None:
                open_day, open_total = d, 0
            elif d > open_day:
                closed.append((open_day, open_total))
                open_day, open_total = d, 0
            open_total += per_day[d]

        rows = []
        for d, tot in closed:
            s_hi = max(0, s_hi + tot - target_c - k)
            s_lo = max(0, s_lo - (tot - target_c + k))
            rows.append((d, tot, s_hi, s_lo, s_hi > h, s_lo > h))

        if open_day is not None:
            state.update(
                (int(open_day), int(open_total), int(s_hi), int(s_lo))
            )
        if rows:
            yield pd.DataFrame(
                {
                    "series": [str(key[0])] * len(rows),
                    "day": pd.to_datetime(
                        [r[0] * 86400 for r in rows], unit="s"
                    ),
                    "total": [r[1] / 100.0 for r in rows],
                    "cusum_hi_c": [r[2] for r in rows],
                    "cusum_lo_c": [r[3] for r in rows],
                    "shift_up": [r[4] for r in rows],
                    "shift_down": [r[5] for r in rows],
                }
            )

    return events.groupBy(series_col).applyInPandasWithState(
        fold,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
