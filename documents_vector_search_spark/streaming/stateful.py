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
