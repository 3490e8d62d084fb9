"""As-of (temporal nearest) join as a single-shuffle composition.

Spark has no ASOF JOIN (DuckDB and pandas ``merge_asof`` do). The
naive range-join (``l.ts >= r.ts`` + per-row argmax) explodes to a
cross product per key — unusable at scale. This operator uses the
classic distributed formulation instead:

    union(tagged right, tagged left)
      → window last(right_payload, ignorenulls) over
          (partition by key order by ts, side rows unbounded preceding)
      → keep left rows

ONE shuffle on the join key, one within-partition sort — the same
cost as a regular co-partitioned join, independent of how many right
rows precede each left row. At 1000 executors the key hash spreads
users; no per-key quadratic anywhere.

Determinism: right rows must be unique per (key, ts) — pre-aggregate
duplicates first (the window's tie order among equal (ts, side) rows
is otherwise partition-layout-dependent, and DuckDB's ASOF has the
same ambiguity).

Known bound: one key's full history sorts within one task (any
per-key-ordered formulation shares this). A pathological mega-key
needs time-range pre-bucketing (split the key by coarse time window,
as-of within windows, stitch boundaries) — not built in because real
as-of keys (user, symbol, device) are bounded in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: attach the temporally nearest right row.

    ``backward`` (default): the latest right row with
    ``right.ts <= left.ts``; ``forward``: the earliest right row with
    ``right.ts >= left.ts`` — both inclusive, matching pandas
    ``merge_asof``. ``tolerance_s`` nulls out matches farther than
    that many seconds from the left timestamp.

    Output: every left row/column, plus ``<right_ts><suffix>`` and
    each of ``right_cols`` renamed ``<col><suffix>`` (null when no
    match). Unmatched left rows are kept (left join).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [right_ts]]

    payload = F.struct(
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
    )
    payload_type = r.schema["_r"].dataType

    left_payload_cols = list(left.columns)
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_r"),
        F.struct(*[F.col(c) for c in left_payload_cols]).alias("_l"),
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))
    u = l.unionByName(r)

    # backward: ascending ts, right (side 0) before left at equal ts →
    # the running last(right) at a left row is the latest right with
    # rts <= lts. forward: mirror with descending ts (right still
    # first at equal ts → earliest right with rts >= lts).
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc()]
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_r", ignorenulls=True).over(w)
    out = u.withColumn("_m", matched).filter(F.col("_side") == 1)

    if tolerance_s is not None:
        age = (
            F.col("_ts").cast("double") - F.col("_m._rts").cast("double")
            if direction == "backward"
            else F.col("_m._rts").cast("double") - F.col("_ts").cast("double")
        )
        out = out.withColumn(
            "_m",
            F.when(age <= F.lit(float(tolerance_s)), F.col("_m")),
        )

    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left_payload_cols],
        F.col(f"_m._rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
