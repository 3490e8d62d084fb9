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
per-key-ordered formulation shares this). For a pathological mega-key
(one device emitting billions of rows), pass ``coarse_bucket_s``:
rows are split into coarse time buckets, the as-of runs within each
(key, bucket) partition, and bucket boundaries are stitched with a
carry-in computed at BUCKET granularity (one row per key×bucket, never
per event). Task size then bounds by rows-per-(key,bucket) instead of
rows-per-key, at the cost of ~4 shuffles instead of 1 — the standard
skew trade; leave it off (default) for bounded keys.
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
    coarse_bucket_s: float | None = None,
) -> DataFrame:
    """Left as-of join: attach the temporally nearest right row.

    ``backward`` (default): the latest right row with
    ``right.ts <= left.ts``; ``forward``: the earliest right row with
    ``right.ts >= left.ts`` — both inclusive, matching pandas
    ``merge_asof``. ``tolerance_s`` nulls out matches farther than
    that many seconds from the left timestamp.

    ``coarse_bucket_s`` opts into mega-key mitigation: partition the
    per-key window by coarse time buckets of this many seconds and
    stitch bucket boundaries with a bucket-granularity carry-in (see
    module docstring). Pick it so one (key, bucket) holds a bounded
    row count — e.g. 86400 for a key emitting ~1M events/day.

    Output: every left row/column, plus ``<right_ts><suffix>`` and
    each of ``right_cols`` renamed ``<col><suffix>`` (null when no
    match). Unmatched left rows are kept (left join).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [right_ts]]
    if coarse_bucket_s is not None:
        return _asof_join_bucketed(
            left, right, keys, left_ts, right_ts, right_cols,
            direction, tolerance_s, suffix, float(coarse_bucket_s),
        )

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

    return _finalize_asof(
        out, left_payload_cols, right_ts, right_cols, suffix,
        tolerance_s, direction,
    )


def _finalize_asof(
    out: DataFrame,
    left_payload_cols: list[str],
    right_ts: str,
    right_cols: list[str],
    suffix: str,
    tolerance_s: float | None,
    direction: str,
) -> DataFrame:
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


def _asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str,
    tolerance_s: float | None,
    suffix: str,
    bucket_s: float,
) -> DataFrame:
    """Mega-key variant: per-key windows are split by coarse time
    bucket so no task ever sorts more than one (key, bucket) of rows.

    Three stages, all bounded:
    1. LOCAL: the running-last window runs within (key, bucket) — a
       left row whose predecessor is in the same bucket matches here.
    2. CARRY: one summary row per (key, bucket) (the bucket's last
       right row) feeds a window over BUCKETS (partition key, order
       bucket, frame ending at -1) — the latest right row in any
       strictly-earlier bucket. Bucket-granularity rows, never events.
    3. STITCH: left rows equi-join their (key, bucket) carry and
       coalesce(local, carry) — co-partitioned join, no skew.
    """
    backward = direction == "backward"

    payload = F.struct(
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in right_cols],
    )
    tb = lambda c: F.floor(F.col(c).cast("double") / F.lit(bucket_s))  # noqa: E731
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
    ).withColumn("_tb", tb("_ts"))
    payload_type = r.schema["_r"].dataType

    left_payload_cols = list(left.columns)
    l = (
        left.select(
            *[F.col(k) for k in keys],
            F.col(left_ts).alias("_ts"),
            F.lit(1).alias("_side"),
            F.lit(None).cast(payload_type).alias("_r"),
            F.struct(*[F.col(c) for c in left_payload_cols]).alias("_l"),
        )
        .withColumn("_tb", tb("_ts"))
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))
    u = l.unionByName(r)

    if backward:
        order = [F.col("_ts").asc(), F.col("_side").asc()]
        bucket_order = F.col("_tb").asc()
        rb_order = [F.col("_ts").desc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc()]
        bucket_order = F.col("_tb").desc()
        rb_order = [F.col("_ts").asc()]

    # 1. local pass within (key, bucket)
    w_local = (
        Window.partitionBy(*[F.col(k) for k in keys], F.col("_tb"))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.withColumn("_m_local", F.last("_r", ignorenulls=True).over(w_local))

    # 2. carry-in per (key, bucket): last right row of each bucket →
    #    running last over strictly-earlier buckets on the spine of
    #    ALL buckets either side occupies
    w_rb = Window.partitionBy(*[F.col(k) for k in keys], F.col("_tb")).orderBy(
        *rb_order
    )
    r_last = (
        r.withColumn("_rn", F.row_number().over(w_rb))
        .filter(F.col("_rn") == 1)
        .select(*keys, "_tb", F.col("_r").alias("_rb_last"))
    )
    spine = u.select(*keys, "_tb").distinct()
    w_carry = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(bucket_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        spine.join(r_last, keys + ["_tb"], "left")
        .withColumn("_carry", F.last("_rb_last", ignorenulls=True).over(w_carry))
        .select(*keys, "_tb", "_carry")
    )

    # 3. stitch: bucket-local match wins, else the carried-in one
    out = (
        local.filter(F.col("_side") == 1)
        .join(carry, keys + ["_tb"], "left")
        .withColumn("_m", F.coalesce(F.col("_m_local"), F.col("_carry")))
    )
    return _finalize_asof(
        out, left_payload_cols, right_ts, right_cols, suffix,
        tolerance_s, direction,
    )
