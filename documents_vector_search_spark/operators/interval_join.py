"""Binned interval (range) join: events × time intervals at scale.

The relational form — ``JOIN ON ts >= start AND ts < end`` — has no
equi-key, so open-source Spark plans it as a BroadcastNestedLoopJoin:
every (event, interval) combination is COMPARED, O(|events| ×
|intervals|) work even when each event overlaps a handful of
intervals. (Commercial engines special-case this with a range-join
optimization; this operator is that optimization expressed in plain
DataFrame ops.)

The standard fix is binning: quantize time into fixed bins, explode
each interval into every bin it covers, map each event to its single
bin, equi-join on the bin, then apply the EXACT containment predicate
to discard same-bin near-misses. The join becomes a hash join keyed on
the bin — shuffle/broadcast machinery, AQE, and skew handling all
apply again.

Correctness: an event's bin is always within the bin span of any
interval containing it, so no qualifying pair is lost; each pair can
only meet in the event's single bin, so no pair duplicates — no
post-join dedup needed.

Tuning: ``bin_seconds`` trades interval fan-out (an interval explodes
into ``length/bin`` rows) against same-bin false candidates filtered
by the exact predicate. Set it near the TYPICAL interval length; a
pathological months-long interval fans out into months/bin rows —
bounded and linear, never quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 86400,
) -> DataFrame:
    """Inner-join ``events`` rows to every ``intervals`` row whose
    ``[start, end)`` contains the event's ``ts_col`` — via the binned
    equi-join (never a nested-loop plan). Returns all columns from both
    sides. The two sides may share column names (the containment
    predicate uses frame-qualified references); the internal bin column
    is uniquified against both schemas, so a caller's own ``_bin``
    style columns pass through untouched."""
    bin_name = "__interval_join_bin"
    while bin_name in events.columns or bin_name in intervals.columns:
        bin_name += "_"
    bin_us = int(bin_seconds) * 1_000_000
    ev = events.withColumn(
        bin_name, F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bin_us))
    )
    # an empty/inverted interval can contain nothing — and would make
    # F.sequence emit a DESCENDING bin range (Spark auto-steps -1),
    # fanning junk candidates the exact predicate then discards
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = intervals.withColumn(
        bin_name,
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / F.lit(bin_us)),
                F.floor(F.unix_micros(F.col(end_col)) / F.lit(bin_us)),
            )
        ),
    )
    return (
        ev.join(iv, ev[bin_name] == iv[bin_name])
        .filter(
            (ev[ts_col] >= iv[start_col]) & (ev[ts_col] < iv[end_col])
        )
        .drop(ev[bin_name])
        .drop(iv[bin_name])
    )
