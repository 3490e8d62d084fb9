"""Change-data-capture primitives: snapshot diff and SCD2 history.

The ingestion side of a 100 TB pipeline rarely gets clean change
streams — it gets periodic full snapshots (a nightly dump of a source
system, a re-crawl of a corpus). ``snapshot_diff`` turns two snapshots
into a changeset (added / removed / changed) with ONE key-shuffle
full-outer join; ``scd2_apply`` folds a changeset into a versioned
dimension (valid_from / valid_to / is_current) with one key-window
pass. Neither needs a driver-side loop, state store, or UDF.

Scale notes:
- ``snapshot_diff`` shuffles both snapshots once on the key. If the
  snapshots are persisted through ``operators/layout.py::write_bucketed``
  on the same key, the join runs with ZERO Exchange — the nightly-diff
  pattern at 100 TB is "bucket both snapshots once, diff for free".
- column comparison uses null-safe equality (``<=>``) so NULL→value
  and value→NULL transitions register as changes rather than vanishing
  under three-valued logic.
- ``scd2_apply`` is one window over (key, effective_ts) — linear in
  the change volume, never in the history size, because the current
  dimension contributes exactly one open row per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "apply_changeset", "scd2_apply", "scd2_as_of"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level changeset between two snapshots of the same table.

    Returns one row per key whose state differs:
    ``key_cols…, status ∈ {'added','removed','changed'},
    old_<col>…, new_<col>…`` (old_* NULL for added, new_* NULL for
    removed). Unchanged keys are dropped — at snapshot scale the
    changeset is the small output, the snapshots are the big inputs.

    One full-outer join on ``key_cols``; the change predicate is a
    null-safe column-wise comparison evaluated JVM-side, so the filter
    runs inside whole-stage codegen before anything materializes.
    """
    key_cols = list(key_cols)
    compare_cols = list(compare_cols)
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    # eqNullSafe so a NULL-valued key matches itself: with plain `=` a
    # NULL-keyed row would surface as both 'removed' and 'added' and the
    # roundtrip law old+diff==new would break (duplicate row), because
    # apply_changeset's anti-join could never drop the old row either.
    cond = None
    for k in key_cols:
        eq = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
        for k in key_cols
    ]
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *out_keys,
            "status",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    effective_ts_col: str = "effective_ts",
) -> DataFrame:
    """Type-2 slowly-changing-dimension fold.

    ``current`` is the open dimension (one row per key, attributes
    only); ``changes`` carries new attribute values stamped with
    ``effective_ts_col`` (epoch micros int64 — the registry's shared
    timestamp convention). Output is the full version history:
    ``key_cols…, attr_cols…, valid_from, valid_to, is_current`` where
    the pre-change row gets ``valid_from = NULL`` (open since before
    observation), each version closes at the next version's
    ``valid_from``, and the newest version per key has
    ``valid_to = NULL`` and ``is_current = true``.

    Consecutive changes that do not alter any attribute are collapsed
    (no-op versions produce no row), matching warehouse MERGE
    semantics. One window over (key, effective_ts); the dimension
    contributes one row per key so cost tracks the CHANGE volume.
    """
    key_cols = list(key_cols)
    attr_cols = list(attr_cols)
    base = current.select(
        *key_cols,
        *attr_cols,
        F.lit(None).cast("bigint").alias("valid_from"),
    )
    ch = changes.select(
        *key_cols,
        *attr_cols,
        F.col(effective_ts_col).cast("bigint").alias("valid_from"),
    )
    # attr columns as tiebreakers make same-instant changes (a data
    # smell, but real dumps have them) order deterministically
    order = [F.col("valid_from").asc_nulls_first()] + [
        F.col(a).asc_nulls_first() for a in attr_cols
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    versions = base.unionByName(ch)
    # collapse no-op versions: a row is kept iff any attribute differs
    # from the previous version of the same key (the first always stays)
    prev_same = F.lit(True)
    for a in attr_cols:
        prev_same = prev_same & F.col(a).eqNullSafe(F.lag(a).over(w))
    kept = versions.withColumn(
        "_keep", (F.row_number().over(w) == 1) | ~prev_same
    ).filter(F.col("_keep"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return kept.select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_as_of(
    history: DataFrame,
    ts: int,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time read over a :func:`scd2_apply` history: the one
    version per key whose validity interval contains ``ts`` (epoch
    micros int64, the registry convention) — ``valid_from <= ts <
    valid_to`` with NULL bounds open on that side. Keys that first
    appear after ``ts`` produce no row, so the result is exactly the
    dimension as it stood at ``ts``.

    Map-only: one codegen'd filter over the history scan (with the
    history partitioned or z-ordered on the key, a per-key probe also
    prunes); the is_current/validity columns drop because the output
    IS a plain dimension snapshot."""
    from_ok = F.col(valid_from_col).isNull() | (F.col(valid_from_col) <= ts)
    to_ok = F.col(valid_to_col).isNull() | (F.col(valid_to_col) > ts)
    return history.filter(from_ok & to_ok).drop(
        valid_from_col, valid_to_col, "is_current"
    )


def apply_changeset(
    old: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Patch a snapshot forward: ``old + snapshot_diff(old, new) ==
    new`` (the roundtrip law, property-tested). This is how a replica
    applies a nightly changeset without shipping the full dump —
    removed keys drop, changed keys take their ``new_*`` values, added
    keys insert.

    One left-anti join (touched keys out) + one union (added/changed
    rows in) — both keyed on ``key_cols``, so with both sides bucketed
    on the key (write_bucketed) the patch is Exchange-free, mirroring
    snapshot_diff. Columns outside ``key_cols + compare_cols`` are not
    carried by a changeset; the output has exactly those columns."""
    key_cols = list(key_cols)
    compare_cols = list(compare_cols)
    # null-safe anti-join (mirrors snapshot_diff's eqNullSafe join): a
    # name-based anti-join uses plain `=`, which would silently KEEP a
    # NULL-keyed old row that the changeset marks removed/changed
    touched = changes.select(
        *[F.col(k).alias(f"_ck_{k}") for k in key_cols]
    ).dropDuplicates()
    anti_cond = None
    for k in key_cols:
        eq = F.col(k).eqNullSafe(F.col(f"_ck_{k}"))
        anti_cond = eq if anti_cond is None else (anti_cond & eq)
    kept = old.select(*key_cols, *compare_cols).join(
        touched, anti_cond, "left_anti"
    )
    incoming = changes.filter(F.col("status") != "removed").select(
        *key_cols,
        *[F.col(f"new_{c}").alias(c) for c in compare_cols],
    )
    return kept.unionByName(incoming)
