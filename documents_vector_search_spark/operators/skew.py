"""Skew-resilient aggregation: two-phase salted groupBy.

AQE's skew-join splitting (on in session.py) handles skewed JOINS; a
skewed AGGREGATION key (one language dominating lang-stats, one
boilerplate dedup bucket holding half the corpus) still funnels into a
single reducer. The classic fix: salt the key into ``num_salts``
sub-keys, partial-aggregate on (key, salt), then finish on key — the
heavy key's work spreads across ``num_salts`` reducers.

Only aggregations with a decomposition (sum/count/min/max, and avg via
sum+count) qualify — the same algebra that makes map-side partial
aggregation possible.

Use when a groupBy key's heavy hitters exceed ~1 task's worth of rows;
for uniform keys the extra shuffle stage is pure overhead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial expr builder, final expr builder) per supported agg
_DECOMPOSED = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """``aggs``: output_name -> (agg_fn, input_col); agg_fn in
    sum/count/min/max. Equivalent to
    ``df.groupBy(keys).agg(...)`` but skew-spread over ``num_salts``
    partial groups.

    Example::

        salted_aggregate(events, ["event_type"],
                         {"n": ("count", "*"), "total": ("sum", "value")})
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _DECOMPOSED:
            raise ValueError(f"unsupported salted agg: {fn} (for {name})")

    partial_exprs = [
        _DECOMPOSED[fn][0](F.col(c) if c != "*" else F.lit(1)).alias(f"_p_{name}")
        for name, (fn, c) in aggs.items()
    ]
    salted = df.withColumn("_salt", (F.rand(seed=42) * num_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    final_exprs = [
        _DECOMPOSED[fn][1](F.col(f"_p_{name}")).alias(name)
        for name, (fn, _c) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join: every left row gets a deterministic salt
    in [0, ``num_salts``); the right side replicates once per salt
    value; the join runs on (key, salt), so a mega-key's rows spread
    over ``num_salts`` tasks instead of funneling into one straggler.
    Result-identical to ``left.join(right, key, how)`` — each left row
    meets exactly ONE replica of each matching right row.

    The manual fallback for the joins AQE's skew splitting cannot fix
    (skew invisible to runtime stats, or a build side that defeats
    the sort-merge splitter); ``skew_report`` names the keys and the
    salt factor to use. The right side REPLICATES ×num_salts: it must
    be the smaller input, and if it broadcasts anyway, broadcast() —
    salting a broadcast join is pure overhead.

    Only ``inner`` and ``left`` joins preserve semantics (an unmatched
    RIGHT row would surface once per replica under right/full/anti).
    The salt hashes all left columns — deterministic under task
    retries (a nondeterministic salt is illegal in a join key), with
    the documented caveat that byte-identical duplicate left rows
    share a salt.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join preserves only inner/left semantics, got {how!r}"
        )
    lt = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), num_salts),
    )
    rt = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    joined = lt.join(
        rt,
        (lt[left_key] == rt[right_key]) & (lt["_salt"] == rt["_salt"]),
        how,
    )
    return joined.drop("_salt")
