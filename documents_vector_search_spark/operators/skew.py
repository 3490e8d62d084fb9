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
