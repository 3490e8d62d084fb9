"""Shuffle-key skew diagnostics.

Every groupBy/join in this engine shuffles on a key, and a skewed key
is the classic 100 TB failure mode: one straggler task holds a
mega-key while the rest of the cluster idles. AQE's skew-join handles
the join case at runtime; this operator is the PLANNING view — run it
on a candidate key column before committing a pipeline to that key,
and read off how many salt buckets would level the heavy keys (the
same salting the engine's dedup/cap operators apply internally, e.g.
operators/sampling.py::cap_per_group's two-phase top-k).

Scale shape: ONE aggregation keyed by the key column (map-side
combinable), a broadcast one-row total, and a top-k TakeOrdered — the
report is k rows however large the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Heaviest ``top_k`` keys of ``key_col`` — ``(key, n, share,
    salt_factor)`` by count descending (ties on key):

    - ``share``  = the key's fraction of all rows (a straggler task's
      share of the shuffle);
    - ``salt_factor`` = ceil(n / avg rows per key) — the number of salt
      buckets that splits this key into average-key-sized pieces (1 =
      already average or below).
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("_total"), round_to).alias("share"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("n") * F.col("_n_keys") / F.col("_total")),
            )
            .cast("int")
            .alias("salt_factor"),
        )
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_k)
    )
