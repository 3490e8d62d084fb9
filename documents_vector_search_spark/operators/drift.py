"""Corpus drift monitoring: content-distribution divergence.

A continuously-updated corpus (streaming intake, incremental updates)
can drift away from what its quality gates and topic/quantizer fits
were tuned on. This operator quantifies drift WITHOUT interpreting
content: both corpus slices project onto the same hashed-n-gram bucket
space (the DSIR/classifier featurization), and the per-bucket
Jensen-Shannon divergence contributions rank WHERE the distributions
disagree. The total is bounded [0, ln 2] — a stable drift gauge to
alert on; the refit family (collection/refit.py) is the remediation.

Spark shape: one explode + ONE conditional aggregation over
``n_buckets`` keys (map-side partial), a broadcast single-row totals
join, then map-only math on ≤ n_buckets rows. No driver collect at
all — the report is itself a (tiny) DataFrame.

Determinism: all counts are exact int64; probabilities divide exact
ints; contributions round to 7 before the top-k ordering (ties break
on bucket id), the registry's ln-ulp cushion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.classify import _gram_array
from documents_vector_search_spark.operators.dsir import _bucket_expr

DRIFT_BUCKETS = 256
DRIFT_MAX_N = 2


def corpus_drift_report(
    docs: DataFrame,
    in_side_a: Column,
    text_col: str = "text",
    n_buckets: int = DRIFT_BUCKETS,
    max_n: int = DRIFT_MAX_N,
    top: int = 20,
) -> DataFrame:
    """``(bucket, a_cnt, b_cnt, js_c)`` — the ``top`` buckets by
    Jensen-Shannon contribution between the ``in_side_a`` slice and its
    complement, descending (ties on bucket). ``sum(js_c)`` over ALL
    buckets is the total JS divergence; the returned slice localizes
    it. Add-one smoothing keeps every bucket defined on both sides."""
    occ = docs.select(
        in_side_a.alias("_a"),
        F.explode(_gram_array(F.col(text_col), max_n)).alias("_g"),
    ).select("_a", _bucket_expr(F.col("_g"), n_buckets).alias("bucket"))
    counts = occ.groupBy("bucket").agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("a_cnt"),
        F.sum(F.when(F.col("_a"), 0).otherwise(1)).alias("b_cnt"),
    )
    totals = counts.agg(
        (F.sum("a_cnt") + F.lit(n_buckets)).alias("_ta"),
        (F.sum("b_cnt") + F.lit(n_buckets)).alias("_tb"),
    )
    joined = counts.crossJoin(F.broadcast(totals))
    p = (F.col("a_cnt") + F.lit(1)).cast("double") / F.col("_ta").cast(
        "double"
    )
    q = (F.col("b_cnt") + F.lit(1)).cast("double") / F.col("_tb").cast(
        "double"
    )
    staged = joined.select(
        "bucket", "a_cnt", "b_cnt", p.alias("_p"), q.alias("_q")
    )
    m = F.lit(0.5) * (F.col("_p") + F.col("_q"))
    js = F.lit(0.5) * (F.col("_p") * F.log(F.col("_p") / m)) + F.lit(
        0.5
    ) * (F.col("_q") * F.log(F.col("_q") / m))
    return (
        staged.select(
            "bucket",
            F.col("a_cnt").cast("bigint").alias("a_cnt"),
            F.col("b_cnt").cast("bigint").alias("b_cnt"),
            F.round(js, 7).alias("js_c"),
        )
        .orderBy(F.col("js_c").desc(), F.col("bucket").asc())
        .limit(top)
    )
