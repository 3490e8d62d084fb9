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

from documents_vector_search_spark.functions.text import tokenize
from documents_vector_search_spark.operators.classify import (
    _gram_array_from_tokens,
)
from documents_vector_search_spark.operators.dsir import _bucket_expr

DRIFT_BUCKETS = 256
DRIFT_MAX_N = 2


def psi_report(
    df: DataFrame,
    in_side_a: Column,
    value_col: str = "value",
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    round_to: int = 7,
) -> DataFrame:
    """Population Stability Index over equi-width numeric bins — the
    BI-facing twin of :func:`corpus_drift_report` (same A-vs-complement
    split contract, numeric column instead of hashed text grams).
    Output: one row per bin 0..n_bins-1, ``(bin, a_cnt, b_cnt,
    psi_c)`` ordered by bin; ``sum(psi_c)`` is the total PSI (the
    credit-scoring monitoring staple: <0.1 stable, 0.1-0.25 shifting,
    >0.25 drifted).

    Binning is EXACT integer arithmetic: values go to cents
    (floor(x·100+0.5)), edges are integer cents, and the bin id is one
    int64 floor-division — so the same row lands in the same bin in
    any engine (a float ``(x-lo)/width`` could straddle an edge by one
    ulp between engines). ``(hi-lo)·100`` must divide by ``n_bins``;
    out-of-range values clamp into the edge bins (the standard PSI
    convention — drifted mass beyond the fit range still counts).
    ``psi_c = (p-q)·ln(p/q)`` with add-one smoothing over
    ``total + n_bins`` so empty bins stay defined (the corpus_drift
    recipe), rounded to ``round_to``.

    Spark shape: one map-side bin assignment + ONE conditional
    aggregation over ``n_bins`` keys, a broadcast one-row totals join,
    then map-only math over the broadcast ``n_bins``-row dense spine
    (sequence(), driver-free) — identical cost profile to
    corpus_drift_report, bin count bounds every post-scan stage."""
    lo_c = int(round(lo * 100))
    hi_c = int(round(hi * 100))
    if hi_c <= lo_c or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    if (hi_c - lo_c) % n_bins:
        raise ValueError(
            f"(hi-lo)*100 = {hi_c - lo_c} cents must divide by"
            f" n_bins = {n_bins} for exact integer bin edges"
        )
    width_c = (hi_c - lo_c) // n_bins
    x_c = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
    # clamp BEFORE the division so DIV only ever sees non-negative
    # operands (Spark DIV truncates, DuckDB // floors — they agree
    # only on non-negatives; the registry-wide convention)
    clamped = F.least(F.lit(hi_c - 1), F.greatest(F.lit(lo_c), x_c))
    bin_id = (
        (clamped - F.lit(lo_c)) - ((clamped - F.lit(lo_c)) % F.lit(width_c))
    ) / F.lit(width_c)
    bin_id = bin_id.cast("int")
    counts = df.select(
        in_side_a.alias("_a"), bin_id.alias("bin")
    ).groupBy("bin").agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("a_cnt"),
        F.sum(F.when(F.col("_a"), 0).otherwise(1)).alias("b_cnt"),
    )
    spine = (
        df.sparkSession.range(1)
        .select(F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"))
        .select(F.col("bin").cast("int").alias("bin"))
    )
    dense = spine.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("a_cnt", F.lit(0)).cast("bigint").alias("a_cnt"),
        F.coalesce("b_cnt", F.lit(0)).cast("bigint").alias("b_cnt"),
    )
    totals = dense.agg(
        (F.sum("a_cnt") + F.lit(n_bins)).alias("_ta"),
        (F.sum("b_cnt") + F.lit(n_bins)).alias("_tb"),
    )
    joined = dense.crossJoin(F.broadcast(totals))
    p = (F.col("a_cnt") + F.lit(1)).cast("double") / F.col("_ta").cast(
        "double"
    )
    q = (F.col("b_cnt") + F.lit(1)).cast("double") / F.col("_tb").cast(
        "double"
    )
    return joined.select(
        "bin",
        "a_cnt",
        "b_cnt",
        F.round((p - q) * F.log(p / q), round_to).alias("psi_c"),
    ).orderBy("bin")


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
    # tokens staged as a generator output (see
    # classify._gram_array_from_tokens — Generate gets no codegen
    # subexpression elimination, so an inline tokenize would re-run
    # once per reference in the gram build)
    occ = (
        docs.select(
            in_side_a.alias("_a"),
            F.explode_outer(F.array(tokenize(text_col))).alias("_toks"),
        )
        .select(
            "_a",
            F.explode(
                _gram_array_from_tokens(F.col("_toks"), max_n)
            ).alias("_g"),
        )
        .select("_a", _bucket_expr(F.col("_g"), n_buckets).alias("bucket"))
    )
    # ≤ n_buckets rows, referenced TWICE below (the totals broadcast
    # and the join) — materialize so the corpus gram pass runs once
    counts = occ.groupBy("bucket").agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("a_cnt"),
        F.sum(F.when(F.col("_a"), 0).otherwise(1)).alias("b_cnt"),
    ).localCheckpoint()
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
