"""DSIR: Data Selection via Importance Resampling (Xie et al., 2023).

Public method (arXiv:2302.03169, the `dsir` PyPI package): pick
pretraining documents whose hashed-n-gram distribution looks like a
TARGET corpus. Both distributions are bag-of-hashed-n-gram unigram
models; each raw document gets a log importance weight
``log p_target(doc) - log p_raw(doc)`` and the selected set is sampled
with probability proportional to the importance weight — implemented
exactly as the paper does, via the Gumbel-top-k trick, with the Gumbel
noise derived from a deterministic per-document hash so the same corpus
always selects the same subset (resumable at 100 TB, oracle-checkable).

Spark shape:
- FIT is two integer aggregations: explode hashed gram buckets, one
  conditional count per (bucket, side). The result is ``n_buckets``
  rows (256 here) collected to the driver — bounded like every other
  fit in this engine (kmeans/classify), layout-independent.
- SCORING/SELECTION is the 100 TB side: a map-only Column expression
  (the per-bucket log-ratio table rides along as a literal array,
  exactly like classifier weights), then ONE TakeOrdered for the
  Gumbel top-k. No shuffle other than the top-k reduction.

Feature parity: buckets reuse the text-probe featurization
(classify._gram_array, md5-bucketed unigrams+bigrams) so fit and score
share one definition and the DuckDB oracle replays it verbatim.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.hashing import md5_hash64
from documents_vector_search_spark.functions.text import tokenize
from documents_vector_search_spark.functions.vectors import lit_double_array
from documents_vector_search_spark.operators.classify import (
    _gram_array,
    _gram_array_from_tokens,
)

DSIR_BUCKETS = 256
DSIR_MAX_N = 2
# hash-derived uniform grid for the Gumbel noise: (h mod 2^20 + 0.5)/2^20
# never hits 0 or 1, so -ln(-ln(u)) is always finite
_GUMBEL_MOD = 1 << 20
# log-ratios round to 7 decimals before scoring: ln() differs by ulps
# across libms, and the rounded table is what both engines fold with
_RATIO_ROUND = 7


def _bucket_expr(gram: Column, n_buckets: int) -> Column:
    return F.pmod(md5_hash64(gram), F.lit(n_buckets)).cast("int")


def fit_dsir_log_ratios(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    max_n: int = DSIR_MAX_N,
) -> list[float]:
    """Per-bucket ``round(ln(p_target[b]) - ln(p_raw[b]), 7)`` with
    add-one smoothing; ``p_raw`` is the WHOLE corpus (the paper fits
    raw on the pool being selected from). Distributed counting, a
    ``n_buckets``-row collect, driver-side ln."""
    # tokens staged as a generator output: the gram build then reads an
    # attribute instead of re-running tokenize per reference inside the
    # explode (Generate nodes get no codegen subexpression elimination —
    # see classify._gram_array_from_tokens)
    occ = (
        docs.select(
            is_target.alias("_t"),
            F.explode_outer(F.array(tokenize(text_col))).alias("_toks"),
        )
        .select(
            "_t",
            F.explode(
                _gram_array_from_tokens(F.col("_toks"), max_n)
            ).alias("_g"),
        )
        .select("_t", _bucket_expr(F.col("_g"), n_buckets).alias("_b"))
    )
    counts = (
        occ.groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("t_cnt"),
            F.count("*").alias("r_cnt"),
        )
        .collect()
    )
    t = [0] * n_buckets
    r = [0] * n_buckets
    for row in counts:
        t[row._b] = int(row.t_cnt)
        r[row._b] = int(row.r_cnt)
    t_tot = sum(t) + n_buckets
    r_tot = sum(r) + n_buckets
    return [
        round(
            math.log((t[b] + 1) / t_tot) - math.log((r[b] + 1) / r_tot),
            _RATIO_ROUND,
        )
        for b in range(n_buckets)
    ]


def dsir_log_weight_from_grams(
    grams: Column,
    log_ratios: list[float],
    round_to: int = 6,
) -> Column:
    """:func:`dsir_log_weight_expr` over an ALREADY-STAGED gram array
    column. The expression references ``grams`` three times (fold
    input + two size() checks); when those references point at a
    materialized column the accesses are O(1), but an inline
    ``_gram_array(text)`` argument would be re-evaluated per reference
    (tokenize + gram build ×3 per row — measured 2.12s vs 1.20s for
    the sf0.1 scoring projection). Callers on the 100 TB path must
    project the gram array first (see :func:`dsir_select`)."""
    n_buckets = len(log_ratios)
    table = lit_double_array(log_ratios)
    total = F.aggregate(
        grams,
        F.lit(0.0),
        lambda acc, g: acc
        + F.element_at(
            table, _bucket_expr(g, n_buckets) + F.lit(1)
        ),
    )
    return F.round(
        F.when(F.size(grams) > 0, total / F.size(grams)).otherwise(
            F.lit(0.0)
        ),
        round_to,
    )


def dsir_log_weight_expr(
    text_col: Column,
    log_ratios: list[float],
    max_n: int = DSIR_MAX_N,
    round_to: int = 6,
) -> Column:
    """Mean per-gram log importance ratio as a pure Column expression
    (mean, not sum, so the weight is length-invariant — same convention
    as the text probe's averaged gram features). Gram-less documents
    weigh 0 (= the neutral ratio). Convenience single-Column form; hot
    paths should stage the gram array and use
    :func:`dsir_log_weight_from_grams`."""
    return dsir_log_weight_from_grams(
        _gram_array(text_col, max_n), log_ratios, round_to
    )


def dsir_select(
    docs: DataFrame,
    log_ratios: list[float],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_n: int = DSIR_MAX_N,
) -> DataFrame:
    """Gumbel-top-k importance resampling: keep the ``k`` documents
    maximizing ``logw + Gumbel(h(id))`` — an exact without-replacement
    sample with ``P(select) ∝ exp(logw)``, deterministic because the
    noise comes from ``md5('dsir:' || id)``. Returns
    ``(id, logw, gkey)`` ordered by the selection key."""
    u = (
        F.pmod(
            md5_hash64(F.concat(F.lit("dsir:"), F.col(id_col).cast("string"))),
            F.lit(_GUMBEL_MOD),
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_GUMBEL_MOD))
    # three-step projection: the gram ARRAY is staged first (the weight
    # fold references it three times, and only a materialized column
    # makes those references O(1) — see dsir_log_weight_from_grams),
    # then the fold lands in `logw`, then the selection key derives
    # from the materialized logw
    scored = docs.select(
        F.col(id_col),
        _gram_array(F.col(text_col), max_n).alias("_g"),
        u.alias("_u"),
    ).select(
        F.col(id_col),
        dsir_log_weight_from_grams(F.col("_g"), log_ratios).alias("logw"),
        F.col("_u"),
    ).select(
        F.col(id_col),
        "logw",
        F.round(
            F.col("logw") - F.log(-F.log(F.col("_u"))), 6
        ).alias("gkey"),
    )
    return scored.orderBy(F.col("gkey").desc(), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# Production-fast twin (the classify.py fast-family pattern): gram
# buckets come from xxhash64 over token hashes (operators/classify.py::
# fast_bucket_array — no gram STRING is ever built, no crypto hash),
# and fit/score share that ONE featurization. Deliberately not
# oracle-checkable (DuckDB cannot reproduce Spark's xxhash64); use the
# md5 family where independent verification matters, this one where
# 100 TB scoring throughput does. Selection noise also derives from
# xxhash64 so the whole fast path is JVM-hash-only.
# ---------------------------------------------------------------------------


def fit_dsir_log_ratios_fast(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    max_n: int = DSIR_MAX_N,
) -> list[float]:
    """Fast-family fit: identical counting/smoothing/rounding to
    :func:`fit_dsir_log_ratios`, over xxhash64 gram buckets."""
    from documents_vector_search_spark.operators.classify import (
        fast_bucket_array,
    )

    occ = docs.select(
        is_target.alias("_t"),
        F.explode(
            fast_bucket_array(F.col(text_col), n_buckets, max_n)
        ).alias("_b"),
    )
    counts = (
        occ.groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("t_cnt"),
            F.count("*").alias("r_cnt"),
        )
        .collect()
    )
    t = [0] * n_buckets
    r = [0] * n_buckets
    for row in counts:
        t[row._b] = int(row.t_cnt)
        r[row._b] = int(row.r_cnt)
    t_tot = sum(t) + n_buckets
    r_tot = sum(r) + n_buckets
    return [
        round(
            math.log((t[b] + 1) / t_tot) - math.log((r[b] + 1) / r_tot),
            _RATIO_ROUND,
        )
        for b in range(n_buckets)
    ]


def dsir_select_fast(
    docs: DataFrame,
    log_ratios: list[float],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_n: int = DSIR_MAX_N,
) -> DataFrame:
    """Fast-family Gumbel-top-k selection: one staged projection
    materializes the bucket array, a map-only fold scores it, one
    TakeOrdered selects — same plan shape and determinism contract as
    :func:`dsir_select`, ~an order of magnitude less hash work."""
    from documents_vector_search_spark.operators.classify import (
        fast_bucket_array,
    )

    n_buckets = len(log_ratios)
    table = lit_double_array(log_ratios)
    staged = docs.select(
        F.col(id_col),
        fast_bucket_array(F.col(text_col), n_buckets, max_n).alias("_b"),
    )
    contrib = F.aggregate(
        F.col("_b"),
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(table, b + F.lit(1)),
    )
    logw = F.round(
        F.when(
            F.size(F.col("_b")) > 0, contrib / F.size(F.col("_b"))
        ).otherwise(F.lit(0.0)),
        6,
    )
    u = (
        F.pmod(
            F.xxhash64(F.concat(F.lit("dsir:"), F.col(id_col).cast("string"))),
            F.lit(_GUMBEL_MOD),
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_GUMBEL_MOD))
    scored = staged.select(
        F.col(id_col), logw.alias("logw"), u.alias("_u")
    ).select(
        F.col(id_col),
        "logw",
        F.round(
            F.col("logw") - F.log(-F.log(F.col("_u"))), 6
        ).alias("gkey"),
    )
    return scored.orderBy(F.col("gkey").desc(), F.col(id_col).asc()).limit(k)
