"""Deterministic hash-based sampling and dataset splits.

A training-data pipeline needs REPRODUCIBLE samples and train/val/test
splits: re-running the pipeline (or running it on another engine) must
assign every document to the same subset. Spark's ``df.sample`` is
seed-dependent on partitioning and not portable; the standard fix is
hash-gating — bucket = hash(seed, id) mod M, keep a bucket range.

Everything here is a pure Column expression over the portable
md5-derived hash (functions/hashing.py): map-only, no shuffle, no RNG
state, bit-identical across engines — and therefore oracle-checkable.

Scale notes (100 TB): sampling/splitting is a filter (predicate
pushdown applies when the hash is over a stored column); stratified
rates are a CASE expression over the stratum column — still one scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.hashing import (
    md5_hash64,
    md5_hash64_sql,
)

# bucket space: 1e6 buckets = rate granularity of 0.0001%
_BUCKETS = 1_000_000


def hash_bucket(id_col: Column, seed: int = 0) -> Column:
    """Stable bucket in [0, 1e6) from (seed, id) — the sampling gate."""
    return F.pmod(md5_hash64(id_col.cast("string"), salt=seed), F.lit(_BUCKETS))


def hash_bucket_sql(id_expr: str, seed: int = 0) -> str:
    """DuckDB twin of :func:`hash_bucket` (hash is non-negative, so
    ``%`` ≡ ``pmod``)."""
    return f"({md5_hash64_sql(f'CAST({id_expr} AS VARCHAR)', salt=seed)} % {_BUCKETS})"


def hash_sample(
    df: DataFrame, id_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Deterministic ``rate``-fraction sample: keep rows whose bucket
    falls below ``rate * 1e6``. Same rows every run, any engine."""
    return df.filter(hash_bucket(F.col(id_col), seed) < int(rate * _BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by hash-bucket range.

    ``splits`` maps label -> fraction (must sum to ≤ 1; any remainder
    is labeled ``None``). Ranges are cumulative in the dict's order, so
    pass an ordered dict — e.g. ``{"train": .98, "val": .01,
    "test": .01}``.
    """
    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    bucket = hash_bucket(F.col(id_col), seed)
    expr: Column | None = None
    lo = 0
    for label, frac in splits.items():
        hi = lo + int(frac * _BUCKETS)
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo = hi
    return df.withColumn(split_col, expr)


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    seed: int = 0,
) -> DataFrame:
    """Per-ROW continuous keep-probability — the mixture-weighting gate
    of a training-data pipeline (keep high-quality documents with
    probability ~1, low-quality ones rarely, any score in between
    proportionally; the quality-weighted sampling described in public
    LLM corpus reports). ``weight_col`` is a [0, 1] keep probability
    (values outside clamp); rows keep when their hash bucket falls
    below ``floor(weight * 1e6)`` — deterministic, reproducible,
    engine-portable, and still one map-only filter."""
    w = weight_col if isinstance(weight_col, Column) else F.col(weight_col)
    w = F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.filter(
        hash_bucket(F.col(id_col), seed) < F.floor(w * F.lit(float(_BUCKETS)))
    )


def mix_to_target(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weights: dict[str, float],
    seed: int = 0,
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Resample the corpus to a TARGET MIXTURE over ``group_col`` — the
    data-mixing step of a training pipeline (set the output composition
    by source/language/domain, as public LLM corpus reports do), with
    no rate hand-tuning: rates derive from the corpus itself.

    ``weights`` maps group value → target share of the OUTPUT. The
    feasible output size is maximized without upsampling: with n_g rows
    in group g and target share w_g, the largest total T keeping every
    group's draw within its population is ``T = min_g(n_g / w_g)``;
    each group then keeps ``rate_g = (T * w_g) / n_g`` of its rows
    through the deterministic hash gate. Groups absent from ``weights``
    are dropped.

    Scale shape: one aggregation over the corpus for group counts
    (output = |groups| rows), a scalar min over that tiny frame, one
    broadcast join of the rates back onto the corpus, one map-only
    filter — two corpus scans total. Pass precomputed ``counts``
    (group → row count, e.g. from an existing profile of an
    append-only corpus) and the whole mix collapses to ONE map-only
    scan: rates fold driver-side into a literal CASE gate, no
    aggregation, no join. Every arithmetic step is plain IEEE double
    with explicit order, so the selected row set is engine-portable
    and oracle-checkable.
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must have a positive sum")
    norm = {g: w / total_w for g, w in weights.items()}

    if counts is not None:
        # same group admission rule as the DataFrame path: positive
        # weight AND present in the corpus (a zero weight is the
        # natural way to exclude a source — it must drop the group,
        # not divide by zero)
        rated = {
            g: norm[g]
            for g in norm
            if norm[g] > 0 and counts.get(g, 0) > 0
        }
        if not rated:
            return df.filter(F.lit(False))
        t = min(float(counts[g]) / w for g, w in rated.items())
        thresh: Column = F.lit(-1)  # unlisted groups: gate never passes
        for g, w in sorted(rated.items()):
            rate = min(1.0, (t * w) / float(counts[g]))
            thresh = F.when(
                F.col(group_col) == g,
                F.lit(int(math.floor(rate * _BUCKETS))),
            ).otherwise(thresh)
        return df.filter(hash_bucket(F.col(id_col), seed) < thresh)

    w_expr: Column = F.lit(0.0)
    for g, w in sorted(norm.items()):
        w_expr = F.when(F.col(group_col) == g, F.lit(w)).otherwise(w_expr)

    grp = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("_n"))
        .withColumn("_w", w_expr)
        .filter(F.col("_w") > 0)
    )
    t_df = grp.agg(
        F.min(F.col("_n").cast("double") / F.col("_w")).alias("_t")
    )
    rates = (
        grp.crossJoin(F.broadcast(t_df))
        .select(
            group_col,
            F.least(
                F.lit(1.0),
                (F.col("_t") * F.col("_w")) / F.col("_n").cast("double"),
            ).alias("_rate"),
        )
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(
            hash_bucket(F.col(id_col), seed)
            < F.floor(F.col("_rate") * F.lit(float(_BUCKETS)))
        )
        .drop("_rate")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    id_col: str,
    order_by: list[Column] | None = None,
    seed: int = 0,
    n_salts: int = 16,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group — the per-domain cap of
    web-corpus curation (no single site may dominate the training mix;
    the standard Common-Crawl-pipeline guard).

    Which rows survive is deterministic: by default the group's
    pseudo-random hash order (a reproducible uniform draw from the
    group, same gate family as :func:`hash_sample`); pass ``order_by``
    to keep the BEST rows instead (e.g. quality descending). ``id_col``
    breaks ties so the survivor set is engine-portable either way.

    Scale shape: a bare ``row_number`` window per group would sort a
    mega-domain (a 100 TB crawl easily holds billions of rows of one
    site) in ONE task. This uses the exact two-phase salted top-k
    (same argument as operators/bm25.py batch ranking): phase 1 ranks
    within (group, salt) — per-task sorts of ~group/n_salts rows —
    phase 2 ranks the ≤ n_salts × max_rows survivors. Both phases
    share one total order, so the result is exactly the unsalted
    window's.
    """
    order = (order_by or [md5_hash64(F.col(id_col).cast("string"), salt=seed)]) + [
        F.col(id_col).asc()
    ]
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*order)
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn(
            "_salt",
            F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(n_salts)),
        )
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= max_rows)
        .drop("_rn", "_salt")
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= max_rows)
        .drop("_rn")
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones): one CASE expression over the
    stratum column picks the bucket threshold, one filter applies it."""
    bucket = hash_bucket(F.col(id_col), seed)
    thresh: Column = F.lit(int(default_rate * _BUCKETS))
    for stratum, rate in sorted(rates.items()):
        thresh = (
            F.when(F.col(strata_col) == stratum, int(rate * _BUCKETS))
            .otherwise(thresh)
        )
    return df.filter(bucket < thresh)


def temperature_mix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float = 0.3,
    seed: int = 0,
    round_weights_to: int = 9,
) -> DataFrame:
    """Temperature (alpha) sampling over ``group_col`` — the
    multilingual-corpus rebalancing rule (public precedent: mT5 §3.1 /
    XLM-R: sample group g with probability ∝ (n_g/N)^alpha, alpha in
    (0, 1]; alpha=1 keeps the natural distribution, alpha→0 approaches
    uniform, boosting low-resource groups without hand-tuned weights).

    The alpha-smoothed shares become the target weights of the same
    downsample-only machinery as :func:`mix_to_target`: largest
    feasible total T = min_g(n_g / w_g), per-group keep rate
    ``(T·w_g)/n_g``, applied through the deterministic hash gate.

    Cross-engine determinism: ``pow`` is the one step libm
    implementations can disagree on by an ulp, so the smoothed share
    is ROUNDED (``round_weights_to``) before any downstream
    arithmetic — after that every step is plain IEEE double with
    explicit order, oracle-replayable.

    Scale shape: one group-count aggregation (|groups| rows), scalar
    folds over that tiny frame, one broadcast of the rates onto the
    corpus, one map-only gate — two corpus scans total.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    grp = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    tot = grp.agg(F.sum("_n").cast("double").alias("_total"))
    pw = grp.crossJoin(F.broadcast(tot)).select(
        group_col,
        "_n",
        F.round(
            F.pow(F.col("_n").cast("double") / F.col("_total"), F.lit(float(alpha))),
            round_weights_to,
        ).alias("_pw"),
    )
    sw = pw.agg(F.sum("_pw").alias("_sw"))
    w = pw.crossJoin(F.broadcast(sw)).select(
        group_col,
        "_n",
        F.round(F.col("_pw") / F.col("_sw"), round_weights_to).alias("_w"),
    )
    t = w.agg(F.min(F.col("_n").cast("double") / F.col("_w")).alias("_t"))
    rates = w.crossJoin(F.broadcast(t)).select(
        group_col,
        F.least(
            F.lit(1.0),
            (F.col("_t") * F.col("_w")) / F.col("_n").cast("double"),
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(
            hash_bucket(F.col(id_col), seed)
            < F.floor(F.col("_rate") * F.lit(float(_BUCKETS)))
        )
        .drop("_rate")
    )


def unimax_allocation(
    docs: DataFrame,
    budget_tokens: "int | Column",
    max_epochs: int = 2,
    lang_col: str = "lang",
    token_col: str = "ws_tokens",
    round_to: int = 6,
) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023): split a
    token budget across languages as uniformly as possible subject to a
    per-language repeat cap — no language is sampled for more than
    ``max_epochs`` passes over its data, and the freed budget spreads
    over the rest. Input is ``(lang, token_count)`` rows (one per doc);
    output one row per language: ``(lang, n_docs, tokens_total,
    cap_tokens, alloc_tokens, epochs_used)``.

    UniMax's sequential loop is a WATER-FILL, computed closed-form:
    sort languages by cap ascending; language i is FULLY funded iff
    ``prefix(i-1) + cap_i · (k-i+1) <= B`` (monotone in i, so the full
    set is a prefix); the rest share ``(B - Σ full caps) DIV m``
    equally (exact int64 floor — the ≤ m-token remainder stays
    unallocated, identically in any engine).

    Scale shape: ONE lang-keyed aggregate over the corpus (map-side
    combinable), then windows over the O(languages) table — bounded
    and tiny (the resample-spine convention), never the corpus.
    ``budget_tokens`` may be a literal or a one-row-derived Column
    (broadcast crossJoin upstream)."""
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col(token_col)).cast("bigint").alias("tokens_total"),
    ]
    if isinstance(budget_tokens, Column):
        # a per-row-constant budget column (e.g. derived from a
        # broadcast one-row total) survives the aggregate via max
        aggs.append(F.max(budget_tokens).cast("bigint").alias("_b"))
    per_lang = docs.groupBy(F.col(lang_col).alias("lang")).agg(*aggs)
    if not isinstance(budget_tokens, Column):
        per_lang = per_lang.withColumn(
            "_b", F.lit(int(budget_tokens)).cast("bigint")
        )
    staged = per_lang.select(
        "lang",
        "n_docs",
        "tokens_total",
        (F.col("tokens_total") * F.lit(int(max_epochs)))
        .cast("bigint")
        .alias("cap_tokens"),
        "_b",
    )
    w = Window.orderBy(F.col("cap_tokens").asc(), F.col("lang").asc())
    whole = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    staged = staged.select(
        "*",
        F.count(F.lit(1)).over(whole).cast("bigint").alias("_k"),
        F.row_number().over(w).cast("bigint").alias("_i"),
        F.coalesce(F.sum("cap_tokens").over(prev), F.lit(0))
        .cast("bigint")
        .alias("_prefix"),
    )
    full = (
        F.col("_prefix")
        + F.col("cap_tokens") * (F.col("_k") - F.col("_i") + 1)
        <= F.col("_b")
    )
    staged = staged.withColumn("_full", full.cast("int"))
    staged = staged.select(
        "*",
        F.sum(F.when(F.col("_full") == 1, F.col("cap_tokens")).otherwise(0))
        .over(whole)
        .cast("bigint")
        .alias("_p_full"),
        (F.col("_k") - F.sum("_full").over(whole)).cast("bigint").alias("_m"),
    )
    alloc = F.when(F.col("_full") == 1, F.col("cap_tokens")).otherwise(
        F.expr("(_b - _p_full) DIV _m")
    )
    return staged.select(
        "lang",
        "n_docs",
        "tokens_total",
        "cap_tokens",
        alloc.cast("bigint").alias("alloc_tokens"),
        F.round(
            alloc / F.col("tokens_total"), round_to
        ).alias("epochs_used"),
    ).orderBy("lang")


def cluster_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    splits: dict[str, float] | None = None,
    seed: int = 0,
    split_col: str = "split",
    unit_col: str = "split_unit",
) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate CLUSTERS are
    assigned to a split atomically, so two near-duplicates can never
    straddle train and test (the classic eval-contamination hole a
    row-hash split leaves open — public precedent: the dedup-aware
    split discussions in Lee et al. 2022 and the GPT-3 contamination
    appendix).

    ``pairs`` is near-dup evidence ``(id_a, id_b)`` from ANY of the
    dedup families (MinHash-LSH, SimHash, embedding). Rows hash on
    their component's canonical id (operators/cc.py connected
    components; singletons use their own id) through the SAME bucket
    ranges as :func:`hash_split` — output adds ``unit_col`` and
    ``split_col``.

    Scale shape: the CC runs on the pair set (O(near-dup nodes), not
    O(corpus)); the corpus itself pays one broadcast-or-shuffle join
    against that cluster map plus the map-only gate.
    """
    from documents_vector_search_spark.operators.cc import (
        connected_components,
    )

    clusters = connected_components(pairs).withColumnRenamed(
        "id", "_csid"
    )
    joined = df.join(
        clusters, df[id_col] == clusters["_csid"], "left"
    ).drop("_csid")
    staged = joined.withColumn(
        unit_col, F.coalesce(F.col("cluster_id"), F.col(id_col))
    ).drop("cluster_id")
    return hash_split(staged, unit_col, splits, seed, split_col)
