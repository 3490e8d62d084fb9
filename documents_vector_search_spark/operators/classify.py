"""Model-based quality scoring: a linear probe over embedding vectors.

The modern corpus-curation stack filters with a trained CLASSIFIER on
top of the heuristic signals (public precedent: fastText quality
classifiers in GPT-3/LLaMA data work, the DCLM classifier ablations,
FineWeb-Edu's educational-value scorer — all "small linear-ish model
over a text representation → keep/drop score"). The reference has no
analog (search-only system); this completes the curation family
(operators/curation.py) with its model-based tier.

Spark shape, mirroring operators/kmeans.py exactly:
- TRAINING is tiny and iterative → bounded uniform sample to the
  driver (same deterministic xxhash gate as the KMeans fit — layout
  and partition independent), deterministic full-batch logistic
  regression in float64 numpy (zero init, fixed iteration count: same
  data → bit-identical weights, no seed needed).
- SCORING is the 100 TB side → one map-only Column expression,
  ``sigmoid(dot(vec, w) + b)`` via zip_with/aggregate (JVM, codegen,
  no UDF), rounded BEFORE any comparison so the keep/drop decision is
  engine-reproducible. Fitted weights are ROUNDED and persisted by the
  caller (manifest/parquet), the same determinism contract as IVF
  centroids — downstream behavior never depends on float quirks of
  the fit.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.vectors import (
    dot_product,
    lit_double_array,
)
from documents_vector_search_spark.operators.kmeans import (
    DEFAULT_SAMPLE_ROWS,
    _GATE_MOD,
)


def collect_labeled_sample(
    df: DataFrame,
    vector_col: str,
    label_col: str,
    sample_rows: int = DEFAULT_SAMPLE_ROWS,
) -> tuple[np.ndarray, np.ndarray]:
    """≤ ``sample_rows`` (vector, label) pairs as (X, y) numpy arrays —
    the training-side twin of kmeans.collect_training_sample, with the
    same uniform deterministic hash gate (on the vector values, so the
    sample is identical under any physical layout of the same rows)."""
    import math

    sel = df.select(
        F.col(vector_col).cast("array<double>").alias("_v"),
        F.col(label_col).cast("double").alias("_y"),
    )
    n = sel.count()
    if n == 0:
        raise ValueError("cannot fit a probe on an empty DataFrame")
    if n > sample_rows:
        keep = min(
            _GATE_MOD,
            max(1, math.ceil(_GATE_MOD * sample_rows * 1.2 / n)),
        )
        sel = (
            sel.withColumn("_h", F.xxhash64("_v"))
            .filter(F.pmod(F.col("_h"), F.lit(_GATE_MOD)) < keep)
            .orderBy("_h")
            .limit(sample_rows)
            .drop("_h")
        )
    rows = sel.collect()
    X = np.asarray([r._v for r in rows], dtype=np.float64)
    y = np.asarray([r._y for r in rows], dtype=np.float64)
    # canonical order so the fit is independent of collect order.
    # lexsort's PRIMARY key is the LAST row of the stack, so after the
    # [::-1] reversal rows sort by label first, then vector dims in
    # index order — a deliberate total order (ties across identical
    # (label, vector) rows are interchangeable), differing from the
    # KMeans sample's vector-dims-first convention but equally
    # deterministic.
    order = np.lexsort(np.vstack([y[None, :], X.T])[::-1])
    return X[order], y[order]


def _logistic_fit(
    X: np.ndarray,
    y: np.ndarray,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> tuple[list[float], float]:
    """Zero-initialized full-batch gradient descent, fixed ``iters``
    float64 steps — same (X, y) → bit-identical ``(weights, bias)``.
    Shared by the embedding probe and the hashed-n-gram text probe."""
    n, d = X.shape
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        w -= lr * ((X.T @ err) / n + l2 * w)
        b -= lr * float(err.mean())
    return [float(v) for v in w], float(b)


def fit_linear_probe(
    embeddings: DataFrame,
    positive_label,
    vector_col: str = "embedding",
    label_col: str = "label",
    sample_rows: int = DEFAULT_SAMPLE_ROWS,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> tuple[list[float], float]:
    """Deterministic binary logistic regression: ``positive_label`` vs
    rest. Training cost is bounded by ``sample_rows`` regardless of
    corpus size (the FAISS-style budget argument: probe quality
    saturates long before the corpus does)."""
    X, y_raw = collect_labeled_sample(
        embeddings, vector_col, label_col, sample_rows
    )
    y = (y_raw == float(positive_label)).astype(np.float64)
    return _logistic_fit(X, y, iters=iters, lr=lr, l2=l2)


def linear_score_expr(
    vec: Column, weights: Sequence[float], bias: float
) -> Column:
    """``sigmoid(dot(vec, w) + b)`` as a pure Column expression —
    map-only, codegen, no Python on the scoring path."""
    z = dot_product(vec, lit_double_array(weights)) + F.lit(float(bias))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def classifier_scores(
    embeddings: DataFrame,
    weights: Sequence[float],
    bias: float,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-row ``(id, score, keep)`` under FIXED (typically rounded +
    persisted) probe parameters. The score is rounded BEFORE the
    threshold comparison, so keep/drop is reproducible by any engine
    computing the same rounded value — the classifier-filter analog of
    the round-before-order rule every search operator here follows."""
    score = F.round(
        linear_score_expr(
            F.col(vector_col).cast("array<double>"), weights, bias
        ),
        round_to,
    )
    return embeddings.select(
        F.col(id_col),
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Text-feature probe: hashed word n-grams → sparse linear score.
#
# The embedding probe above needs a vector column; the fastText/DCLM
# precedent scores RAW TEXT through hashed n-gram features, so
# classifier filtering also works on corpora that were never embedded.
# Features are the bag of word unigrams+bigrams (occurrence-preserving),
# each hashed to one of ``n_buckets`` weight slots via the engine's
# cross-dialect md5 hash (functions/hashing.py — same value in Spark,
# DuckDB SQL, and driver Python). A document's logit is
# ``bias + mean(weights[bucket(g)] for gram g)`` — the mean keeps the
# score length-invariant, mirroring fastText's averaged gram vectors.
# ---------------------------------------------------------------------------

TEXT_PROBE_BUCKETS = 256
TEXT_PROBE_MAX_N = 2


def text_gram_buckets_py(
    text: str,
    n_buckets: int = TEXT_PROBE_BUCKETS,
    max_n: int = TEXT_PROBE_MAX_N,
) -> list[int]:
    """Driver-side twin of the scoring expression's featurization:
    tokenize (functions/text.py semantics), n-grams for n=1..max_n
    with word_shingles' short-doc convention (fewer than n tokens →
    one gram of all tokens; empty-string grams dropped), then
    ``md5_hash64 % n_buckets`` per gram occurrence. Any drift from the
    Column form silently skews the fit, hence one definition
    parity-tested against the expression."""
    import re

    from documents_vector_search_spark.functions.hashing import (
        md5_hash64_py,
    )

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    grams = list(toks)
    for n in range(2, max_n + 1):
        count = max(len(toks) - n + 1, 1)
        grams += [" ".join(toks[i : i + n]) for i in range(count)]
    return [
        md5_hash64_py(g) % n_buckets for g in grams if g != ""
    ]


def _ngram_strings(toks: Column, n: int) -> Column:
    """Space-joined word n-grams with word_shingles' short-doc
    convention (fewer than n tokens → ONE gram of all tokens). For
    n >= 2 the semantics are exactly ``functions/text.word_shingles``
    (short docs give one gram of all tokens, "" for empty docs — the
    caller's empty-string filter drops it), so this delegates to its
    one-pass regex form: the previous zip_with-over-offset-slices build
    referenced ``toks`` n+1 times, re-evaluating an inline
    ``tokenize(text)`` argument that many times per row (measured 2.3x
    on the gram-staging projection at sf0.1). Gram VALUES are
    byte-identical, so the DuckDB oracle is untouched."""
    if n == 1:
        return toks
    from documents_vector_search_spark.functions.text import word_shingles

    return word_shingles(toks, n)


def _gram_array_from_tokens(toks: Column, max_n: int) -> Column:
    """:func:`_gram_array` over an already-staged token-array column.
    The gram build references ``toks`` several times (the unigram copy
    plus each shingle order's CASE/regex); inside a Project node
    codegen subexpression elimination dedups an inline ``tokenize``
    argument, but inside a GENERATE (explode consumers) it does not —
    stage the tokens as a generator output first
    (``explode_outer(array(tokenize(..)))``, one row per doc) and pass
    the attribute here (measured 1.06s → 0.92s on the sf0.1 DSIR fit
    pass; plan shows 1 tokenize per row instead of 4)."""
    grams = toks
    for n in range(2, max_n + 1):
        grams = F.concat(grams, _ngram_strings(toks, n))
    # an empty doc's shingle is "" (array_join of an empty slice) —
    # drop it so empty docs score sigmoid(bias), not a phantom gram
    return F.filter(grams, lambda g: g != F.lit(""))


def _gram_array(text_col: Column, max_n: int) -> Column:
    from documents_vector_search_spark.functions.text import tokenize

    return _gram_array_from_tokens(tokenize(text_col), max_n)


def _score_from_grams(
    grams: Column, weights: Sequence[float], bias: float
) -> Column:
    """``sigmoid(bias + mean(weights[bucket(gram)]))`` over an already
    materialized gram array (md5 bucketing). Groups of zero grams score
    ``sigmoid(bias)``."""
    from documents_vector_search_spark.functions.hashing import md5_hash64

    n_buckets = len(weights)
    w_lit = lit_double_array(weights)
    contrib = F.aggregate(
        grams,
        F.lit(0.0),
        lambda acc, g: acc
        + F.element_at(
            w_lit,
            (F.pmod(md5_hash64(g), F.lit(n_buckets)) + F.lit(1)).cast("int"),
        ),
    )
    z = (
        F.when(F.size(grams) > 0, contrib / F.size(grams)).otherwise(
            F.lit(0.0)
        )
        + F.lit(float(bias))
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def text_score_expr(
    text_col: Column,
    weights: Sequence[float],
    bias: float,
    max_n: int = TEXT_PROBE_MAX_N,
) -> Column:
    """``sigmoid(bias + mean(weights[bucket(gram)]))`` as a pure Column
    expression — tokenize, shingle, hash, bucket-lookup, and fold all
    stay in codegen; no Python on the 100 TB scoring path. Documents
    with no grams score ``sigmoid(bias)``."""
    return _score_from_grams(_gram_array(text_col, max_n), weights, bias)


def fit_text_probe(
    docs: DataFrame,
    positive_label,
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = TEXT_PROBE_BUCKETS,
    max_n: int = TEXT_PROBE_MAX_N,
    sample_rows: int = DEFAULT_SAMPLE_ROWS,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> tuple[list[float], float]:
    """Deterministic text-probe fit: bounded uniform hash-gate sample
    of (text, label) rows (gate on the text value → layout/partition
    independent, same idiom as the embedding probe), driver-side
    featurization through :func:`text_gram_buckets_py`, then the shared
    logistic loop. Same data → bit-identical ``(weights, bias)``."""
    import math

    sel = docs.select(
        F.col(text_col).alias("_t"),
        F.col(label_col).cast("double").alias("_y"),
    )
    n = sel.count()
    if n == 0:
        raise ValueError("cannot fit a probe on an empty DataFrame")
    if n > sample_rows:
        keep = min(
            _GATE_MOD,
            max(1, math.ceil(_GATE_MOD * sample_rows * 1.2 / n)),
        )
        # tie-break past _h: duplicate texts share a hash, so ordering by
        # _h alone would make which duplicate rows (possibly with
        # different labels) survive the limit boundary nondeterministic
        sel = (
            sel.withColumn("_h", F.xxhash64("_t"))
            .filter(F.pmod(F.col("_h"), F.lit(_GATE_MOD)) < keep)
            .orderBy("_h", "_y", "_t")
            .limit(sample_rows)
            .drop("_h")
        )
    rows = sel.collect()
    # canonical (label, text) order so the fit is independent of
    # collect order — same convention as collect_labeled_sample
    rows = sorted(rows, key=lambda r: (r._y, r._t))
    X = np.zeros((len(rows), n_buckets), dtype=np.float64)
    for i, r in enumerate(rows):
        buckets = text_gram_buckets_py(r._t, n_buckets, max_n)
        if buckets:
            inc = 1.0 / len(buckets)
            for bkt in buckets:
                X[i, bkt] += inc
    y = np.asarray(
        [float(r._y == float(positive_label)) for r in rows],
        dtype=np.float64,
    )
    return _logistic_fit(X, y, iters=iters, lr=lr, l2=l2)


def text_classifier_scores(
    docs: DataFrame,
    weights: Sequence[float],
    bias: float,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_n: int = TEXT_PROBE_MAX_N,
    round_to: int = 6,
) -> DataFrame:
    """Per-document ``(id, score, keep)`` from raw text under FIXED
    (rounded + persisted) probe parameters — :func:`classifier_scores`
    for corpora without embeddings. Map-only; round-before-threshold
    keeps keep/drop engine-reproducible. The gram array is staged in
    its own projection so the tokenize/shingle work runs once, not once
    per consuming expression."""
    staged = docs.select(
        F.col(id_col),
        _gram_array(F.col(text_col), max_n).alias("_grams"),
    )
    score = F.round(
        _score_from_grams(F.col("_grams"), weights, bias), round_to
    )
    return staged.select(
        F.col(id_col),
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Production-fast text probe: xxhash64 token-hash featurization.
#
# The md5 probe above exists for cross-dialect verifiability (the same
# bucket is re-computable in DuckDB SQL and driver Python, so the whole
# fit→score path has an independent oracle). But a crypto hash per gram
# occurrence is the wrong cost model for a 100 TB scoring sweep, and
# the measured breakdown at sf0.1 (local[32], warm plans) says the
# string work dominates anyway:
#
#   tokenize only                    0.25 s
#   + gram-string arrays (old form)  3.7 s      <- transform+get+concat
#   + md5 bucket fold                4.5 s
#   + xxhash64 bucket fold           4.0 s      (crypto hash ~0.5 s of 4.5)
#   token-hash pairs (this form)     0.3 s      ~15x the md5 pipeline
#
# This variant never builds an n-gram STRING: tokens are hashed ONCE
# (xxhash64, JVM-side), unigram buckets come from those hashes, and
# n-gram buckets from xxhash64 over ADJACENT TOKEN-HASH tuples (zip of
# offset slices) — O(tokens) hashes of fixed-width ints instead of
# O(tokens·max_n) hashes of built strings. Fit and score share the ONE
# expression below (the fit collects bucket arrays computed by Spark),
# so the pair is self-consistent by construction; there is no Python
# twin to drift. Short docs follow the simpler no-padding convention
# (fewer than n tokens → no n-grams): the fast family is a DIFFERENT
# featurization, not a bit-twin of the md5 probe, and is deliberately
# not oracle-checkable (neither DuckDB nor Python reproduces Spark's
# xxhash64) — use the md5 probe where independent verification
# matters, this one where throughput does.
# ---------------------------------------------------------------------------


def fast_bucket_array(
    text_col: Column,
    n_buckets: int = TEXT_PROBE_BUCKETS,
    max_n: int = TEXT_PROBE_MAX_N,
) -> Column:
    """``array<int>`` of hashed-gram weight slots for one document —
    the single featurization shared by fast fit and fast score."""
    from documents_vector_search_spark.functions.text import tokenize

    toks = tokenize(text_col)
    th = F.transform(toks, lambda t: F.xxhash64(t))
    size = F.size(th)
    bucket = lambda h: F.pmod(h, F.lit(n_buckets)).cast("int")  # noqa: E731
    buckets = F.transform(th, bucket)
    for n in range(2, max_n + 1):
        win = F.greatest(size - F.lit(n - 1), F.lit(0))
        zipped = F.slice(th, 1, win)
        for i in range(1, n):
            zipped = F.zip_with(
                zipped,
                F.slice(th, i + 1, win),
                lambda a, b: F.xxhash64(a, b),
            )
        buckets = F.concat(buckets, F.transform(zipped, bucket))
    return buckets


def fit_text_probe_fast(
    docs: DataFrame,
    positive_label,
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = TEXT_PROBE_BUCKETS,
    max_n: int = TEXT_PROBE_MAX_N,
    sample_rows: int = DEFAULT_SAMPLE_ROWS,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> tuple[list[float], float]:
    """Deterministic fast-probe fit. Featurization happens IN SPARK via
    :func:`fast_bucket_array` — the collected sample already holds each
    row's bucket array, so fit and score can never disagree on the
    hash. Same bounded hash-gate sample + canonical row order as
    :func:`fit_text_probe`: same data → bit-identical weights."""
    import math

    sel = docs.select(
        F.col(text_col).alias("_t"),
        fast_bucket_array(F.col(text_col), n_buckets, max_n).alias("_b"),
        F.col(label_col).cast("double").alias("_y"),
    )
    n = sel.count()
    if n == 0:
        raise ValueError("cannot fit a probe on an empty DataFrame")
    if n > sample_rows:
        keep = min(
            _GATE_MOD,
            max(1, math.ceil(_GATE_MOD * sample_rows * 1.2 / n)),
        )
        sel = (
            sel.withColumn("_h", F.xxhash64("_t"))
            .filter(F.pmod(F.col("_h"), F.lit(_GATE_MOD)) < keep)
            .orderBy("_h", "_y", "_t")
            .limit(sample_rows)
            .drop("_h")
        )
    rows = sel.collect()
    rows = sorted(rows, key=lambda r: (r._y, r._t))
    X = np.zeros((len(rows), n_buckets), dtype=np.float64)
    for i, r in enumerate(rows):
        if r._b:
            inc = 1.0 / len(r._b)
            for bkt in r._b:
                X[i, bkt] += inc
    y = np.asarray(
        [float(r._y == float(positive_label)) for r in rows],
        dtype=np.float64,
    )
    return _logistic_fit(X, y, iters=iters, lr=lr, l2=l2)


def text_classifier_scores_fast(
    docs: DataFrame,
    weights: Sequence[float],
    bias: float,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_n: int = TEXT_PROBE_MAX_N,
    round_to: int = 6,
) -> DataFrame:
    """``(id, score, keep)`` under FIXED fast-probe parameters. One
    staged projection materializes the bucket array, then a map-only
    fold scores it — ~15x the md5 probe's scoring throughput (see the
    module-section measurement table); use with weights from
    :func:`fit_text_probe_fast` only (the hash families differ)."""
    staged = docs.select(
        F.col(id_col),
        fast_bucket_array(F.col(text_col), len(weights), max_n).alias(
            "_b"
        ),
    )
    w_lit = lit_double_array(weights)
    contrib = F.aggregate(
        F.col("_b"),
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(w_lit, b + F.lit(1)),
    )
    z = (
        F.when(
            F.size(F.col("_b")) > 0, contrib / F.size(F.col("_b"))
        ).otherwise(F.lit(0.0))
        + F.lit(float(bias))
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to)
    return staged.select(
        F.col(id_col),
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )
