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


def _gram_array(text_col: Column, max_n: int) -> Column:
    from documents_vector_search_spark.functions.text import (
        tokenize,
        word_shingles,
    )

    toks = tokenize(text_col)
    grams = toks
    for n in range(2, max_n + 1):
        grams = F.concat(grams, word_shingles(toks, n))
    # an empty doc's shingle is "" (array_join of an empty slice) —
    # drop it so empty docs score sigmoid(bias), not a phantom gram
    return F.filter(grams, lambda g: g != F.lit(""))


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
    from documents_vector_search_spark.functions.hashing import md5_hash64

    n_buckets = len(weights)
    w_lit = lit_double_array(weights)
    grams = _gram_array(text_col, max_n)
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
    keeps keep/drop engine-reproducible."""
    score = F.round(
        text_score_expr(F.col(text_col), weights, bias, max_n), round_to
    )
    return docs.select(
        F.col(id_col),
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )
