"""Vector math over ``ARRAY<FLOAT/DOUBLE>`` columns as pure expressions.

The reference's vector scoring happens inside FAISS (exact L2,
main/indexes/indexers/faiss_indexer.py:30-31) and Chroma HNSW L2
(main/indexes/indexers/chroma_indexer.py:147-157). Here the flat index
IS the ``embeddings`` DataFrame and scoring is a Column expression, so
Catalyst can push metadata filters *below* the distance computation and
use TakeOrderedAndProject for distributed top-k — per-partition top-k +
merge, which the single-node reference cannot do.

At 100 TB these expressions scan embeddings with zero Python involvement.
For even faster brute force, the same math can run in a vectorized numpy
pandas UDF (see operators/knn.py), but the expression form is the
correctness baseline and oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_double_array(values) -> Column:
    """``array<double>`` literal built in ONE py4j call.

    Cost model (pyspark 4.x classic, verified against the source):
    ``F.lit(list)`` expands to ``array(*[lit(item) ...])`` — one py4j
    call PER ELEMENT, same as writing it out by hand — but
    ``F.lit(numpy 1-D ndarray)`` ships the whole array through a single
    ``_invoke_function`` via Py4J's NumpyArrayConverter. So this helper
    passes float64 ndarrays, which is what makes it genuinely one-call.
    (The r4 plan-construction wins were measured with the list form, so
    they came from the 2-D-literal + indexed-transform restructuring in
    ivf/pq/sq.py, not from this helper — the ndarray form now also
    removes the per-element round trips.) Value-identical to
    ``F.array(*[F.lit(float(v)) ...])``: a foldable array<double>
    either way, exact float64 in both paths."""
    import numpy as np

    return F.lit(np.asarray([float(v) for v in values], dtype=np.float64))


def dot_product(a: Column, b: Column) -> Column:
    """Σ a_i * b_i via zip_with + aggregate (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def sq_l2_distance(a: Column, b: Column) -> Column:
    """SQUARED Euclidean distance (no sqrt) — cheaper when only the
    ordering matters (cluster assignment, PQ codebook lookup)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def round_half_up(arr, decimals: int = 6):
    """HALF-AWAY-FROM-ZERO rounding for numpy arrays — the semantics of
    Spark's ``F.round`` (HALF_UP) and DuckDB's ``round()``. numpy's
    ``np.round`` rounds HALF-TO-EVEN, so a value landing exactly on a
    .5 boundary at the target precision diverges between a numpy twin
    and the expression/SQL path (first hit in practice: the MMR
    objective at step 6 of the sf0.001 shortlist, 0.1453525 →
    np 0.145352 vs SQL 0.145353). Every numpy scorer that feeds a
    rounded value into an ordering or an oracle comparison must round
    through here, not np.round."""
    import numpy as np

    scale = 10.0**decimals
    scaled = np.asarray(arr, dtype=np.float64) * scale
    return np.sign(scaled) * np.floor(np.abs(scaled) + 0.5) / scale


def seq_fold_sum(terms):
    """Sum a numpy array over its LAST axis with a sequential left fold
    — the exact addition order of :func:`sq_l2_distance`'s
    ``F.aggregate(..., 0.0, acc + x)``. numpy's default ``.sum()`` uses
    pairwise summation, which can differ from the fold in the last ulp
    and flip a 0.5e-6 rounding boundary, so numpy twins of expression
    scorers (knn/ivf/pq) must fold through here to keep their "results
    identical" parity claims exact rather than statistical (r5 ADVICE).
    D vectorized adds per batch — negligible next to Arrow transfer.
    """
    import numpy as np

    acc = np.zeros(terms.shape[:-1], dtype=np.float64)
    for i in range(terms.shape[-1]):
        acc = acc + terms[..., i]
    return acc


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance — the reference's metric (IndexFlatL2)."""
    return F.sqrt(sq_l2_distance(a, b))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| |b|); 0.0 when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)
