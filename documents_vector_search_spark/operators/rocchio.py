"""Rocchio vector relevance feedback (Rocchio 1971, the SMART form).

The vector-branch twin of RM3 query expansion: pull the query vector
toward the centroid of the top-k feedback hits,
``q1 = alpha * q0 + beta * mean(feedback vectors)`` (the
positive-feedback-only form modern dense retrievers use). The feedback
set is k vectors — it always fits on the driver, so the update is pure
Python; the expensive pass stays the ordinary (pruned) kNN re-search
with the new literal query vector.

Determinism contract (registry integer-cents rule): per-dimension
feedback components quantize to int64 billionths BEFORE the sum, so
the centroid never depends on float addition order; the updated vector
rounds to 6 decimals per dimension — floor-based half-up rounding
(``floor(x*1e6 + 0.5)/1e6``), which is bit-identical in Python, Spark
SQL, and DuckDB, unlike Python's banker's ``round()``.
"""

from __future__ import annotations

import math

ROCCHIO_ALPHA = 1.0
ROCCHIO_BETA = 0.75
_Q_SCALE = 1e9


def _round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def rocchio_vector(
    q0: list[float],
    feedback: list[list[float]],
    alpha: float = ROCCHIO_ALPHA,
    beta: float = ROCCHIO_BETA,
) -> list[float]:
    """``round(alpha*q0[i] + beta*mean_i, 6)`` per dimension, with the
    mean computed over int64-quantized components. Empty feedback
    returns ``q0`` rounded — the neutral update."""
    if not q0:
        raise ValueError("rocchio needs a non-empty query vector")
    if not feedback:
        return [_round6(alpha * x) for x in q0]
    dim = len(q0)
    for v in feedback:
        if len(v) != dim:
            raise ValueError("feedback vector dimension mismatch")
    n = len(feedback)
    out = []
    for i in range(dim):
        s = sum(math.floor(v[i] * _Q_SCALE + 0.5) for v in feedback)
        mean_i = s / n / _Q_SCALE
        out.append(_round6(alpha * q0[i] + beta * mean_i))
    return out
