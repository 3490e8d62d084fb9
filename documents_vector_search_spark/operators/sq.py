"""Scalar quantization (SQ8): 8-bit codes + decoded-distance search.

The third point on the ANN memory/recall spectrum beside IVF partition
pruning (operators/ivf.py) and product quantization (operators/pq.py),
mirroring FAISS's IndexScalarQuantizer (QT_8bit — public algorithm):
per dimension, learn the corpus [min, max] range and store each
component as ``code = round((x - min) / (max - min) * 255)`` — one byte
per dimension, an 8× scan-byte reduction vs float64 (4× vs float32)
with far better recall than PQ at the same compression, because every
dimension keeps its own resolution instead of sharing a codebook.

Reference capability: HNSW recall/speed trade in the Chroma backend
(main/indexes/indexers/chroma_indexer.py:147-157); this layout is the
bandwidth-bound-scan answer to the same problem.

Spark mapping — everything is expression-level, nothing iterative:
- The FIT is one aggregation (per-dimension min/max). Unlike KMeans
  (IVF/PQ) it is exactly SQL-expressible, so the whole pipeline —
  fit, encode, approximate search, re-rank — oracle-checks without
  persisted model assets. Bounds are kept as EXACT doubles (no
  rounding): both engines compute bit-identical min/max, so encode
  parity is exact, not rounding-dependent.
- Encoding is a map-only Column expression; at 100 TB it is one scan.
- Search decodes codes back to ``min + code/255*(max-min)`` inside the
  plan (constant-folded bounds), ranks by decoded L2 over the tiny
  (id, codes) projection, and exact-re-ranks a shortlist against true
  vectors — the standard quantize-then-refine shape.

Determinism: every arithmetic step is written with an explicit
left-to-right operation order mirrored in the DuckDB oracle
(registry.py), so even the APPROXIMATE distances hash-match.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.vectors import (
    l2_distance,
    lit_double_array,
    round_half_up,
)


def fit_sq_bounds(
    embeddings: DataFrame,
    dim: int,
    vector_col: str = "embedding",
) -> tuple[list[float], list[float]]:
    """Per-dimension (mins, maxs) as EXACT doubles — one aggregation,
    driver-side scalar probe (2·dim floats). No rounding: min/max of a
    double column is exact in any engine, so the fitted bounds are
    bit-identical to the oracle's."""
    vec = F.col(vector_col).cast("array<double>")
    aggs = []
    for i in range(dim):
        aggs.append(F.min(F.element_at(vec, i + 1)).alias(f"mn{i}"))
        aggs.append(F.max(F.element_at(vec, i + 1)).alias(f"mx{i}"))
    row = embeddings.agg(*aggs).first()
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    maxs = [float(row[f"mx{i}"]) for i in range(dim)]
    return mins, maxs


def _bounds_lit(mins: Sequence[float], maxs: Sequence[float]) -> Column:
    """(mn, mx) struct per dimension as ONE zipped pair of array
    literals — the per-dimension unrolled forms below used to build
    ~8 py4j Columns per dimension and spent ~1s of driver time
    PLANNING a dim-64 encode/distance; the array forms construct in a
    handful of calls with bit-identical values (parity-verified)."""
    return F.zip_with(
        F.lit([float(x) for x in mins]),
        F.lit([float(x) for x in maxs]),
        lambda mn, mx: F.struct(mn.alias("mn"), mx.alias("mx")),
    )


def sq_encode_expr(
    vec: Column, mins: Sequence[float], maxs: Sequence[float]
) -> Column:
    """``array<int>`` of 8-bit codes: per dimension,
    ``clamp(floor((x - mn) / (mx - mn) * 255 + 0.5), 0, 255)``
    (floor(x+0.5) = explicit half-up, identical in both engines);
    degenerate dimensions (mx == mn) encode as 0. Map-only."""
    bounds = _bounds_lit(mins, maxs)
    return F.zip_with(
        vec,
        bounds,
        lambda x, b: F.when(b.mx == b.mn, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    F.floor((x - b.mn) / (b.mx - b.mn) * 255 + F.lit(0.5)),
                ),
            )
        )
        .cast("int"),
    )


# expr vs pandas crossover: the expression form now builds a constant
# few Columns regardless of dim (zipped-bounds array fold), so the cost
# that remains is EXECUTION — Spark evaluates higher-order array
# functions interpreted, per element — against the vectorized twin's
# Arrow transfer. The dim-64 cutoff is the measured break-even for
# that trade; the expression path stays preferred below it because it
# is the oracle-parity form.
EXPR_ENCODE_MAX_DIM = 64


def sq_encode_pandas(
    vec: Column, mins: Sequence[float], maxs: Sequence[float]
) -> Column:
    """Vectorized twin of :func:`sq_encode_expr` for WIDE embeddings
    (same reasoning as operators/ivf.py::assign_cluster_pandas): one
    numpy pass per Arrow batch instead of dim inlined expressions.
    Identical math — ``floor(x + 0.5)`` half-up, clamp, degenerate
    dimensions encode 0 — parity-pinned by test."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    mn = np.asarray([float(x) for x in mins])
    mx = np.asarray([float(x) for x in maxs])
    span = mx - mn
    degenerate = span == 0.0
    safe_span = np.where(degenerate, 1.0, span)

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark's hint inference can't resolve locals
    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(v):
        m = np.array(v.tolist(), dtype=np.float64)
        if m.size == 0:
            return pd.Series([], dtype=object)
        scaled = np.floor((m - mn) / safe_span * 255 + 0.5)
        codes = np.clip(scaled, 0, 255).astype("int32")
        codes[:, degenerate] = 0
        return pd.Series(list(codes))

    return encode(vec)


def sq_encode_auto(
    vec: Column, mins: Sequence[float], maxs: Sequence[float]
) -> Column:
    """Pick the encoder by dimension — expression (codegen,
    oracle-parity path) for narrow vectors, vectorized for wide."""
    if len(list(mins)) <= EXPR_ENCODE_MAX_DIM:
        return sq_encode_expr(vec, mins, maxs)
    return sq_encode_pandas(vec, mins, maxs)


def sq_adc_distance_expr(
    codes: Column,
    query_vector: Sequence[float],
    mins: Sequence[float],
    maxs: Sequence[float],
    round_to: int = 6,
) -> Column:
    """Approximate L2 between the un-quantized query and a DECODED code
    row: ``x̂_i = mn_i + code_i/255*(mx_i - mn_i)``; the squared terms
    sum left-to-right in dimension order (mirrored in the oracle SQL —
    the array fold below is the same left-associative chain, and the
    degenerate-dimension decode ``mn + c/255*0`` equals the explicit
    ``mn`` branch exactly, so no special case is needed)."""
    bounds = _bounds_lit(mins, maxs)
    decoded = F.zip_with(
        codes,
        bounds,
        lambda c, b: b.mn + (c.cast("double") / F.lit(255.0)) * (b.mx - b.mn),
    )
    q = F.lit([float(x) for x in query_vector])
    terms = F.zip_with(q, decoded, lambda qq, d: (qq - d) * (qq - d))
    total = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    return F.round(F.sqrt(total), round_to)


def sq_search_l2(
    embeddings: DataFrame,
    query_vector: Sequence[float],
    k: int,
    shortlist: int = 50,
    bounds: tuple[Sequence[float], Sequence[float]] | None = None,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """SQ8 top-k: encode (map-only), rank by decoded L2 over the
    (id, codes) projection, keep a ``shortlist`` (ties on id), then
    exact-L2 re-rank the shortlist against true vectors.

    ``bounds`` takes a pre-fitted (mins, maxs) — a production layout
    persists them in its manifest; left None they are fitted here (one
    extra aggregation job)."""
    dim = len(list(query_vector))
    if bounds is None:
        bounds = fit_sq_bounds(embeddings, dim, vector_col)
    mins, maxs = bounds
    vec = F.col(vector_col).cast("array<double>")
    encoded = embeddings.select(
        F.col(id_col), sq_encode_expr(vec, mins, maxs).alias("codes")
    )
    short = (
        encoded.select(
            F.col(id_col),
            sq_adc_distance_expr(
                F.col("codes"), query_vector, mins, maxs, round_to
            ).alias("adc_distance"),
        )
        .orderBy(F.col("adc_distance").asc(), F.col(id_col).asc())
        .limit(shortlist)
        .select(id_col)
    )
    q = lit_double_array(query_vector)
    return (
        embeddings.join(F.broadcast(short), id_col, "left_semi")
        .select(
            F.col(id_col),
            F.round(l2_distance(vec, q), round_to).alias("distance"),
        )
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def sq_adc_batch_shortlist(
    encoded: DataFrame,
    mins: Sequence[float],
    maxs: Sequence[float],
    queries: dict,
    probes: dict,
    shortlist_size: int,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    part_col: str = "cluster_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-query decoded-distance shortlists for MANY queries in ONE
    codes scan — the batch-serving front half of an SQ8-composed pruned
    layout (``(qid, id)`` rows, each qid's top ``shortlist_size`` codes
    by decoded L2 over ITS probe partitions only).

    Parity contract with the per-query :func:`sq_adc_distance_expr`
    plan: the decode is the same ``mn + c/255*(mx-mn)`` per dimension,
    the squared terms accumulate in the same left-to-right dimension
    order, and the distance rounds to ``round_to`` before the
    (distance, id) ordering — so each query's shortlist SET matches its
    standalone pruned plan and the exact re-rank sees identical
    candidates. Same scale shape as pq_adc_batch_shortlist: union scan
    of (id, codes, part), batch-local top-S, tasks × Q × S shuffle.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    qids = sorted(queries)
    missing = [q for q in qids if q not in probes]
    if missing:
        raise ValueError(f"queries without probe sets: {missing}")
    mn = np.asarray([float(x) for x in mins], dtype=np.float64)
    span = np.asarray([float(x) for x in maxs], dtype=np.float64) - mn
    qmat = np.asarray(
        [[float(x) for x in queries[q]] for q in qids], dtype=np.float64
    )
    probe_arrays = [np.asarray(sorted(probes[q])) for q in qids]
    dim = len(mn)
    id_type = encoded.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("qid", StringType()),
            StructField(id_col, id_type),
            StructField("_adc", DoubleType()),
        ]
    )

    def local_shortlist(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(pdf[codes_col].tolist(), dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            parts_v = pdf[part_col].to_numpy()
            decoded = mn + (codes / 255.0) * span
            out = []
            for qi, qid in enumerate(qids):
                mask = np.isin(parts_v, probe_arrays[qi])
                if not mask.any():
                    continue
                terms = (qmat[qi] - decoded[mask]) ** 2
                # left-to-right dimension fold — the expression's order
                acc = terms[:, 0].copy()
                for j in range(1, dim):
                    acc += terms[:, j]
                d = round_half_up(np.sqrt(acc), round_to)
                idm = ids[mask]
                order = np.lexsort((idm, d))[:shortlist_size]
                out.append(
                    pd.DataFrame(
                        {"qid": qid, id_col: idm[order], "_adc": d[order]}
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    candidates = encoded.select(id_col, codes_col, part_col).mapInPandas(
        local_shortlist, out_schema
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("_adc").asc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= shortlist_size)
        .select("qid", id_col)
    )
