"""Product quantization (PQ): compressed vectors + ADC search.

The scale problem IVF/LSH don't address is MEMORY: a 100 TB corpus of
float32 embeddings doesn't fit hot storage, and scan throughput is
bandwidth-bound. PQ (Jégou et al., "Product quantization for nearest
neighbor search", TPAMI 2011 — public; the same scheme behind FAISS's
IndexIVFPQ) splits each d-dim vector into ``m`` subvectors, k-means
quantizes each subspace to ``ksub`` centroids, and stores each vector
as ``m`` small codes — dim=16 float32 (64 B) becomes 4 codes (4 B), a
16× compression. Search uses ADC (asymmetric distance computation):
the query stays un-quantized; per subspace, a ``ksub``-entry lookup
table of query-to-centroid distances is precomputed once driver-side,
and every row's approximate distance is ``sqrt(Σ_j lut[j][code_j])``
— table lookups and adds, no per-row float math on full vectors.

Spark mapping:
- Codebooks are tiny (m × ksub × d/m floats) → fitted once with MLlib
  KMeans per subspace, ROUNDED, and persisted as plain data (manifest
  or parquet) — deterministic and engine-portable, like the IVF
  centroids (operators/ivf.py).
- Encoding is a pure Column expression (argmin over rounded squared
  subspace distances — ``array_min`` over structs, map-only).
- ADC lookup tables enter the plan as LITERAL arrays; the scan reads
  only (id, codes) — at 100 TB that's the difference between scanning
  ~1/16th of the bytes and scanning everything.
- Compose with IVF partition pruning (coarse quantizer) for the full
  IndexIVFPQ analog: prune partitions first, ADC-scan the survivors.

Everything is md5/centroid-deterministic and expressible in ANSI SQL,
so even the APPROXIMATE distances are oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.vectors import (
    lit_double_array,
    round_half_up,
    seq_fold_sum,
    sq_l2_distance,
)

Codebooks = Sequence[Sequence[Sequence[float]]]  # [subspace][code][component]


def fit_pq(
    embeddings: DataFrame,
    dim: int,
    m: int = 4,
    ksub: int = 16,
    vector_col: str = "embedding",
    seed: int = 42,
    round_to: int = 6,
    method: str = "sample",
    sample_rows: int | None = None,
) -> list[list[list[float]]]:
    """Fit per-subspace KMeans codebooks; returns ROUNDED centroids
    ``codebooks[subspace][code] -> list[float]`` ready to persist.

    ``method="sample"`` (default): ONE bounded driver-side sample
    collect (operators/kmeans.py), then all ``m`` subspace codebooks
    fit from slices of the same matrix — the FAISS training
    convention; codebook quality needs ~100k vectors, not the corpus,
    and training must not scale with data size. ``method="mllib"``
    keeps the fully-distributed alternative: ``m`` sequential MLlib
    fits whose per-iteration job overhead dominates at any size.
    """
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    codebooks: list[list[list[float]]] = []
    if method == "sample":
        from documents_vector_search_spark.operators.kmeans import (
            DEFAULT_SAMPLE_ROWS,
            collect_training_sample,
            kmeans_fit,
        )

        X = collect_training_sample(
            embeddings, vector_col, sample_rows or DEFAULT_SAMPLE_ROWS
        )
        for j in range(m):
            C = kmeans_fit(X[:, j * dsub : (j + 1) * dsub], ksub, seed=seed + j)
            codebooks.append(
                [[round(float(x), round_to) for x in c] for c in C]
            )
        return codebooks
    if method != "mllib":
        raise ValueError(f"unknown fit method: {method}")
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    for j in range(m):
        sub = embeddings.select(
            array_to_vector(
                F.slice(
                    F.col(vector_col).cast("array<double>"), j * dsub + 1, dsub
                )
            ).alias("_sub")
        )
        model = KMeans(
            k=ksub, seed=seed + j, featuresCol="_sub", predictionCol="_c"
        ).fit(sub)
        codebooks.append(
            [
                [round(float(x), round_to) for x in c]
                for c in model.clusterCenters()
            ]
        )
    return codebooks


def pq_encode_expr(
    vec: Column, codebooks: Codebooks, round_to: int = 6
) -> Column:
    """``array<int>`` of m codes: per subspace, the nearest-codebook-
    centroid id (rounded squared distances, ties on lower code). Pure
    map-only expression — encoding a 100 TB corpus is one scan.

    Construction note: each subspace's codebook enters the plan as ONE
    2-D array literal and the per-centroid (distance, code) structs
    come from an indexed ``transform`` over it — the per-centroid
    unrolled form built ~15 py4j Columns per centroid and spent
    seconds of driver time PLANNING an encode (measured 2.9s → 0.9s
    at m=4, ksub=16; bit-identical codes, same execution time — the
    distance was already a higher-order expression either way)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = []
    for j in range(m):
        cb = F.lit([[float(x) for x in c] for c in codebooks[j]])
        sub = F.slice(vec, j * dsub + 1, dsub)
        structs = F.transform(
            cb,
            lambda c, i: F.struct(
                F.round(sq_l2_distance(sub, c), round_to).alias("d"),
                i.alias("c"),
            ),
        )
        codes.append(F.array_min(structs)["c"])
    return F.array(*codes)


def pq_encode_pandas(
    vec: Column, codebooks: Codebooks, round_to: int = 6
) -> Column:
    """Vectorized twin of :func:`pq_encode_expr` for LARGE codebooks:
    the expression form inlines ksub struct comparisons per subspace
    (fine at ksub=16; the standard ksub=256 of PQ8 would blow codegen),
    while this Arrow-batched pandas UDF runs one numpy argmin per
    (batch, subspace). Same rounded squared distances, same
    lowest-code tie-break (np.argmin takes the first minimum) — the
    two encoders are interchangeable, pinned by test."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    cbs = [np.asarray([[float(x) for x in c] for c in cb]) for cb in codebooks]
    m = len(cbs)
    dsub = cbs[0].shape[1]

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark's hint inference can't resolve locals
    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(v):
        mat = np.array(v.tolist(), dtype=np.float64)
        if mat.size == 0:
            return pd.Series([], dtype=object)
        codes = np.empty((mat.shape[0], m), dtype="int32")
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            # sequential dim fold — same op order as the expression
            # encoder (functions/vectors.seq_fold_sum)
            d = seq_fold_sum((sub[:, None, :] - cbs[j][None, :, :]) ** 2)
            codes[:, j] = np.argmin(round_half_up(d, round_to), axis=1)
        return pd.Series(list(codes))

    return encode(vec)


# expr vs pandas crossover: construction is no longer the driver (the
# codebook enters as one 2-D literal); what remains is EXECUTION —
# interpreted per-element evaluation of ksub subspace distances per
# row vs the vectorized twin's numpy argmin per Arrow batch. ksub=32
# is the retained break-even; below it the expression path stays
# preferred as the oracle-parity form.
EXPR_ENCODE_MAX_KSUB = 32


def pq_encode_auto(
    vec: Column, codebooks: Codebooks, round_to: int = 6
) -> Column:
    """Pick the encoder by codebook size (see operators/ivf.py::
    assign_cluster_auto — same reasoning, parity-pinned twins)."""
    if len(codebooks[0]) <= EXPR_ENCODE_MAX_KSUB:
        return pq_encode_expr(vec, codebooks, round_to)
    return pq_encode_pandas(vec, codebooks, round_to)


def pq_adc_lut(
    query_vector: Sequence[float], codebooks: Codebooks, round_to: int = 6
) -> list[list[float]]:
    """Driver-side ADC lookup tables: ``lut[j][c]`` = rounded squared
    L2 between the query's j-th subvector and codebook centroid c.
    m × ksub floats — trivially broadcast as plan literals."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut: list[list[float]] = []
    for j in range(m):
        q_sub = [float(x) for x in query_vector[j * dsub:(j + 1) * dsub]]
        lut.append(
            [
                round(sum((a - b) * (a - b) for a, b in zip(q_sub, cent)), round_to)
                for cent in codebooks[j]
            ]
        )
    return lut


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: Codebooks,
    query_vector: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    round_to: int = 6,
) -> DataFrame:
    """Approximate L2 top-k over PQ codes via ADC: per row, m lookup-
    table reads + (m-1) adds — no full-vector math, and the scan reads
    only (id, codes). Returns ``(id, adc_distance)`` ascending, ties on
    id. Re-rank the top candidates against true vectors when exactness
    matters (standard PQ practice)."""
    lut = pq_adc_lut(query_vector, codebooks, round_to)
    total: Column | None = None
    for j, table in enumerate(lut):
        arr = lit_double_array(table)
        term = F.element_at(arr, F.element_at(F.col(codes_col), j + 1) + 1)
        total = term if total is None else total + term
    dist = F.round(F.sqrt(total), round_to)
    return (
        encoded.select(F.col(id_col), dist.alias("adc_distance"))
        .orderBy(F.col("adc_distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_adc_batch_shortlist(
    encoded: DataFrame,
    codebooks: Codebooks,
    queries: dict,
    probes: dict,
    shortlist_size: int,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    part_col: str = "cluster_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-query ADC shortlists for MANY queries in ONE codes scan —
    the batch-serving front half of IVFPQ (``(qid, id)`` rows, each
    qid's top ``shortlist_size`` codes by ADC distance over ITS probe
    partitions only).

    Parity contract with the per-query :func:`pq_adc_topk` plan: the
    lookup tables come from the SAME :func:`pq_adc_lut` (entries
    rounded before use), the per-row total is the same left-fold sum
    over subspaces, and the distance is rounded to ``round_to`` before
    the (distance, id) ordering — so each query's shortlist SET equals
    what its standalone pruned plan would select, and the exact
    re-rank downstream sees identical candidates.

    Scale shape: one scan of the union of probe partitions reading only
    (id, codes, part); numpy LUT gathers per Arrow batch; batch-local
    top-S bounds the shuffle to tasks × Q × S narrow rows.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql.types import StringType, StructField, StructType

    qids = sorted(queries)
    missing = [q for q in qids if q not in probes]
    if missing:
        raise ValueError(f"queries without probe sets: {missing}")
    # Q × m × ksub rounded tables — identical values to the per-query
    # expression literals
    luts = np.asarray(
        [pq_adc_lut(queries[q], codebooks, round_to) for q in qids],
        dtype=np.float64,
    )
    probe_arrays = [np.asarray(sorted(probes[q])) for q in qids]
    m = len(codebooks)
    id_type = encoded.schema[id_col].dataType

    def local_shortlist(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(pdf[codes_col].tolist(), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            parts_v = pdf[part_col].to_numpy()
            out = []
            for qi, qid in enumerate(qids):
                mask = np.isin(parts_v, probe_arrays[qi])
                if not mask.any():
                    continue
                cm = codes[mask]
                # left-fold over subspaces in j order — the same
                # accumulation order as the expression form
                acc = luts[qi, 0][cm[:, 0]]
                for j in range(1, m):
                    acc = acc + luts[qi, j][cm[:, j]]
                d = round_half_up(np.sqrt(acc), round_to)
                idm = ids[mask]
                order = np.lexsort((idm, d))[:shortlist_size]
                out.append(pd.DataFrame({"qid": qid, id_col: idm[order],
                                         "_adc": d[order]}))
            if out:
                yield pd.concat(out, ignore_index=True)

    # _adc rides along only for the global cut, then drops
    from pyspark.sql.types import DoubleType

    out_schema_adc = StructType(
        [
            StructField("qid", StringType()),
            StructField(id_col, id_type),
            StructField("_adc", DoubleType()),
        ]
    )
    candidates = encoded.select(id_col, codes_col, part_col).mapInPandas(
        local_shortlist, out_schema_adc
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("_adc").asc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= shortlist_size)
        .select("qid", id_col)
    )
