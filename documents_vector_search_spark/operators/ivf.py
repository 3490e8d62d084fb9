"""IVF (inverted-file) ANN: KMeans centroids + partition-pruned probe.

The MLlib-native alternative to SRP-LSH bucketing (operators/ann.py) and
the Spark-idiomatic replacement for the reference's HNSW backend
(main/indexes/indexers/chroma_indexer.py:147-157): cluster the corpus
into nlist centroids (classic IVF-Flat, à la FAISS's IndexIVFFlat —
public algorithm), store each vector's cluster id, and serve a query by
scanning only the ``nprobe`` clusters whose centroids are nearest the
query.

Scale notes (100 TB):
- Fit KMeans on a sample (MLlib is distributed anyway); assignment is a
  map-only transform.
- Persist the table ``partitionBy("cluster_id")``: the probe filter
  becomes Parquet partition pruning — a query reads ~nprobe/nlist of
  the corpus.
- Recall tunes with nprobe exactly as in IVF-Flat; exact search stays
  the correctness baseline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.vectors import (
    l2_distance,
    lit_double_array,
    round_half_up,
    seq_fold_sum,
)


def round_centroids(
    centroids: Sequence[Sequence[float]], round_to: int = 6
) -> list[list[float]]:
    """Round centroids to a fixed precision so they can be persisted
    (manifest JSON) and later reproduce the exact same assignments —
    the fitted model itself never needs to be serialized."""
    return [[round(float(x), round_to) for x in c] for c in centroids]


def assign_cluster_expr(
    vec: Column,
    centroids: Sequence[Sequence[float]],
    round_to: int = 6,
) -> Column:
    """Deterministic nearest-centroid assignment as a pure Column
    expression: argmin over rounded centroid distances, ties broken on
    the lower cluster id (``array_min`` over (distance, id) structs —
    map-only, no shuffle).

    The centroid matrix enters the plan as ONE 2-D array literal with
    an indexed ``transform`` building the structs — the per-centroid
    unrolled form cost seconds of driver-side plan construction per
    query at nlist=64 (~15 py4j Columns per centroid); identical
    assignments, identical execution (the distance was a higher-order
    expression either way)."""
    cmat = F.lit([[float(x) for x in c] for c in centroids])
    structs = F.transform(
        cmat,
        lambda c, i: F.struct(
            F.round(l2_distance(vec, c), round_to).alias("d"),
            i.alias("i"),
        ),
    )
    return F.array_min(structs)["i"]


def assign_cluster_pandas(
    vec: Column,
    centroids: Sequence[Sequence[float]],
    round_to: int = 6,
) -> Column:
    """Vectorized twin of :func:`assign_cluster_expr` for LARGE nlist:
    the expression form inlines one struct comparison per centroid into
    the plan (fine to ~1k; a 64k-centroid coarse quantizer would blow
    codegen), while this Arrow-batched pandas UDF computes the full
    row×centroid distance matrix with one numpy op per batch.

    Semantics are IDENTICAL by construction — distances round to the
    same precision and ``argmin`` takes the LOWEST index among ties,
    matching the expression's (distance, id) struct-min — so the two
    assigners are interchangeable within one collection (pinned by
    test)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType

    cmat = np.asarray([[float(x) for x in c] for c in centroids])

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark's hint inference can't resolve locals (same
    # constraint as operators/knn.py::knn_l2_numpy)
    @F.pandas_udf(IntegerType())
    def assign(v):
        m = np.array(v.tolist(), dtype=np.float64)
        if m.size == 0:
            return pd.Series([], dtype="int32")
        # direct (x - c)^2 with a sequential dim fold: same op order
        # as the expression/SQL (functions/vectors.seq_fold_sum)
        d = np.sqrt(seq_fold_sum((m[:, None, :] - cmat[None, :, :]) ** 2))
        d = round_half_up(d, round_to)
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    return assign(vec)


# expr vs pandas crossover: construction is no longer the driver (the
# expression form builds a constant few Columns via the 2-D-literal
# transform); what remains is EXECUTION — interpreted per-element
# higher-order evaluation of nlist distances per row vs the vectorized
# twin's one numpy matmul per Arrow batch. nlist=64 is the retained
# break-even; below it the expression path stays preferred as the
# oracle-parity form.
EXPR_ASSIGN_MAX_NLIST = 64


def assign_cluster_auto(
    vec: Column,
    centroids: Sequence[Sequence[float]],
    round_to: int = 6,
) -> Column:
    """Pick the assigner by codebook size — expression (stays in
    codegen, oracle-parity path) for small nlist, vectorized pandas for
    large. The two agree row-for-row (parity-pinned), so the choice is
    purely a performance one and collections may mix them across
    create/update."""
    if len(centroids) <= EXPR_ASSIGN_MAX_NLIST:
        return assign_cluster_expr(vec, centroids, round_to)
    return assign_cluster_pandas(vec, centroids, round_to)


def probe_clusters_fixed(
    centroids: Sequence[Sequence[float]],
    query_vector: Sequence[float],
    nprobe: int,
    round_to: int = 6,
) -> list[int]:
    """Driver-side: ids of the ``nprobe`` centroids nearest the query
    (rounded distances, ties on lower id) — centroids are tiny, so this
    never touches the cluster."""
    def _l2(a: Sequence[float], b: Sequence[float]) -> float:
        return round(sum((x - y) ** 2 for x, y in zip(a, b)) ** 0.5, round_to)

    return [
        i
        for _, i in sorted(
            (_l2(c, query_vector), i) for i, c in enumerate(centroids)
        )[:nprobe]
    ]


class IVFIndex:
    """Fitted IVF state: centroids (driver-side, tiny) + assigned table."""

    def __init__(self, centroids: list[list[float]], assigned: DataFrame,
                 id_col: str, vector_col: str):
        self.centroids = centroids
        self.assigned = assigned
        self.id_col = id_col
        self.vector_col = vector_col

    def probe_clusters(self, query_vector: Sequence[float], nprobe: int) -> list[int]:
        dists = [
            (sum((a - b) ** 2 for a, b in zip(c, query_vector)), i)
            for i, c in enumerate(self.centroids)
        ]
        return [i for _, i in sorted(dists)[:nprobe]]

    def search_l2(
        self, query_vector: Sequence[float], k: int, nprobe: int = 2,
        round_to: int | None = 6,
    ) -> DataFrame:
        """L2 top-k over the nprobe nearest clusters only."""
        clusters = self.probe_clusters(query_vector, nprobe)
        pruned = self.assigned.filter(F.col("cluster_id").isin(clusters))
        q = lit_double_array(query_vector)
        dist = l2_distance(F.col(self.vector_col).cast("array<double>"), q)
        if round_to is not None:
            dist = F.round(dist, round_to)
        return (
            pruned.select(F.col(self.id_col), dist.alias("distance"))
            .orderBy(F.col("distance").asc(), F.col(self.id_col).asc())
            .limit(k)
        )

    def write_partitioned(self, path: str) -> None:
        """Persist partitioned by cluster id → probe = partition pruning."""
        self.assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(path)


def ivf_search_l2_fixed(
    embeddings: DataFrame,
    centroids: list[list[float]],
    query_vector: Sequence[float],
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF search with FIXED (already-fitted, rounded) centroids as pure
    Column expressions — deterministic and SQL-expressible, unlike the
    iterative KMeans fit. Used for oracle-checking the search stage:
    assignment = argmin over rounded centroid distances (ties on the
    lower cluster id), probe = ``nprobe`` nearest centroids to the
    query, then exact L2 top-k within the probed clusters.

    The assignment is an ``array_min`` over (distance, cluster_id)
    structs — fully codegen, no shuffle; with the table written
    ``partitionBy(cluster_id)`` the probe filter is partition pruning
    (IVFIndex.write_partitioned).
    """
    probes = probe_clusters_fixed(centroids, query_vector, nprobe, round_to)

    vec = F.col(vector_col).cast("array<double>")
    cluster = assign_cluster_expr(vec, centroids, round_to)
    pruned = embeddings.withColumn("_cluster", cluster).filter(
        F.col("_cluster").isin(probes)
    )
    q = lit_double_array(query_vector)
    dist = F.round(l2_distance(vec, q), round_to)
    return (
        pruned.select(F.col(id_col), dist.alias("distance"))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def fit_ivf(
    embeddings: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    method: str = "sample",
    sample_rows: int | None = None,
) -> IVFIndex:
    """Fit KMeans(nlist) and assign every vector a cluster id.

    ``method="sample"`` (default) trains on a bounded driver-side
    sample (operators/kmeans.py — the FAISS convention: codebook
    quality saturates around 100k vectors, and training must not scale
    with the corpus); assignment stays a distributed map-only
    expression. ``method="mllib"`` runs the fully-distributed MLlib
    fit instead — correct but each iteration is a Spark job, so the
    fit alone costs hundreds of jobs of scheduling overhead."""
    if method == "sample":
        from documents_vector_search_spark.operators.kmeans import (
            DEFAULT_SAMPLE_ROWS,
            collect_training_sample,
            kmeans_fit,
        )

        X = collect_training_sample(
            embeddings, vector_col, sample_rows or DEFAULT_SAMPLE_ROWS
        )
        C = kmeans_fit(X, nlist, seed=seed, iters=max_iter)
        centroids = [list(map(float, c)) for c in C]
        assigned = embeddings.withColumn(
            "cluster_id",
            assign_cluster_auto(
                F.col(vector_col).cast("array<double>"), centroids
            ),
        )
        return IVFIndex(centroids, assigned, id_col, vector_col)
    if method != "mllib":
        raise ValueError(f"unknown fit method: {method}")
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    featurized = embeddings.withColumn(
        "_features", array_to_vector(F.col(vector_col).cast("array<double>"))
    )
    model = KMeans(
        k=nlist, seed=seed, maxIter=max_iter, featuresCol="_features",
        predictionCol="cluster_id",
    ).fit(featurized)
    assigned = model.transform(featurized).drop("_features")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return IVFIndex(centroids, assigned, id_col, vector_col)
