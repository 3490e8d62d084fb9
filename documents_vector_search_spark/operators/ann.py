"""Approximate nearest-neighbor search: LSH-bucket-pruned kNN.

Spark-first replacement for the reference's HNSW backend
(main/indexes/indexers/chroma_indexer.py:147-157). A graph index is a
pointer-chasing structure that fights Spark's scan-oriented execution;
the idiomatic scale path is PARTITION PRUNING: assign every vector a
bucket (random-hyperplane LSH here; KMeans-IVF via MLlib is the drop-in
alternative), write the table partitioned by bucket, and serve a query
by scanning only the query's bucket(s).

Multi-probe: probing the query bucket plus its Hamming-distance-1
neighbors trades a little extra scan for substantially better recall —
the standard SRP-LSH multi-probe scheme.

At 100 TB with bucket-partitioned Parquet, partition pruning means a
query touches corpus/2^n_planes × probes bytes — sub-linear in corpus
size, which is the property HNSW buys on one node.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.vectors import l2_distance
from documents_vector_search_spark.operators.dedup import (
    hyperplane_bucket,
    random_hyperplanes,
)


def bucket_of(vector: Sequence[float], planes: list[list[float]]) -> int:
    """Driver-side bucket id of a single query vector (mirror of
    hyperplane_bucket's expression logic)."""
    bucket = 0
    for j, plane in enumerate(planes):
        dot = sum(float(a) * b for a, b in zip(vector, plane))
        if dot >= 0:
            bucket |= 1 << j
    return bucket


def ann_knn_l2(
    embeddings: DataFrame,
    query_vector: Sequence[float],
    k: int,
    n_planes: int = 4,
    seed: int = 42,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """L2 top-k restricted to the query's LSH bucket (+ neighbors).

    ``multiprobe_bits`` = Hamming radius of additional probed buckets
    (0 = exact bucket only, 1 = bucket + n_planes neighbors, ...).
    Returns ``(id, distance)`` ascending, ties on id.
    """
    dim = len(query_vector)
    planes = random_hyperplanes(dim, n_planes, seed)
    q_bucket = bucket_of(query_vector, planes)

    # probe every bucket within Hamming distance <= multiprobe_bits
    from itertools import combinations

    probe = {q_bucket}
    for radius in range(1, min(multiprobe_bits, n_planes) + 1):
        for bits in combinations(range(n_planes), radius):
            flipped = q_bucket
            for j in bits:
                flipped ^= 1 << j
            probe.add(flipped)
    probes = sorted(probe)

    vec = F.col(vector_col).cast("array<double>")
    bucketed = embeddings.select(
        F.col(id_col),
        vec.alias("_v"),
        hyperplane_bucket(vec, planes).alias("_bucket"),
    )
    # with a bucket-partitioned table this filter becomes partition pruning
    pruned = bucketed.filter(F.col("_bucket").isin(probes))
    q_lit = F.array(*[F.lit(float(x)) for x in query_vector])
    dist = l2_distance(F.col("_v"), q_lit)
    if round_to is not None:
        dist = F.round(dist, round_to)
    scored = pruned.select(F.col(id_col), dist.alias("distance"))
    return scored.orderBy(F.col("distance").asc(), F.col(id_col).asc()).limit(k)


def write_bucket_partitioned(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 8,
    seed: int = 42,
    vector_col: str = "embedding",
) -> None:
    """Persist embeddings partitioned by LSH bucket — the on-disk layout
    that turns ann_knn_l2's bucket filter into Parquet partition pruning."""
    dim = len(embeddings.select(vector_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    vec = F.col(vector_col).cast("array<double>")
    (
        embeddings.withColumn("bucket", hyperplane_bucket(vec, planes))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
