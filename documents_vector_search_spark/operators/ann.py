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

Two query paths:

- ``ann_knn_l2``: index-less — computes every row's bucket on the fly.
  This is a FULL scan (plus n_planes dot products per row); it exists
  for ad-hoc exploration and as the oracle-parity definition of the
  bucket semantics, NOT as the serving path.
- ``ann_knn_l2_bucketed``: reads a layout written by
  ``write_bucket_partitioned`` — the probe filter is on the Parquet
  partition column, so the scan touches only probes/2^n_planes of the
  files (verify with .explain: ``PartitionFilters: [bucket IN (...)]``).
  At 100 TB this is sub-linear in corpus size, which is the property
  HNSW buys on one node.
"""

from __future__ import annotations

from collections.abc import Sequence
from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.vectors import (
    l2_distance,
    lit_double_array,
)
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


def multiprobe_buckets(
    query_vector: Sequence[float],
    planes: list[list[float]],
    multiprobe_bits: int = 1,
) -> list[int]:
    """The query's bucket plus every bucket within Hamming distance
    ``multiprobe_bits`` (0 = exact bucket only)."""
    n_planes = len(planes)
    q_bucket = bucket_of(query_vector, planes)
    probe = {q_bucket}
    for radius in range(1, min(multiprobe_bits, n_planes) + 1):
        for bits in combinations(range(n_planes), radius):
            flipped = q_bucket
            for j in bits:
                flipped ^= 1 << j
            probe.add(flipped)
    return sorted(probe)


def _score_topk(
    pruned: DataFrame,
    query_vector: Sequence[float],
    k: int,
    id_col: str,
    vector_col: str,
    round_to: int | None,
) -> DataFrame:
    q_lit = lit_double_array(query_vector)
    dist = l2_distance(F.col(vector_col).cast("array<double>"), q_lit)
    if round_to is not None:
        dist = F.round(dist, round_to)
    scored = pruned.select(F.col(id_col), dist.alias("distance"))
    return scored.orderBy(F.col("distance").asc(), F.col(id_col).asc()).limit(k)


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
    """L2 top-k restricted to the query's LSH bucket (+ neighbors),
    computing buckets on the fly (index-less; see module docstring —
    use ``ann_knn_l2_bucketed`` over a partitioned layout for the
    sub-linear serving path).

    Returns ``(id, distance)`` ascending, ties on id.
    """
    dim = len(query_vector)
    planes = random_hyperplanes(dim, n_planes, seed)
    probes = multiprobe_buckets(query_vector, planes, multiprobe_bits)

    vec = F.col(vector_col).cast("array<double>")
    bucketed = embeddings.select(
        F.col(id_col),
        F.col(vector_col),
        hyperplane_bucket(vec, planes).alias("_bucket"),
    )
    pruned = bucketed.filter(F.col("_bucket").isin(probes))
    return _score_topk(pruned, query_vector, k, id_col, vector_col, round_to)


def ann_knn_l2_bucketed(
    layout: DataFrame,
    query_vector: Sequence[float],
    k: int,
    n_planes: int = 4,
    seed: int = 42,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    bucket_col: str = "bucket",
    round_to: int | None = 6,
) -> DataFrame:
    """L2 top-k over a bucket-partitioned layout: the probe filter hits
    the Parquet partition column → partition pruning, scanning only
    ~len(probes)/2^n_planes of the corpus.

    ``layout`` must come from ``write_bucket_partitioned`` with the SAME
    (n_planes, seed) — the planes are reconstructed here only to locate
    the query's probe buckets.
    """
    dim = len(query_vector)
    planes = random_hyperplanes(dim, n_planes, seed)
    probes = multiprobe_buckets(query_vector, planes, multiprobe_bits)
    pruned = layout.filter(F.col(bucket_col).isin(probes))
    return _score_topk(pruned, query_vector, k, id_col, vector_col, round_to)


def write_bucket_partitioned(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 8,
    seed: int = 42,
    vector_col: str = "embedding",
    dim: int | None = None,
    extra_partition_cols: list[str] | None = None,
) -> None:
    """Persist embeddings partitioned by LSH bucket — the on-disk layout
    that turns the ANN probe filter into Parquet partition pruning.

    Pass ``dim`` when known (schema metadata can't express array length);
    otherwise one 1-row driver action probes it. ``extra_partition_cols``
    (already present on ``embeddings``) become additional partition
    levels after ``bucket`` — e.g. the collection updater's ``_pb``
    bucket; Spark prunes on any directory level, so probe pruning is
    unaffected.
    """
    if dim is None:
        dim = len(embeddings.select(vector_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    vec = F.col(vector_col).cast("array<double>")
    (
        embeddings.withColumn("bucket", hyperplane_bucket(vec, planes))
        .write.mode("overwrite")
        .partitionBy("bucket", *(extra_partition_cols or []))
        .parquet(path)
    )


def ensure_bucket_layout(
    spark: SparkSession,
    source_parquet: str,
    layout_path: str,
    n_planes: int = 4,
    seed: int = 42,
    vector_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Build the bucket-partitioned layout at ``layout_path`` if absent
    (one pass over the source), then return it. A ``_SUCCESS``-style
    marker ties the layout to the source's modification time so a
    refreshed source invalidates the cache."""
    import json
    from pathlib import Path

    src_mtime = max(
        (p.stat().st_mtime_ns for p in Path(source_parquet).rglob("*") if p.is_file()),
        default=Path(source_parquet).stat().st_mtime_ns,
    )
    marker = Path(layout_path) / "_LAYOUT_META.json"
    meta = {
        "source": source_parquet,
        "src_mtime_ns": src_mtime,
        "n_planes": n_planes,
        "seed": seed,
    }
    if not marker.exists() or json.loads(marker.read_text()) != meta:
        write_bucket_partitioned(
            spark.read.parquet(source_parquet),
            layout_path,
            n_planes=n_planes,
            seed=seed,
            vector_col=vector_col,
            dim=dim,
        )
        marker.write_text(json.dumps(meta))
    return spark.read.parquet(layout_path)
