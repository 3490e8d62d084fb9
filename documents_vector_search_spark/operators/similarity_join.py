"""Top-k similarity JOIN: every left row → its k nearest right rows.

The corpus-vs-corpus operator a training pipeline needs (dedup across
snapshots, retrieval-augmented labeling, nearest-neighbor attribution
— SURVEY §7.2 step 12). Two strategies:

- ``knn_join_exact``: full cross score + per-left-row window top-k.
  Correctness baseline; O(|L|·|R|) — fine when one side is small
  (broadcast), the oracle for everything else.
- ``knn_join_lsh``: SRP-LSH bucket equi-join (+ multiprobe on the left
  side) before scoring, then the same window top-k. Candidates per left
  row shrink to |R|·probes/2^planes — the scale path. Recall < 1 by
  construction; raise planes↓/probes↑ to trade cost for recall.

Both emit ``(left_id, right_id, cosine, rank)`` with the deterministic
(rounded score desc, right_id) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.vectors import cosine_similarity
from documents_vector_search_spark.operators.dedup import (
    hyperplane_bucket,
    random_hyperplanes,
)


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("left_id").orderBy(
        F.col("cosine").desc(), F.col("right_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w) - 1)
        .filter(F.col("rank") < k)
    )


def knn_join_exact(
    left: DataFrame,
    right: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine join (cross product — small right side or
    oracle use)."""
    l = left.select(
        F.col(id_col).alias("left_id"),
        F.col(vector_col).cast("array<double>").alias("lv"),
    )
    r = right.select(
        F.col(id_col).alias("right_id"),
        F.col(vector_col).cast("array<double>").alias("rv"),
    )
    cos = cosine_similarity(F.col("lv"), F.col("rv"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = l.crossJoin(r).select("left_id", "right_id", cos.alias("cosine"))
    return _ranked_topk(scored, k).select("left_id", "right_id", "cosine", "rank")


def knn_join_lsh(
    left: DataFrame,
    right: DataFrame,
    k: int,
    n_planes: int = 4,
    multiprobe_bits: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_to: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """LSH-pruned top-k cosine join.

    Left rows are replicated into their bucket plus every bucket within
    Hamming distance ``multiprobe_bits`` (left side is usually the
    smaller query set); right rows stay in exactly one bucket, so the
    equi-join on bucket prunes |L|·|R| to the colliding pairs.

    Pass ``dim`` when known (array length is not in the schema);
    otherwise one 1-row driver action probes it.
    """
    from itertools import combinations

    if dim is None:
        dim = len(right.select(vector_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)

    lv = F.col(vector_col).cast("array<double>")
    l = left.select(
        F.col(id_col).alias("left_id"),
        lv.alias("lv"),
        hyperplane_bucket(lv, planes).alias("bucket"),
    )
    # multiprobe: XOR masks within the Hamming radius
    masks = [0]
    for radius in range(1, min(multiprobe_bits, n_planes) + 1):
        for bits in combinations(range(n_planes), radius):
            m = 0
            for j in bits:
                m |= 1 << j
            masks.append(m)
    probes = F.explode(F.array(*[F.lit(m) for m in masks])).alias("mask")
    l_probed = l.select(
        "left_id", "lv", F.col("bucket"), probes
    ).select(
        "left_id",
        "lv",
        F.col("bucket").bitwiseXOR(F.col("mask")).alias("bucket"),
    )

    rv = F.col(vector_col).cast("array<double>")
    r = right.select(
        F.col(id_col).alias("right_id"),
        rv.alias("rv"),
        hyperplane_bucket(rv, planes).alias("bucket"),
    )

    cos = cosine_similarity(F.col("lv"), F.col("rv"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = (
        l_probed.join(r, "bucket")
        .select("left_id", "right_id", cos.alias("cosine"))
        # multiprobe can reach the same (l, r) pair via two probes only
        # when buckets collide exactly once — dedupe to be safe
        .dropDuplicates(["left_id", "right_id"])
    )
    return _ranked_topk(scored, k).select("left_id", "right_id", "cosine", "rank")


def hard_negative_pairs_exact(
    anchors: DataFrame,
    pool: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    label_col: str = "label",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k most-similar DIFFERENT-label neighbors per anchor —
    hard-negative mining for contrastive/embedding training (public
    precedent: DPR/SimCSE/E5 mine negatives from nearest neighbors
    that are NOT the positive class; the near-but-wrong examples teach
    the most). Cross product — BOUNDED anchors only, same contract as
    :func:`knn_join_exact`; the scale path is
    :func:`hard_negative_pairs_lsh`.

    ``(left_id, left_label, right_id, right_label, cosine, rank)``,
    rank 0..k-1 per anchor, ties on ascending right id. Self-pairs are
    excluded by id; the label filter runs BEFORE ranking so each
    anchor ranks only true negatives.
    """
    l = anchors.select(
        F.col(id_col).alias("left_id"),
        F.col(label_col).alias("left_label"),
        F.col(vector_col).cast("array<double>").alias("lv"),
    )
    r = pool.select(
        F.col(id_col).alias("right_id"),
        F.col(label_col).alias("right_label"),
        F.col(vector_col).cast("array<double>").alias("rv"),
    )
    cos = cosine_similarity(F.col("lv"), F.col("rv"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = (
        l.crossJoin(r)
        .filter(
            (F.col("left_label") != F.col("right_label"))
            & (F.col("left_id") != F.col("right_id"))
        )
        .select(
            "left_id", "left_label", "right_id", "right_label",
            cos.alias("cosine"),
        )
    )
    return _ranked_topk(scored, k).select(
        "left_id", "left_label", "right_id", "right_label", "cosine", "rank"
    )


def hard_negative_pairs_lsh(
    vectors: DataFrame,
    k: int,
    n_planes: int = 4,
    multiprobe_bits: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    label_col: str = "label",
    round_to: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """LSH-pruned hard-negative mining over ONE corpus — every vector
    is an anchor; candidates come from its SRP bucket plus multiprobe
    neighbors (never all-pairs), the different-label filter prunes
    before ranking. Same bucket/probe machinery as
    :func:`knn_join_lsh`; like all LSH candidate generation, recall
    against the exact form rises with planes/probes (pytest pins a
    floor on the shared fixture)."""
    from itertools import combinations

    if dim is None:
        dim = len(vectors.select(vector_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)

    lv = F.col(vector_col).cast("array<double>")
    base = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_label"),
        lv.alias("_v"),
        hyperplane_bucket(lv, planes).alias("bucket"),
    )
    masks = [0]
    for radius in range(1, min(multiprobe_bits, n_planes) + 1):
        for bits in combinations(range(n_planes), radius):
            m = 0
            for j in bits:
                m |= 1 << j
            masks.append(m)
    probes = F.explode(F.array(*[F.lit(m) for m in masks])).alias("mask")
    l_probed = base.select(
        F.col("_id").alias("left_id"),
        F.col("_label").alias("left_label"),
        F.col("_v").alias("lv"),
        F.col("bucket"),
        probes,
    ).select(
        "left_id",
        "left_label",
        "lv",
        F.col("bucket").bitwiseXOR(F.col("mask")).alias("bucket"),
    )
    r = base.select(
        F.col("_id").alias("right_id"),
        F.col("_label").alias("right_label"),
        F.col("_v").alias("rv"),
        "bucket",
    )
    cos = cosine_similarity(F.col("lv"), F.col("rv"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = (
        l_probed.join(r, "bucket")
        .filter(
            (F.col("left_label") != F.col("right_label"))
            & (F.col("left_id") != F.col("right_id"))
        )
        .select(
            "left_id", "left_label", "right_id", "right_label",
            cos.alias("cosine"),
        )
        .dropDuplicates(["left_id", "right_id"])
    )
    return _ranked_topk(scored, k).select(
        "left_id", "left_label", "right_id", "right_label", "cosine", "rank"
    )
