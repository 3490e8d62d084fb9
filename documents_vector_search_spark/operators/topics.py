"""Topic profiling over an embedded corpus — cluster-based data
selection's reporting view.

No reference analog (shnax0210/documents-vector-search has no corpus
analytics); the capability follows the cluster-based curation
literature the rest of the dedup family already draws on (SemDeDup's
KMeans buckets, DoReMi-style domain discovery): assign every vector
its nearest learned centroid ("topic"), then profile the corpus by
topic — how big each topic is, how tight it is (mean distance to its
centroid), and which ground-truth label dominates it. A training-data
pipeline reads this table to decide mixing weights and spot collapsed
or junk clusters before committing a 100 TB sampling pass.

Scale design: assignment is the SAME map-only rounded-argmin Column
expression the IVF family uses (operators/ivf.py::assign_cluster_auto
— expression form under 64 centroids so the whole scan stays in
whole-stage codegen, Arrow-batched numpy twin above). The profile then
aggregates on `topic_id` — ONE shuffle keyed by at most `nlist`
values, partial-aggregated map-side, so the reduce moves O(nlist)
rows, not O(corpus). The `share` and top-label windows run on the
already-aggregated ≤nlist-row frame — driver-scale, not data-scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.vectors import l2_distance
from documents_vector_search_spark.operators.ivf import assign_cluster_auto


def assigned_topics(
    emb: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Input columns + ``topic_id`` (nearest centroid, rounded-distance
    argmin, ties to the lower id) + ``topic_dist`` (rounded distance to
    the ASSIGNED centroid). Map-only; one pass."""
    v = F.col(vec_col).cast("array<double>")
    cmat = F.lit([[float(x) for x in c] for c in centroids])
    out = emb.withColumn(
        "topic_id", assign_cluster_auto(v, centroids, round_to)
    )
    # distance only to the one assigned centroid — cheaper than carrying
    # the full struct array out of the argmin, and exactly the oracle's
    # formulation (assign first, then measure)
    return out.withColumn(
        "topic_dist",
        F.round(
            l2_distance(v, F.element_at(cmat, F.col("topic_id") + F.lit(1))),
            round_to,
        ),
    )


def topic_profile(
    emb: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    label_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-topic corpus profile: ``(topic_id, n_docs, share, avg_dist
    [, top_label])`` ordered by topic id.

    ``share`` is the topic's fraction of the corpus; ``avg_dist`` the
    mean (rounded) distance to the topic centroid — a tightness /
    junk-cluster signal; ``top_label`` (when ``label_col`` is given)
    the modal label, ties to the lower label value.
    """
    a = assigned_topics(emb, centroids, vec_col, round_to)
    stats = a.groupBy("topic_id").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("topic_dist"), round_to).alias("avg_dist"),
    )
    # ≤ nlist rows from here on: the unpartitioned window is a
    # deliberate single-partition exchange of a driver-scale frame
    stats = stats.withColumn(
        "share",
        F.round(F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy()), round_to),
    )
    cols = ["topic_id", "n_docs", "share", "avg_dist"]
    if label_col is not None:
        lw = Window.partitionBy("topic_id").orderBy(
            F.col("_n").desc(), F.col(label_col).asc()
        )
        top = (
            a.groupBy("topic_id", label_col)
            .agg(F.count("*").alias("_n"))
            .withColumn("_rn", F.row_number().over(lw))
            .filter(F.col("_rn") == 1)
            .select("topic_id", F.col(label_col).alias("top_label"))
        )
        stats = stats.join(top, "topic_id")
        cols.append("top_label")
    return stats.select(*cols).orderBy("topic_id")
