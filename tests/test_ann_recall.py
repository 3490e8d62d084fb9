"""ANN recall contract: the approximate paths must BUY their speedup.

dev/recall.py measures; this test ENFORCES — a pinned floor on a
deterministic clustered-vectors fixture (the data shape ANN exists
for; near-random vectors have no neighborhood structure to find, see
dev/recall.py's protocol note). If a default or a refactor drops
recall below the floor, this fails instead of the regression shipping
silently. Reference capability being matched: HNSW's recall/speed
trade (main/indexes/indexers/chroma_indexer.py:147-157).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.ivf import (
    fit_ivf,
    ivf_search_l2_fixed,
    round_centroids,
)
from documents_vector_search_spark.operators.knn import knn_l2

DIM = 16
N_CLUSTERS = 16
PER_CLUSTER = 120
K = 10
NPROBE = 4  # of N_CLUSTERS → 25% row-scan budget
RECALL_FLOOR = 0.8
N_QUERIES = 10


@pytest.fixture(scope="module")
def clustered(spark):
    """~2k vectors in 16 well-separated Gaussian clusters (fixed seed):
    centers on a scaled hypercube-ish lattice, sigma small relative to
    center spacing — every query's true neighbors live in one or two
    clusters, the regime IVF's coarse quantizer is built for."""
    rng = random.Random(1234)
    centers = [
        [rng.uniform(-10.0, 10.0) for _ in range(DIM)] for _ in range(N_CLUSTERS)
    ]
    rows = []
    vid = 0
    for c in centers:
        for _ in range(PER_CLUSTER):
            rows.append(
                (vid, [x + rng.gauss(0.0, 0.8) for x in c])
            )
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    emb.count()
    # queries: perturbed members of distinct clusters (in-distribution)
    queries = [
        [x + rng.gauss(0.0, 0.8) for x in centers[i % N_CLUSTERS]]
        for i in range(N_QUERIES)
    ]
    return emb, queries


def _recall(emb, queries, search) -> float:
    total = 0.0
    for q in queries:
        exact = {r.vec_id for r in knn_l2(emb, q, K).collect()}
        got = {r.vec_id for r in search(q).collect()}
        total += len(got & exact) / K
    return total / len(queries)


class TestRecallContract:
    def test_ivf_recall_floor_at_quarter_scan(self, clustered):
        emb, queries = clustered
        ivf = fit_ivf(emb, nlist=N_CLUSTERS)
        cents = round_centroids(ivf.centroids)
        r = _recall(
            emb,
            queries,
            lambda q: ivf_search_l2_fixed(emb, cents, q, K, nprobe=NPROBE),
        )
        assert r >= RECALL_FLOOR, (
            f"IVF recall@{K} {r:.3f} < {RECALL_FLOOR} at "
            f"nprobe={NPROBE}/{N_CLUSTERS} (25% scan)"
        )

    def test_ivfpq_rerank_recall_floor(self, clustered):
        """The composed IVFPQ path (coarse prune → ADC shortlist →
        exact re-rank) — the collection searcher's layout — must hold
        the same floor at the same 25% coarse budget."""
        from documents_vector_search_spark.operators.ivf import (
            assign_cluster_expr,
            probe_clusters_fixed,
        )
        from documents_vector_search_spark.operators.pq import (
            fit_pq,
            pq_adc_topk,
            pq_encode_expr,
        )

        emb, queries = clustered
        ivf = fit_ivf(emb, nlist=N_CLUSTERS)
        cents = round_centroids(ivf.centroids)
        codebooks = fit_pq(emb, dim=DIM, m=8, ksub=16)
        encoded = emb.withColumn(
            "codes",
            pq_encode_expr(F.col("embedding").cast("array<double>"), codebooks),
        ).cache()
        encoded.count()

        def search(q):
            probes = probe_clusters_fixed(cents, q, NPROBE)
            pruned = encoded.withColumn(
                "_c",
                assign_cluster_expr(
                    F.col("embedding").cast("array<double>"), cents
                ),
            ).filter(F.col("_c").isin(probes))
            # 16×k shortlist = the searcher's default pq_shortlist_factor:
            # with ksub=16 codebooks, same-cluster rows share a code and
            # their ADC distances tie exactly, so a small shortlist is an
            # arbitrary slice of the tied band — the factor must cover it
            shortlist = pq_adc_topk(pruned, codebooks, q, 16 * K).select("vec_id")
            return knn_l2(
                emb.join(F.broadcast(shortlist), "vec_id", "left_semi"), q, K
            )

        r = _recall(emb, queries, search)
        assert r >= RECALL_FLOOR, (
            f"IVFPQ rerank recall@{K} {r:.3f} < {RECALL_FLOOR}"
        )

    def test_sq8_rerank_recall_floor(self, clustered):
        """SQ8 keeps per-dimension resolution, so at the same 5×k
        shortlist it must beat the codebook-sharing PQ floor — pinned
        at 0.9 (operators/sq.py)."""
        from documents_vector_search_spark.operators.sq import (
            fit_sq_bounds,
            sq_search_l2,
        )

        emb, queries = clustered
        bounds = fit_sq_bounds(emb, DIM)
        r = _recall(
            emb,
            queries,
            lambda q: sq_search_l2(emb, q, K, shortlist=5 * K, bounds=bounds),
        )
        assert r >= 0.9, f"SQ8 rerank recall@{K} {r:.3f} < 0.9"
