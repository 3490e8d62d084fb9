"""Shared-stage near-dup pipeline: compute the LSH pair stage ONCE.

The MinHash-LSH pair stage (operators/dedup.py::minhash_lsh_pairs) is
the expensive part of every fuzzy-dedup flow — tokenize + shingle +
signature + band shuffle over the whole corpus. A real prep run
consumes those pairs several ways at once: a pair report, transitive
clusters (operators/cc.py), and the canonicalized corpus. Composed
naively each consumer re-runs the full pair lineage — at 100 TB that is
N extra corpus scans and band shuffles for zero new information.

``NearDupPipeline`` is the serving-layer answer: the first consumer
materializes the pair stage with an eager ``localCheckpoint`` (pairs
are tiny relative to the corpus — only verified near-duplicates
survive), and every later consumer reads the materialized rows. The
cluster stage memoizes the same way, so ``clusters()`` +
``canonical_docs()`` share one label-propagation run.

``localCheckpoint`` trades lineage for executor-local storage — the
right default for one driver program composing stages. On a shared
cluster with executor churn, pass ``materialize=`` a parquet-backed
exchange (write + read-back) instead; the pipeline takes any callable
so the storage policy stays out of the algorithm (same note as
operators/cc.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from documents_vector_search_spark.operators.cc import (
    cluster_canonicalize,
    connected_components,
    connected_components_star,
)
from documents_vector_search_spark.operators.dedup import minhash_lsh_pairs


def _local_checkpoint(df: DataFrame) -> DataFrame:
    return df.localCheckpoint()


class NearDupPipeline:
    """Memoized MinHash-LSH → clusters → canonical-corpus composition.

    Every stage is computed at most once per pipeline instance; each
    accessor returns the SAME DataFrame object on repeat calls, backed
    by materialized rows rather than the LSH lineage.
    """

    def __init__(
        self,
        docs: DataFrame,
        threshold: float = 0.8,
        num_hashes: int = 8,
        bands: int = 4,
        shingle_words: int = 3,
        id_col: str = "doc_id",
        text_col: str = "text",
        max_bucket_size: int | None = None,
        star: bool = False,
        materialize: Callable[[DataFrame], DataFrame] = _local_checkpoint,
    ):
        self._docs = docs
        self._id_col = id_col
        self._kwargs = dict(
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            shingle_words=shingle_words,
            id_col=id_col,
            text_col=text_col,
            max_bucket_size=max_bucket_size,
        )
        self._star = star
        self._materialize = materialize
        self._pairs: DataFrame | None = None
        self._clusters: DataFrame | None = None

    def pairs(self) -> DataFrame:
        """``(id_a, id_b, jaccard)`` verified near-dup pairs — the full
        corpus scan + band shuffle runs on the FIRST call only."""
        if self._pairs is None:
            self._pairs = self._materialize(
                minhash_lsh_pairs(self._docs, **self._kwargs)
            )
        return self._pairs

    def clusters(self) -> DataFrame:
        """``(id, cluster_id)`` transitive closure over the memoized
        pairs (min-label propagation, or large-star/small-star when the
        pipeline was built with ``star=True``)."""
        if self._clusters is None:
            cc = connected_components_star if self._star else connected_components
            self._clusters = cc(self.pairs())
        return self._clusters

    def canonical_docs(self) -> DataFrame:
        """The deduplicated corpus: one survivor (minimum id) per
        cluster, non-clustered docs passed through — one anti-join over
        the memoized clusters."""
        return cluster_canonicalize(
            self._docs, self.clusters(), id_col=self._id_col
        )
