"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hybrid-search query (vector kNN +
BM25 fused with RRF — the engine's core capability, SURVEY §3.1) at
sf0.001. ``queries()``/``oracle_sql()`` expose every implemented
operator with its DuckDB oracle (see
documents_vector_search_spark/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from documents_vector_search_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hybrid RRF search (cosine kNN + BM25) over sf0.001,
    joined back to documents for presentation (SURVEY §2.5 Q4/Q5)."""
    fused = registry.q_rrf_hybrid(spark, SMOKE_SF_DIR)
    docs = spark.read.parquet(f"{SMOKE_SF_DIR}/documents.parquet")
    return (
        fused.join(docs, "doc_id")
        .select("doc_id", "rrf_score", "lang", "source", "n_chars")
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    north-star dedup/ANN/text-analysis/multimodal additions)."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL, keyed identically to ``queries()``."""
    return registry.oracle_sql()
