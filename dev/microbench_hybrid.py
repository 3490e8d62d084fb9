"""A/B micro-bench for the hybrid search path: build one collection at
$SPARK_GRAFT_SF_DIR, then time repeated warm searches. Used to verify
plan-level rewrites in CollectionSearcher don't regress serving latency.

Usage: python dev/microbench_hybrid.py [n_iters]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from documents_vector_search_spark.collection import (
    Collection,
    CollectionSearcher,
    create_collection,
)
from documents_vector_search_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hybrid-microbench")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="dvss_mb_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("string").alias("id"),
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
            F.create_map(
                F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
            ).alias("metadata"),
            F.col("text"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("last_modified_at"),
            F.lit("bench").alias("source_type"),
        )
        coll = Collection(spark, base, "mb")
        create_collection(coll, docs, chunk_size=500, chunk_overlap=50)
        searcher = CollectionSearcher(coll, cache_tables=True)

        def run() -> float:
            t0 = time.time()
            searcher.search(
                "hash join vector scan", max_chunks=15
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        run()  # warm-up: populates the persist() cache + codegen
        times = sorted(run() for _ in range(n))
        med = times[n // 2]
        print(f"warm hybrid: median {med:.3f}s  all {[round(t, 3) for t in times]}")
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
