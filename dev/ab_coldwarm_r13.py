"""Round-13 cold-path A/B: eager _warm_cache at construction vs the
lazy first-search materialization (the pre-r13 behavior, reproduced by
no-op'ing _warm_cache). Builds the bench collection layout once, then
alternates fresh searchers of each design, timing construction and the
first (cold) hybrid search separately. spark.catalog.clearCache()
between searchers so every cold run starts from parquet.

Usage: python dev/ab_coldwarm_r13.py [n_reps]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-coldwarm-r13")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="dvss_cw_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("string").alias("id"),
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
            F.create_map(
                F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
            ).alias("metadata"),
            F.col("text"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias(
                "last_modified_at"
            ),
            F.lit("bench").alias("source_type"),
        )
        coll = Collection(spark, base, "cw")
        create_collection(
            coll, docs, chunk_size=500, chunk_overlap=50,
            positional_postings=True, fuzzy_dictionary=True,
        )

        lazy_patch = lambda self: None  # noqa: E731 — pre-r13 behavior
        real_warm = CollectionSearcher._warm_cache

        def one(design: str) -> tuple[float, float]:
            spark.catalog.clearCache()
            if design == "lazy":
                CollectionSearcher._warm_cache = lazy_patch
            else:
                CollectionSearcher._warm_cache = real_warm
            t0 = time.time()
            s = CollectionSearcher(coll, cache_tables=True)
            t_construct = time.time() - t0
            t0 = time.time()
            s.search("hash join vector scan", max_chunks=15).write.format(
                "noop"
            ).mode("overwrite").save()
            return t_construct, time.time() - t0

        # one throwaway pair so codegen/footers are equally warm for both
        one("lazy"); one("eager")
        for i in range(n):
            for design in ("lazy", "eager"):
                tc, ts = one(design)
                print(
                    f"rep{i} {design:5s}: construct={tc:.3f}s "
                    f"first_search={ts:.3f}s total={tc + ts:.3f}s"
                )
    finally:
        CollectionSearcher._warm_cache = real_warm
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
