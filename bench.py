"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes end-to-end into a noop sink (full computation, no
driver-side row transfer skewing the measurement). One warm-up query
absorbs JVM/codegen startup so numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from documents_vector_search_spark import registry
from documents_vector_search_spark.session import get_spark

HEADLINE = [
    "bm25_topk",
    "knn_cosine",
    "knn_l2",
    "ann_lsh",
    "rrf_hybrid",
    "chunk_split",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "embedding_neardup",
    "lang_id",
    "quality",
    "token_counts",
    "fingerprint",
    "tpch_q1",
    "revenue_join",
    "events_window",
    "sessionize",
    "multimodal",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="dvss-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()

    # warm-up: JIT, codegen, parquet footer caches
    qs["knn_l2"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
