"""Round-13 serving A/B: (1) eager cache warm at searcher construction
vs the lazy first-search materialization, (2) df_via_aggregate True vs
False on the cached serving path.

Builds one collection at $SPARK_GRAFT_SF_DIR (positional+fuzzy, the
bench layout), then:
- cold path: times construction + first hybrid search for a warm-on-init
  searcher and (df toggle reused as a construction-cost control) for a
  df_via_aggregate=False searcher;
- warm path: interleaves N timed reps of hybrid / bm25 / batch4 /
  expand searches between the two df_via_aggregate settings and prints
  medians. Result parity is asserted via collected row comparison.

Usage: python dev/ab_serving_r13.py [n_iters]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-serving-r13")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="dvss_ab_")
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
        coll = Collection(spark, base, "ab")
        create_collection(
            coll, docs, chunk_size=500, chunk_overlap=50,
            positional_postings=True, fuzzy_dictionary=True,
        )

        # ---- cold: construction + first search ------------------------
        t0 = time.time()
        s_win = CollectionSearcher(
            coll, cache_tables=True, df_via_aggregate=False
        )
        t_construct_a = time.time() - t0
        t0 = time.time()
        s_win.search("hash join vector scan", max_chunks=15).write.format(
            "noop"
        ).mode("overwrite").save()
        t_first_a = time.time() - t0
        print(
            f"cold[A df=window ]: construct={t_construct_a:.3f}s "
            f"first_search={t_first_a:.3f}s total={t_construct_a + t_first_a:.3f}s"
        )

        s_agg = CollectionSearcher(
            coll, cache_tables=True, df_via_aggregate=True
        )

        def run(s, **kw):
            t0 = time.time()
            s.search(
                kw.pop("q", "hash join vector scan"), max_chunks=15, **kw
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        def run_batch(s):
            t0 = time.time()
            s.search_many(
                {
                    "q0": "hash join vector scan",
                    "q1": "sort merge",
                    "q2": "table window",
                    "q3": "key value batch",
                },
                max_chunks=15,
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        def run_expand(s):
            t0 = time.time()
            s.search(
                "hash join vector scan", max_chunks=15, expand_query=True
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        # parity: both settings must return identical rows
        a = s_win.search("hash join vector scan", max_chunks=15).collect()
        b = s_agg.search("hash join vector scan", max_chunks=15).collect()
        assert sorted(map(str, a)) == sorted(map(str, b)), "df A/B mismatch!"
        print(f"parity ok ({len(a)} rows)")

        for name, fa in (
            ("hybrid", run),
            ("bm25", lambda s: run(s, indexes=("bm25",))),
            ("batch4", run_batch),
            ("expand", run_expand),
        ):
            fa(s_win); fa(s_agg)  # warm both
            ta, tb = [], []
            for _ in range(n):
                ta.append(fa(s_win))
                tb.append(fa(s_agg))
            ta.sort(); tb.sort()
            print(
                f"warm {name:7s}: window={ta[n // 2]:.3f}s "
                f"aggregate={tb[n // 2]:.3f}s  "
                f"(all w={[round(t, 3) for t in ta]} a={[round(t, 3) for t in tb]})"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
