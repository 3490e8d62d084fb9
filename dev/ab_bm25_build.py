"""Same-machine A/B probe for the r12 bm25 build changes.

Times, each warm + 3 runs (median): the field_postings registry key
(noop sink) and the two with_dl build_postings forms the collection
creator uses (tf-only and positional), over sf0.1 documents.

Usage: python dev/ab_bm25_build.py label
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"


def timed(label: str, make):
    make().write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        make().write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{label}: median={ts[1]:.3f}s all={[round(t, 3) for t in ts]}")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "run"
    import __spark_entry__ as entrymod
    from documents_vector_search_spark.operators.bm25 import build_postings
    from documents_vector_search_spark.session import get_spark

    spark = get_spark(app_name=f"ab-bm25-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    qs = entrymod.queries()
    timed(f"[{tag}] field_postings key", lambda: qs["field_postings"](spark, SF))
    timed(
        f"[{tag}] build_postings with_dl tf-only",
        lambda: build_postings(docs, with_dl=True),
    )
    timed(
        f"[{tag}] build_postings with_dl positional",
        lambda: build_postings(docs, with_dl=True, with_positions=True),
    )


if __name__ == "__main__":
    main()
