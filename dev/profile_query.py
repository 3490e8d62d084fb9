"""Split a registry key's cost into plan-construction (eager fit jobs)
vs noop-sink execution, warm + median-of-3 each.

Usage: python dev/profile_query.py key [key ...] [--sf DIR]

Construction time covers everything the query builder does before
returning its DataFrame (fit collects, size estimates, localCheckpoint
materializations); execution is the noop write of the returned frame.
The bench harness times construction+execution together, so a key whose
construction dominates is optimized by cutting driver actions, not by
plan surgery.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    import __spark_entry__ as entrymod
    from documents_vector_search_spark.session import get_spark

    spark = get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    for name in args:
        fn = qs[name]
        # warm
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cons, execs, totals = [], [], []
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
            totals.append(t2 - t0)
        cons.sort(), execs.sort(), totals.sort()
        print(
            f"{name}: total={totals[1]:.3f}s construct={cons[1]:.3f}s "
            f"exec={execs[1]:.3f}s (spread {totals[-1]-totals[0]:.3f})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
