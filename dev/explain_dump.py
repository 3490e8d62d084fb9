"""Dump .explain("formatted") for registry keys into a directory.

Usage: python dev/explain_dump.py OUTDIR [sf_dir] [key ...]

Planning-only (no execution) except for query builders that run eager
fit/estimate steps at construction time. One file per key:
OUTDIR/<key>.txt. Used to commit plans/r12/<key>_before.txt /
_after.txt evidence for the optimization rounds.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:]

    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from documents_vector_search_spark.session import get_spark

    spark = get_spark(app_name="explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = only if only else list(qs)
    failures = []
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
            failures.append(name)
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name} ({len(plan)} chars)")
    if failures:
        print("FAILURES:", failures)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
