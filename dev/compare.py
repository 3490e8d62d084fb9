"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, then compares row count, schema shape, and
an order-insensitive value hash (columns sorted by name, rows sorted by
their stringified values — a reasonable stand-in for the driver's
comparison).

Usage: python dev/compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    csv = df.to_csv(index=False, float_format="%.6f")
    return hashlib.sha256(csv.encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from documents_vector_search_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: SPARK ERROR {type(exc).__name__}: {exc}")
            continue
        spark_t = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP  {name}: no oracle (rows={len(sdf)}, {spark_t:.1f}s)")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: ORACLE ERROR {type(exc).__name__}: {exc}")
            continue
        ns, no = normalize(sdf), normalize(odf)
        rows_ok = len(ns) == len(no)
        cols_ok = list(ns.columns) == list(no.columns)
        hash_ok = rows_ok and cols_ok and value_hash(ns) == value_hash(no)
        status = "OK  " if hash_ok else "FAIL"
        if not hash_ok:
            failures.append(name)
        print(
            f"{status}  {name}: rows {len(ns)}/{len(no)} cols_ok={cols_ok} "
            f"hash_ok={hash_ok} ({spark_t:.1f}s)"
        )
        if not hash_ok and len(ns) and len(no):
            if not cols_ok:
                print(f"      spark cols:  {list(ns.columns)}")
                print(f"      oracle cols: {list(no.columns)}")
            else:
                merged = ns.merge(no, indicator=True, how="outer")
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
