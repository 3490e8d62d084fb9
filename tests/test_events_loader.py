"""Robustness of registry._events across the three `ts` encodings the
driver's testdata has shipped over rounds:

  * TIMESTAMP(NANOS)          — Spark's vectorized reader rejects it;
                                loaded via nanosAsLong + truncation
  * TIMESTAMP (micros, no tz) — Spark reads TIMESTAMP_NTZ
  * TIMESTAMP (micros, UTC)   — Spark reads TIMESTAMP_LTZ

All three must load to identical TIMESTAMP_LTZ micros under the UTC
session timezone (= DuckDB's naive-timestamp reading of the same file).
"""
from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from documents_vector_search_spark import registry

TS_US = [
    1704067200_000000,  # 2024-01-01 00:00:00
    1704844800_123456,  # 2024-01-10 00:00:00.123456
    1735689599_999999,  # 2024-12-31 23:59:59.999999
]


def _write_events(path: str, ts_array: pa.Array) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "purchase", "signup"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def encodings_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("events_encodings")
    naive = [dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us) for us in TS_US]
    layouts = {
        "nanos": pa.array([us * 1000 for us in TS_US], pa.timestamp("ns")),
        "ntz": pa.array(naive, pa.timestamp("us")),
        "ltz": pa.array(naive, pa.timestamp("us", tz="UTC")),
    }
    for name, arr in layouts.items():
        d = root / name
        d.mkdir()
        _write_events(str(d / "events.parquet"), arr)
    return root


@pytest.mark.parametrize("layout", ["nanos", "ntz", "ltz"])
def test_events_loader_normalizes_encoding(spark, encodings_dir, layout):
    ev = registry._events(spark, str(encodings_dir / layout))
    assert dict(ev.dtypes)["ts"] == "timestamp", layout
    from pyspark.sql import functions as F

    got = [
        r["us"]
        for r in ev.select(F.unix_micros("ts").alias("us"))
        .orderBy("us")
        .collect()
    ]
    assert got == TS_US, layout


def test_all_encodings_agree_with_duckdb(spark, encodings_dir):
    """DuckDB (the correctness oracle) must read the same epoch micros
    from every layout that Spark does."""
    duckdb = pytest.importorskip("duckdb")
    for layout in ("nanos", "ntz", "ltz"):
        path = str(encodings_dir / layout / "events.parquet")
        oracle = [
            r[0]
            for r in duckdb.sql(
                f"SELECT epoch_us(ts::TIMESTAMP) FROM read_parquet('{path}') ORDER BY 1"
            ).fetchall()
        ]
        assert oracle == TS_US, layout
