"""Read-through source cache as a Parquet checkpoint.

Spark-first re-expression of the reference's CacheReaderDecorator
(main/sources/document_cache_reader_decorator.py:13-52): raw source
documents cached on disk keyed by sha256 of the reader config, with a
completion marker for atomicity; a hit replays from disk instead of
hitting the source API.

Here the cache IS a parquet dataset: hit → ``spark.read.parquet``
(columnar, predicate-pushable — strictly better than replaying JSON
files); the ``_completed`` marker file preserves the crash-atomicity
contract.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def reader_cache_key(reader_details: dict) -> str:
    """sha256 of the canonicalized reader config
    (document_cache_reader_decorator.py:13-18 semantics)."""
    canonical = json.dumps(reader_details, sort_keys=True)
    return hashlib.sha256(canonical.encode()).hexdigest()


def cached_read(
    spark: SparkSession,
    cache_base: str,
    reader_details: dict,
    read_fn: Callable[[], DataFrame],
) -> DataFrame:
    """Return cached documents if a completed cache exists for this
    reader config; otherwise run ``read_fn``, persist, and mark complete."""
    key = reader_cache_key(reader_details)
    cache_dir = Path(cache_base) / key
    marker = cache_dir / "_completed"
    data_dir = cache_dir / "data"

    if marker.exists():
        return spark.read.parquet(str(data_dir))

    df = read_fn()
    df.write.mode("overwrite").parquet(str(data_dir))
    cache_dir.mkdir(parents=True, exist_ok=True)
    marker.touch()
    return spark.read.parquet(str(data_dir))
