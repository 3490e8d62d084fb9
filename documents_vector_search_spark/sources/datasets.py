"""Record-oriented dataset sources: JSONL / CSV / Parquet → canonical docs.

The reference ingests whole FILES (one document per file,
main/readers/files_reader.py) and API pages (Jira/Confluence); a
training-data pipeline's corpora arrive instead as RECORD datasets —
JSONL dumps, CSV exports, Parquet tables — with one document per row.
This module projects any such dataset onto the engine's canonical
document schema (collection/catalog.py::DOCUMENT_SCHEMA) so every
downstream stage (chunk/embed/index, dedup, curation, decontamination)
works unchanged.

Scale notes (100 TB):
- JSONL/CSV: pass ``schema`` — without it Spark runs a full inference
  scan before the real read (2× the I/O). Parquet needs no schema.
- The projection is map-only (column renames, casts, one map
  constructor); partitioning/pushdown behave exactly as the underlying
  ``spark.read`` source allows (Parquet prunes columns and pushes
  filters; JSONL at least prunes fields with an explicit schema).
- ``metadata_cols`` fold side columns into the canonical string map —
  values cast to string; a typed filter over them later goes through
  the filter mini-language's type hints (plans/filter_language.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMATS = {"jsonl": "json", "json": "json", "csv": "csv", "parquet": "parquet"}


def read_dataset_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    id_col: str = "id",
    text_col: str = "text",
    url_col: str | None = None,
    last_modified_col: str | None = None,
    metadata_cols: list[str] | None = None,
    source_type: str = "dataset",
    schema: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Load a record dataset and project it to canonical documents.

    ``id_col``/``text_col`` are required in the data; ``url_col``
    defaults to ``dataset://<id>``; ``last_modified_col`` (string or
    timestamp) defaults to NULL (treated as always-stale by watermark
    updates); ``metadata_cols`` become entries of the ``metadata`` map.
    """
    if fmt not in _FORMATS:
        raise ValueError(
            f"unsupported dataset format {fmt!r}; one of {sorted(_FORMATS)}"
        )
    reader = spark.read.format(_FORMATS[fmt])
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema:
        reader = reader.schema(schema)
    df = reader.load(path)

    missing = [c for c in (id_col, text_col) if c not in df.columns]
    if missing:
        raise ValueError(
            f"dataset at {path} lacks required column(s) {missing}; "
            f"available: {df.columns}"
        )

    url = (
        F.col(url_col).cast("string")
        if url_col
        else F.concat(F.lit("dataset://"), F.col(id_col).cast("string"))
    )
    meta_entries = []
    for c in metadata_cols or []:
        meta_entries.extend([F.lit(c), F.col(c).cast("string")])
    metadata = (
        F.create_map(*meta_entries)
        if meta_entries
        else F.create_map().cast("map<string,string>")
    )
    last_modified = (
        F.col(last_modified_col).cast("timestamp")
        if last_modified_col
        else F.lit(None).cast("timestamp")
    )
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        url.alias("url"),
        metadata.alias("metadata"),
        F.col(text_col).cast("string").alias("text"),
        last_modified.alias("last_modified_at"),
        F.lit(source_type).alias("source_type"),
    )
