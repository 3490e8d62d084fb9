"""Document chunking: overlapping windows + deterministic chunk ids.

Spark-first re-expression of the reference's text splitting (LangChain
RecursiveCharacterTextSplitter, chunk_size=1000 / overlap=100,
main/splitter/text_splitter.py:5-21) and global chunk-id assignment
(single-threaded counter, main/core/documents_collection_creator.py:115-136,
162-167).

Two splitters:

- ``fixed_window_chunks``: pure-expression fixed-size windows with
  overlap. Deterministic, oracle-reproducible, zero Python. This is the
  engine's default: at 100 TB the split must not cross into Python.
- ``recursive_character_chunks`` (see operators/embedding.py for the
  UDF pattern): a pandas-UDF seam for LangChain-compatible splitting
  when boundary-aware chunks matter more than throughput.

Chunk ids: the reference's mutable counter is order-dependent and
unreproducible under parallelism (SURVEY §7.4). We define
``chunk_id = row_number() OVER (ORDER BY doc_id, chunk_number) - 1 + offset``
— deterministic, reproducible, and preserving the reference's
"ids continue from lastIndexItemId across updates" semantics via
``offset`` (documents_collection_creator.py:129).

Scale note: a global row_number() is a single-partition window — fine
for assigning ids to an UPDATE batch (bounded), wrong for a 100 TB
initial build. For the initial build use the composite key
(doc_id, chunk_number) directly (it is already unique and stable), or
zipWithIndex-style per-partition offsets; ``assign_chunk_ids`` keeps the
reference-parity global-counter form for update batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CHUNK_SIZE = 1000
DEFAULT_OVERLAP = 100


def fixed_window_chunks(
    docs: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """1 doc → N overlapping substring chunks, as pure expressions.

    stride = chunk_size - overlap; chunk i covers
    ``substr(text, i*stride + 1, chunk_size)`` (1-based); a document of
    length L yields ``1 + ceil(max(L - chunk_size, 0) / stride)`` chunks
    (empty docs yield one empty chunk, mirroring the reference's
    always-present chunk 0, SURVEY §2.3 T2).

    Output: (doc_id, chunk_number, chunk_text).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    length = F.length(F.col(text_col))
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(length - F.lit(chunk_size), F.lit(0)) / F.lit(stride)
        ).cast("int")
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
            "chunk_number", "_i"
        ),
        F.col(text_col),
    ).select(
        F.col(id_col),
        F.col("chunk_number"),
        F.expr(
            f"substr({text_col}, chunk_number * {stride} + 1, {chunk_size})"
        ).alias("chunk_text"),
    )


def assign_chunk_ids(
    chunks: DataFrame,
    offset: int = 0,
    id_col: str = "doc_id",
    chunk_number_col: str = "chunk_number",
) -> DataFrame:
    """Global contiguous int64 chunk ids (reference counter parity).

    ``offset`` = previous lastIndexItemId + 1 when appending an update
    batch (documents_collection_creator.py:162-167). See module
    docstring for why this is reserved for bounded batches.
    """
    w = Window.orderBy(F.col(id_col), F.col(chunk_number_col))
    return chunks.withColumn(
        "chunk_id", (F.row_number().over(w) - 1 + F.lit(offset)).cast("bigint")
    )
