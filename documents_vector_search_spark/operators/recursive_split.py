"""Boundary-aware recursive character splitting (reference T1 parity).

The reference splits with LangChain's RecursiveCharacterTextSplitter
(main/splitter/text_splitter.py:5-21, chunk_size=1000 / overlap=100):
try to split on paragraph breaks, then newlines, then spaces, then
characters, greedily packing pieces up to chunk_size with overlap
carried between chunks. That library is not available here, so the
algorithm is re-implemented (standard public algorithm) in pure Python
and executed as an Arrow-batched pandas UDF — the documented "slow
path" seam (SURVEY §7.3: text split = pandas UDF, no Catalyst work).

``fixed_window_chunks`` (operators/chunking.py) remains the default
engine splitter: pure expression, oracle-reproducible, zero Python.
Use this one when boundary quality matters more than throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

DEFAULT_SEPARATORS = ("\n\n", "\n", " ", "")


def split_text_recursive(
    text: str,
    chunk_size: int = 1000,
    chunk_overlap: int = 100,
    separators: tuple[str, ...] = DEFAULT_SEPARATORS,
) -> list[str]:
    """Recursively split ``text`` into chunks <= chunk_size, preferring
    the earliest separator in ``separators`` that produces pieces small
    enough; merged greedily with ``chunk_overlap`` carried between
    adjacent chunks."""
    if chunk_overlap >= chunk_size:
        raise ValueError("chunk_overlap must be smaller than chunk_size")
    if text == "":
        return []

    def split_on(t: str, seps: tuple[str, ...]) -> list[str]:
        """Produce atomic pieces, each <= chunk_size."""
        if len(t) <= chunk_size:
            return [t]
        sep, rest = seps[0], seps[1:]
        if sep == "":
            return [
                t[i : i + chunk_size] for i in range(0, len(t), chunk_size)
            ]
        parts = t.split(sep)
        pieces: list[str] = []
        for i, part in enumerate(parts):
            chunk = part + (sep if i < len(parts) - 1 else "")
            if len(chunk) <= chunk_size:
                pieces.append(chunk)
            else:
                pieces.extend(split_on(chunk, rest))
        return pieces

    pieces = [p for p in split_on(text, separators) if p]

    # greedy merge with overlap carry (dropped when it would overflow)
    chunks: list[str] = []
    current = ""
    for piece in pieces:
        if current and len(current) + len(piece) > chunk_size:
            chunks.append(current)
            tail = current[len(current) - chunk_overlap:] if chunk_overlap else ""
            current = tail if len(tail) + len(piece) <= chunk_size else ""
        current += piece
    if current.strip() or not chunks:
        chunks.append(current)
    return [c for c in chunks if c]


def recursive_character_chunks(
    docs: DataFrame,
    chunk_size: int = 1000,
    chunk_overlap: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """1 doc → N boundary-aware chunks via an Arrow-batched pandas UDF.

    Output: (doc_id, chunk_number, chunk_text) — same shape as
    fixed_window_chunks, drop-in for collection/creator.py::build_chunks.
    """

    @F.pandas_udf(ArrayType(StringType()))
    def split_udf(texts):
        import pandas as pd

        return pd.Series(
            [
                split_text_recursive(t or "", chunk_size, chunk_overlap)
                for t in texts
            ]
        )

    return docs.select(
        F.col(id_col),
        F.posexplode(split_udf(F.col(text_col))).alias(
            "chunk_number", "chunk_text"
        ),
    )
