"""Point fetch of a document with a line-range slice.

Spark-first re-expression of the reference's fetcher
(main/core/documents_collection_fetcher.py:10-39): load document by id,
``text.splitlines()[start-1:end]`` with clamping, return the slice plus
total line count. Missing id raised FileNotFoundError in the reference;
here it is simply an empty DataFrame (the serving adapter decides how to
surface it).

Spark-first: ``filter(id = ...)`` is a pushed-down point predicate
(parquet row-group stats / partition pruning skip everything else), and
the line slice is split/slice/array_join — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch_lines(
    docs: DataFrame,
    doc_id,
    start_line: int = 1,
    end_line: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, start_line, end_line, total_lines, text_slice)``.

    Lines are 1-based and clamped to [1, total_lines] exactly like the
    reference (documents_collection_fetcher.py:20-27). Default range
    1-200 per the CLI default (BASELINE.md fetch row).
    """
    start = max(1, int(start_line))
    end = int(end_line)
    # str.splitlines() parity for the common line endings: \r\n, \r, \n
    # (the reference fetcher splits with splitlines(); splitting on bare
    # \n would leak \r into slices and inflate total_lines differently)
    lines = F.split(F.col(text_col), r"\r\n|\r|\n")
    total = F.size(lines)
    clamped_end = F.least(F.lit(end), total)
    slice_len = F.greatest(clamped_end - F.lit(start) + 1, F.lit(0))
    return (
        docs.filter(F.col(id_col) == F.lit(doc_id))
        .select(
            F.col(id_col),
            F.lit(start).alias("start_line"),
            clamped_end.alias("end_line"),
            total.alias("total_lines"),
            F.array_join(
                F.slice(lines, F.lit(start), slice_len), "\n"
            ).alias("text_slice"),
        )
    )
