"""Search-result snippet extraction: best matching line per hit.

The reference returns whole documents (or fetched line slices,
main/collections_search/documents_fetcher.py) and leaves "where did my
query match?" to the caller. Every production search UI needs the
engine to answer that, so this completes the serving family with
keyword-in-context highlighting: for each hit, the line containing the
most query-term occurrences (ties → earliest line), truncated to a
display budget.

Spark shape:
- runs AFTER top-k selection, on the k hit documents only — the
  line explode is O(k · lines-per-doc), never a corpus scan. The
  caller semi-joins ``docs`` down to the hit set first (the registry
  query and CollectionSearcher.snippets both do).
- pure Column expressions end-to-end: split on newline runs,
  posexplode, per-line occurrence count via
  ``size(filter(tokenize(line), t ∈ terms))``, argmax by
  ``row_number`` over (hits desc, line asc). Integer scoring — no
  float parity risk between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.text import tokenize

# Windows/old-Mac/Unix newline split, shared verbatim with the DuckDB
# oracle (same class compiles identically in Java regex and RE2).
LINE_SPLIT_RE = "\\r\\n|\\r|\\n"

DEFAULT_MAX_CHARS = 200


def best_line_snippet(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = DEFAULT_MAX_CHARS,
) -> DataFrame:
    """``(id, line_no, snippet, n_hits)`` — the best matching line.

    ``line_no`` is 1-based (the convention of fetch_lines /
    collections fetcher). ``n_hits`` counts query-term OCCURRENCES in
    the line (duplicated terms count each time); the best line of a
    document that matched conjunctively always has ``n_hits >= 1``,
    but documents with zero occurrences (e.g. disjunctive callers)
    still return their first line with ``n_hits = 0`` rather than
    vanishing from the result.
    """
    if not terms:
        raise ValueError("best_line_snippet needs at least one term")
    terms_arr = F.array(*[F.lit(t) for t in sorted(set(terms))])
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), LINE_SPLIT_RE)).alias(
            "_pos", "_line"
        ),
    )
    scored = lines.select(
        F.col(id_col),
        (F.col("_pos") + F.lit(1)).cast("bigint").alias("line_no"),
        F.col("_line"),
        F.size(
            F.filter(
                tokenize(F.col("_line")),
                lambda t: F.array_contains(terms_arr, t),
            )
        ).alias("n_hits"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("n_hits").desc(), F.col("line_no").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            "line_no",
            F.substring(F.col("_line"), 1, max_chars).alias("snippet"),
            F.col("n_hits").cast("bigint").alias("n_hits"),
        )
    )
