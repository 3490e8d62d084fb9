"""Shingle-row production: (id, shingle) rows without interpreted HOFs.

Spark evaluates higher-order array functions (transform / filter /
aggregate) interpreted, per element — building hundreds of shingle
strings per document through ``transform(sequence(...), slice+join)``
costs ~10x more than the equivalent relational plan. This module emits
shingles as ROWS via posexplode + window ``lead`` — whole-stage-codegen
end to end except the single window shuffle keyed by document id
(uniform, no skew).

Semantics identical to functions/text.py::word_shingles:
- n-token docs with n >= size: one shingle per position 0..n-size
- 1 <= n < size: a single shingle of all tokens
- n == 0: a single empty-string shingle (docs never vanish)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.text import tokenize


def shingle_array(
    docs: DataFrame,
    size: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
) -> DataFrame:
    """``(id, shingles ARRAY<STRING>)`` as a MAP-ONLY projection.

    Fastest shingle producer measured (beats both the window-``lead``
    row form and the slice+array_join HOF): one ``transform`` over the
    position range with three O(1) null-safe ``get`` lookups per
    shingle; ``concat_ws`` skips the NULLs past the end, which makes
    the short-doc single shingle and the empty-doc "" shingle fall out
    of the same expression (semantics identical to word_shingles /
    shingle_rows). Zero shuffles, zero Python.
    """
    toks = tokenize(text_col)
    cnt = F.greatest(F.size("_t") - F.lit(size - 1), F.lit(1))

    def mk(i):
        return F.concat_ws(" ", *[F.get("_t", i + j) for j in range(size)])

    arr = F.transform(F.sequence(F.lit(0), cnt - F.lit(1)), mk)
    if distinct:
        arr = F.array_distinct(arr)
    return docs.select(F.col(id_col).alias("id"), toks.alias("_t")).select(
        "id", arr.alias("shingles")
    )


def shingle_rows(
    docs: DataFrame,
    size: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
) -> DataFrame:
    """``(id, shingle)`` rows; ``distinct`` de-dups per (id, shingle)."""
    tokens = docs.select(
        F.col(id_col).alias("id"),
        # posexplode_outer + IsNotNull dodges InferFiltersFromGenerate
        # (it would re-evaluate tokenize twice more per row)
        F.posexplode_outer(tokenize(text_col)).alias("pos", "term"),
    ).filter(F.col("term").isNotNull())
    w = Window.partitionBy("id").orderBy("pos")
    leads = [F.col("term")] + [F.lead("term", j).over(w) for j in range(1, size)]
    cnt = F.count("*").over(Window.partitionBy("id"))
    shingled = tokens.select(
        "id",
        F.col("pos"),
        cnt.alias("n"),
        # concat_ws skips NULLs, so the short-doc single shingle falls
        # out of the same expression
        F.concat_ws(" ", *leads).alias("shingle"),
    ).filter(
        ((F.col("n") >= size) & (F.col("pos") <= F.col("n") - size))
        | ((F.col("n") < size) & (F.col("pos") == 0))
    ).select("id", "shingle")

    # docs with zero tokens produce no rows: restore the "" shingle
    # (map-only predicate on the docs scan — no extra pass over shingles)
    empty = docs.filter(F.size(tokenize(text_col)) == 0).select(
        F.col(id_col).alias("id"), F.lit("").alias("shingle")
    )
    out = shingled.unionByName(empty)
    return out.distinct() if distinct else out
