"""Faceted search: hit counts per metadata value over a match-set.

The reference exposes metadata filtering (filter mini-language,
main/indexes/filter_parser.py) but cannot tell a user WHAT values are
available to filter on, or how many hits each would keep — the facet
panel every search UI builds. This operator computes those counts over
an arbitrary match-set in one pass.

Spark shape: unpivot the facet columns with ``stack`` (one generated
row per (facet, value) per doc — map-side), then ONE hash aggregation
on (facet, value). A single shuffle whose key space is the facet
cardinality, regardless of how many facet columns are requested —
never one job per facet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(matched: DataFrame, facet_cols: list[str]) -> DataFrame:
    """``(facet, value, n_docs)`` over ``matched``, one row per
    distinct value of each requested facet column (NULLs grouped under
    the SQL-standard NULL value). Counts are per-document because the
    caller passes a one-row-per-document frame."""
    if not facet_cols:
        raise ValueError("facet_counts needs at least one facet column")
    pairs = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in facet_cols
    )
    unpivoted = matched.select(
        F.expr(
            f"stack({len(facet_cols)}, {pairs}) as (facet, value)"
        )
    )
    return unpivoted.groupBy("facet", "value").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
