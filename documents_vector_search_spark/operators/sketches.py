"""Deterministic cardinality sketches for pipeline profiling.

``approx_count_distinct`` (Spark's HLL++) is the built-in answer, but
its result depends on engine internals — useless for a cross-engine
correctness oracle and unstable across versions. This module implements
the KMV (k minimum values) sketch (Beyer et al., "On synopses for
distinct-value estimation under multiset operations", SIGMOD 2007 —
public) over the repo's portable md5-derived hashes
(functions/hashing.py): every engine computes bit-identical sketches,
so the estimate itself is oracle-checkable.

Estimator: with U(k) = the k-th smallest distinct hash normalized to
[0, 1), D-hat = (k-1) / U(k).

Scale shape (100 TB): the naive plan (distinct -> sort -> limit k)
shuffles every distinct value. Instead ``kmv_candidates`` runs an
Arrow-batched mapInPandas that emits AT MOST k rows per batch — the
global k smallest distinct values are each among their own batch's k
smallest, so the union of per-batch candidates is a superset of the
answer. The final exact distinct + top-k runs over O(batches * k)
rows, not O(distinct values). Output is bounded regardless of input
size; no driver collect until the single result row.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.hashing import (
    md5_hash64,
    md5_hash64_sql,
)

# md5_hash64 yields 60-bit values: normalize by 2^60 into [0, 1)
_HASH_SPACE = float(1 << 60)


def kmv_candidates(hashes: DataFrame, k: int, hash_col: str = "h") -> DataFrame:
    """Bounded candidate pass: per Arrow batch, the k smallest DISTINCT
    hash values (≤ k rows out per batch, whatever the batch size)."""

    def per_batch(batches: Iterator) -> Iterator:
        for pdf in batches:
            uniq = pdf[hash_col].drop_duplicates().nsmallest(k)
            yield uniq.to_frame(name=hash_col)

    return hashes.mapInPandas(per_batch, schema=f"{hash_col} bigint")


def kmv_distinct(
    df: DataFrame,
    value: Column,
    k: int = 256,
    round_to: int = 6,
) -> DataFrame:
    """One-row DataFrame ``(k, kth_hash, est_distinct)`` estimating the
    number of distinct ``value``s. Deterministic: same input + same k =
    bit-identical sketch in any engine that can run md5."""
    hashes = df.select(md5_hash64(value.cast("string")).alias("h"))
    cands = kmv_candidates(hashes, k)
    topk = cands.distinct().orderBy(F.col("h").asc()).limit(k)
    return topk.agg(
        F.count("*").cast("bigint").alias("k"),
        F.max("h").alias("kth_hash"),
        F.round(
            (F.count("*") - 1) / (F.max("h") / F.lit(_HASH_SPACE)), round_to
        ).alias("est_distinct"),
    )


def kmv_distinct_sql(value_expr: str, k: int = 256, round_to: int = 6) -> str:
    """DuckDB twin of :func:`kmv_distinct` (oracle builder): the naive
    distinct-sort-limit plan — same answer, oracle-scale inputs only."""
    h = md5_hash64_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
WITH hx AS (SELECT DISTINCT {h} AS h FROM events),
topk AS (SELECT h FROM hx ORDER BY h ASC LIMIT {k})
SELECT count(*)::BIGINT AS k, max(h) AS kth_hash,
       round((count(*) - 1) / (max(h) / {_HASH_SPACE!r}), {round_to}) AS est_distinct
FROM topk
"""


def fixed_histogram(
    df: DataFrame,
    value: Column,
    lo: float,
    hi: float,
    bins: int = 10,
) -> DataFrame:
    """Fixed-range equi-width histogram: ``(bin, lo, hi, n)``.

    The profiling staple: one map-side bin assignment + one groupBy on
    a BOUNDED key space (``bins`` + 2 overflow rows) — map-side partial
    aggregation collapses each partition to at most bins+2 rows before
    the shuffle, so a 100 TB profile moves KB across the wire. Bin
    edges are caller-fixed (no min/max pre-pass): profiling pipelines
    know their domains, and a data-dependent range would cost a second
    scan and break cross-run comparability. Out-of-range values land in
    bins -1 (< lo) and ``bins`` (>= hi); empty bins are absent (join a
    ``sequence`` frame to densify when needed).
    """
    if hi <= lo or bins < 1:
        raise ValueError("need hi > lo and bins >= 1")
    width = (hi - lo) / bins
    v = value.cast("double")
    bin_id = (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(bins))
        .otherwise(F.floor((v - lo) / F.lit(width)).cast("int"))
    )
    return (
        df.select(bin_id.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("hi"),
            "n",
        )
    )
