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


def corpus_jaccard(
    docs_a: DataFrame,
    docs_b: DataFrame,
    shingle_words: int = 3,
    k: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """KMV-sketch Jaccard similarity between two CORPORA's shingle sets
    — one row ``(k_used, n_common, jaccard_est)``: "how much does
    source A's text overlap source B's" without ever materializing
    either shingle set (the cross-source contamination / provenance
    question a 100 TB mixing pipeline asks before blending corpora).

    Standard k-minimum-values estimator (Beyer et al. 2007): per side,
    the k smallest distinct md5 shingle hashes (the
    :func:`kmv_candidates` bounded pass — ≤ k rows per Arrow batch, so
    each side reduces to ≤ k rows however large the corpus); then over
    the k smallest of the UNION, the fraction present in both sketches
    estimates J(A, B). Deterministic md5 hashing makes the estimate
    bit-identical in any engine — oracle-checkable, like
    :func:`kmv_distinct`. The merge is a full-outer join of two ≤ k-row
    frames: driver-free, constant-size."""
    from documents_vector_search_spark.operators.dedup import with_shingles

    def sketch(docs: DataFrame, tag: str) -> DataFrame:
        # repartition between the shingle build and the explode (the
        # expression runs once scan-side, downstream work spreads), and
        # explode_outer + isNotNull to dodge InferFiltersFromGenerate
        # re-inlining the whole shingle expression into the scan filter
        # (the ngram_novelty lesson; word_shingles never emits an empty
        # array so the outer NULL row never occurs)
        sh = with_shingles(docs, shingle_words, id_col, text_col).repartition(
            F.col(id_col)
        )
        hashes = (
            sh.select(F.explode_outer("shingles").alias("_g"))
            .filter(F.col("_g").isNotNull())
            .select(md5_hash64(F.col("_g")).alias("h"))
        )
        return (
            kmv_candidates(hashes, k)
            .distinct()
            .orderBy(F.col("h").asc())
            .limit(k)
            .select("h", F.lit(1).alias(f"_in_{tag}"))
        )

    merged = sketch(docs_a, "a").join(sketch(docs_b, "b"), "h", "full_outer")
    top_union = (
        merged.select(
            "h",
            F.coalesce("_in_a", F.lit(0)).alias("_a"),
            F.coalesce("_in_b", F.lit(0)).alias("_b"),
        )
        .orderBy(F.col("h").asc())
        .limit(k)
    )
    n_common = F.sum((F.col("_a") * F.col("_b"))).cast("bigint")
    k_used = F.count(F.lit(1)).cast("bigint")
    return top_union.agg(
        k_used.alias("k_used"),
        n_common.alias("n_common"),
        F.round(
            F.when(k_used > 0, n_common / k_used).otherwise(F.lit(0.0)),
            round_to,
        ).alias("jaccard_est"),
    )


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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------
# Exact top-k term frequencies need a corpus-wide groupBy whose state
# is the FULL distinct-key set — at 100 TB that is 10^9+ keys through
# the shuffle. The Misra-Gries summary (Misra & Gries 1982; the
# "space-saving" family — public) bounds the state to ``capacity``
# counters per partition and still guarantees every key with true
# frequency > n/capacity survives, with counts underestimated by at
# most the sketch's decrement total.
#
# Spark shape (both levels bounded):
# 1. Per-partition sketch via Arrow mapInPandas — one vectorized
#    ``value_counts`` per batch merged into a dict, then the BATCHED
#    Misra-Gries reduction: when the dict exceeds ``capacity``,
#    subtract the (capacity+1)-th largest count from every counter and
#    drop the non-positive ones (equivalent to that many elementwise
#    decrement rounds, so the classic bound holds). ≤ capacity rows
#    per partition plus the partition's decrement offset.
# 2. Merge: union the partition sketches, sum per key (map-side
#    combinable — the shuffle carries at most partitions × capacity
#    rows, never the corpus's distinct-key set), sum the offsets, take
#    the global top-k.
#
# Result rows carry (term, est_count, max_underestimate) with
# est_count ≤ true ≤ est_count + max_underestimate, pinned by tests
# against exact counts. With capacity ≥ the distinct-key count no
# decrement ever fires and the sketch IS exact (what the registry
# oracle exploits).

def _reduce_to_capacity(counters: dict, capacity: int) -> int:
    """Batched Misra-Gries reduction: shrink ``counters`` to at most
    ``capacity`` keys by subtracting the (capacity+1)-th largest count
    from everything; returns the amount subtracted (the decrement
    offset this round)."""
    if len(counters) <= capacity:
        return 0
    counts = sorted(counters.values(), reverse=True)
    offset = counts[capacity]  # (capacity+1)-th largest
    for k in list(counters):
        c = counters[k] - offset
        if c > 0:
            counters[k] = c
        else:
            del counters[k]
    return offset


def misra_gries_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Top-``k`` most frequent values of ``col`` —
    ``(term, est_count, max_underestimate)`` by est_count descending,
    ties lexicographic. Never holds more than ``capacity`` counters per
    partition or in the merge; see the module docstring for the
    guarantees."""
    import pandas as pd

    src = df.select(F.col(col).cast("string").alias("term")).filter(
        F.col("term").isNotNull()
    )

    def sketch_partition(batches):
        counters: dict[str, int] = {}
        offset = 0
        for pdf in batches:
            vc = pdf["term"].value_counts()
            for term, c in vc.items():
                counters[term] = counters.get(term, 0) + int(c)
            offset += _reduce_to_capacity(counters, capacity)
        yield pd.DataFrame(
            {
                "term": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [0],
                # one offset row per partition (term NULL): the merge
                # sums these into the global underestimate bound
                "offset": [0] * len(counters) + [offset],
            }
        )

    sketches = src.mapInPandas(
        sketch_partition, "term string, cnt long, offset long"
    )

    merged = sketches.groupBy("term").agg(
        F.sum("cnt").alias("cnt"), F.sum("offset").alias("offset")
    )
    total_offset = merged.filter(F.col("term").isNull()).select(
        F.coalesce(F.sum("offset"), F.lit(0)).alias("max_underestimate")
    )
    return (
        merged.filter(F.col("term").isNotNull())
        .select("term", F.col("cnt").alias("est_count"))
        .crossJoin(F.broadcast(total_offset))
        .orderBy(F.col("est_count").desc(), F.col("term").asc())
        .limit(k)
    )


# -- count-min sketch --------------------------------------------------------


def cms_build(
    df: DataFrame,
    value: Column,
    depth: int = 4,
    width: int = 256,
    weight: Column | None = None,
) -> DataFrame:
    """Count-min sketch of ``value`` frequencies — ``(d, bucket, cnt)``
    with depth × width counters (Cormode & Muthukrishnan, "An improved
    data stream summary: the count-min sketch and its applications",
    2005 — public). Row ``d`` uses the repo's salted md5 hash family
    (functions/hashing.py) so the sketch is bit-identical in any
    engine and the ESTIMATES are oracle-checkable, unlike engine-
    internal approx aggregates.

    Guarantees: a point estimate never underestimates; overestimates
    by more than 2N/width happen with probability ≤ 2^-depth (N =
    stream length).

    Scale shape (100 TB): one projection exploding each value into its
    ``depth`` (row, bucket) coordinates + ONE aggregation whose key
    space is depth × width — map-side combinable into a tiny bounded
    reduce, the same shape however large the stream. The sketch is
    mergeable across corpora by summing counters.

    ``weight``: each row contributes that int64 amount to its cells
    instead of 1 — pass PRE-AGGREGATED ``(value, count)`` rows so the
    ``depth`` md5 hashes run once per DISTINCT value rather than once
    per occurrence (identical counters by linearity of the sketch; the
    occurrence→distinct pre-aggregation is the cheaper shuffle
    whenever values repeat, and the hash work drops by the repeat
    factor)."""
    w = F.lit(1).cast("bigint") if weight is None else weight.cast("bigint")
    coords = df.select(
        w.alias("_w"),
        F.posexplode(
            F.array(
                *[
                    (md5_hash64(value.cast("string"), salt=d) % width).cast(
                        "int"
                    )
                    for d in range(depth)
                ]
            )
        ).alias("d", "bucket"),
    )
    return coords.groupBy("d", "bucket").agg(
        F.sum("_w").cast("bigint").alias("cnt")
    )


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates — ``(item, est)``, ``est`` = min over
    the sketch's rows of the counter at ``h_d(item)`` (an untouched
    bucket counts 0). The sketch is depth × width rows, so the lookup
    is a BROADCAST join against however many probe items — no shuffle
    of anything unbounded."""
    probes = items.select(
        F.col(item_col),
        F.posexplode(
            F.array(
                *[
                    (
                        md5_hash64(F.col(item_col).cast("string"), salt=d)
                        % width
                    ).cast("int")
                    for d in range(depth)
                ]
            )
        ).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est")
        )
    )
