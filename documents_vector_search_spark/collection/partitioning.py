"""Update-bucket partitioning: the layout that makes incremental
updates O(changed), not O(corpus).

Every collection table carries a ``_pb`` (partition bucket) directory
column — a stable md5-derived bucket of the OWNING DOCUMENT's id, for
all five tables. Chunk-keyed rows (chunks, embeddings, postings,
doc_stats) inherit the bucket from their parent document rather than
hashing their own chunk id: every row an update deletes belongs to a
changed document, so bucketing by owner keeps delete locality AND
bounds the affected set at ≤ batch-doc-count buckets across ALL tables
— a batch's chunk ids would otherwise spray over every bucket. The
updater reads only those partitions (Parquet partition pruning),
merges, and swaps just those directories. Unaffected partitions —
files, mtimes, everything — are never rewritten.

Layout tables keep their query-pruning column as a SIBLING partition
level (``cluster_id=*/_pb=N``, ``term_bucket=*/_pb=N``, ``bucket=*/
_pb=N``): Spark prunes on ANY directory level, not just a prefix, so
query-side pruning is unchanged while update-side pruning composes
with it.

Sizing: a single-doc update rewrites ~1/``update_buckets`` of each
table, so size ``update_buckets`` to your rewrite budget — the default
8 suits test corpora; a 100 TB deployment wants 1024+ (≈100 GB per
bucket). Recorded in the manifest (``converter.updateBuckets``) so
updates reproduce the exact same bucketing.

The reference rebuilds whole indexes on update (FAISS delete+re-add is
in-memory, main/core/documents_collection_creator.py:73-98); this is
the partition-pruned disk analog.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.hashing import md5_hash64

UPDATE_PB_COL = "_pb"


def pb_col(key: Column, n_buckets: int) -> Column:
    """Partition bucket of a delete key — md5-derived (stable across
    engines and sessions, unlike hash/xxhash64 whose seeds are
    Spark-internal)."""
    return (md5_hash64(key.cast("string")) % F.lit(n_buckets)).cast("int")


def pb_dirs(root: Path, pbs: set[int], col: str = UPDATE_PB_COL) -> list[Path]:
    """All ``<col>=X`` directories under ``root`` whose X is in ``pbs``
    — ONE tree walk regardless of how many buckets are affected (a
    per-bucket glob would rescan the layout tree O(buckets) times; at
    production bucket counts that dominates the swap). ``col`` defaults
    to the update bucket; the fuzzy artifacts swap on their own
    query-pruning columns (``term_bucket`` / ``variant_bucket``)."""
    prefix = f"{col}="
    out = []
    for p in root.rglob(f"{prefix}*"):
        if p.is_dir():
            try:
                if int(p.name[len(prefix):]) in pbs:
                    out.append(p)
            except ValueError:
                continue
    return out
