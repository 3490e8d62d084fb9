"""Training-shard export: deterministic global shuffle into N shards.

The last step of a prep pipeline hands the corpus to a trainer, which
wants (a) the data split into a FIXED number of shards so data-parallel
workers can each own a slice, (b) a pseudo-random global order so
consecutive examples are decorrelated (no source/time runs), and
(c) reproducibility — re-running the export, on any engine, must
produce the same example in the same position.

RNG-based shuffles fail (c): Spark's ``orderBy(rand(seed))`` depends on
partitioning and is not portable. The standard fix is the same
hash-gating used for sampling (operators/sampling.py): shard =
``md5(seed, id) mod N`` and within-shard position = an independently
salted hash of the id. Both are pure Column expressions, so the whole
export is oracle-checkable and bit-reproducible.

Scale shape (100 TB): ONE shuffle — repartition on the shard column
(uniform by construction: md5 buckets), then a sortWithinPartitions on
the position key (spillable local sort, no global sort / no
range-partition sampling pass that ``orderBy`` would cost), then a
partitioned write. ``max_records_per_file`` caps file sizes so a
10 GB shard lands as trainer-friendly pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.hashing import md5_hash64

SHARD_COL = "shard"
POS_COL = "_pos"


def assign_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Add ``shard`` (uniform in [0, n_shards)) and ``_pos`` (the
    within-shard pseudo-random position key) — map-only, deterministic,
    engine-portable."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    sid = F.col(id_col).cast("string")
    return df.withColumn(
        SHARD_COL, F.pmod(md5_hash64(sid, salt=seed), F.lit(n_shards))
    ).withColumn(POS_COL, md5_hash64(sid, salt=seed + 1))


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
    seed: int = 0,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Materialize the shuffled corpus as ``shard=K`` directories.

    One repartition shuffle keyed on the shard column co-locates each
    shard in one task (so a shard's files come from one writer, and the
    within-file order IS the sorted position order), the local sort
    orders by the position key, and the partitioned write lays out one
    directory per shard.

    ``fmt``: ``"parquet"`` (default — columnar, the analytics-side
    format) or ``"jsonl"`` (newline-delimited JSON via Spark's json
    sink — what webdataset/HuggingFace-style trainer loaders stream
    directly; gzip-compressed, since JSONL of text corpora compresses
    ~5x and trainers decompress on the fly)."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unknown shard format: {fmt!r}")
    sharded = assign_shards(df, id_col, n_shards, seed)
    writer = (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, POS_COL, id_col)
        .drop(POS_COL)
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if fmt == "jsonl":
        writer.option("compression", "gzip").json(path)
    else:
        writer.parquet(path)
