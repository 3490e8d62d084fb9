"""Fuzzy-search collection artifacts: vocabulary + deletion index.

``suggest`` / ``search --fuzzy`` need a term dictionary (term, ctf,
df) and its SymSpell deletion index (operators/fuzzy.py). Deriving
them from postings per query is fine for ad-hoc use but pays a
postings-wide aggregate every call; a collection created with
``fuzzy_dictionary=True`` materializes both as tables beside the
postings, so a suggestion probe is a PARTITION-PRUNED scan of the
deletion index (variant_bucket directories, same md5-bucket scheme as
the BM25 term_bucket layout) — bytes read ≈ |query deletion variants|
/ N_VARIANT_BUCKETS of a vocabulary-sized table.

Incremental maintenance (updater/deleter): the vocabulary merges a
DELTA aggregated from exactly the postings rows the update touches
(fresh minus stale — vocabulary-of-changed-docs-sized, never a
corpus rescan); the deletion index then regenerates from the merged
vocabulary — a VOCABULARY-sized job (the variants of a term scatter
across buckets, so per-term index patching would rewrite most buckets
anyway). Both land through the same staged ``__tmp``/``__old`` swap
as every other table.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.bm25 import term_bucket
from documents_vector_search_spark.operators.fuzzy import (
    build_deletion_index,
    build_term_dictionary,
)

VOCAB_TABLE = "vocab"
DELETION_INDEX_TABLE = "deletion_index"
N_VARIANT_BUCKETS = 64
DEFAULT_MAX_EDITS = 1


def fuzzy_config(manifest) -> dict | None:
    try:
        return manifest.converter.get("fuzzy")
    except Exception:  # noqa: BLE001 — manifests predating the field
        return None


def deletion_index_df(vocab: DataFrame, max_edits: int = DEFAULT_MAX_EDITS) -> DataFrame:
    """(term, ctf, df, variant, variant_bucket) — bucketed by the SAME
    md5 scheme as the postings term_bucket, driver twin included."""
    didx = build_deletion_index(vocab, max_edits=max_edits)
    return didx.withColumn("variant_bucket", term_bucket(F.col("variant")))


def write_fuzzy_artifacts(
    collection,
    postings: DataFrame | None = None,
    max_edits: int = DEFAULT_MAX_EDITS,
) -> None:
    """Create-time build: vocabulary from the postings table, deletion
    index partitioned by variant_bucket."""
    if postings is None:
        postings = collection.read("postings")
    vocab = build_term_dictionary(postings)
    collection.write(VOCAB_TABLE, vocab)
    collection.write(
        DELETION_INDEX_TABLE,
        deletion_index_df(collection.read(VOCAB_TABLE), max_edits),
        partition_by=["variant_bucket"],
    )


def vocab_delta(fresh_postings: DataFrame, stale_postings: DataFrame) -> DataFrame:
    """(term, d_ctf, d_df) aggregated from ONLY the changed postings
    rows — the vocabulary update never rescans the corpus."""
    fresh = fresh_postings.groupBy("term").agg(
        F.sum("tf").cast("bigint").alias("_fc"),
        F.count("*").cast("bigint").alias("_fd"),
    )
    stale = stale_postings.groupBy("term").agg(
        F.sum("tf").cast("bigint").alias("_sc"),
        F.count("*").cast("bigint").alias("_sd"),
    )
    return (
        fresh.join(stale, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("_fc", F.lit(0)) - F.coalesce("_sc", F.lit(0))).alias("d_ctf"),
            (F.coalesce("_fd", F.lit(0)) - F.coalesce("_sd", F.lit(0))).alias("d_df"),
        )
        .filter((F.col("d_ctf") != 0) | (F.col("d_df") != 0))
    )


def apply_vocab_delta(
    collection, delta_path: str, max_edits: int = DEFAULT_MAX_EDITS
) -> None:
    """Post-swap phase: merge the materialized delta into the
    vocabulary, drop terms whose count reaches zero, regenerate the
    deletion index, and swap both tables staged."""
    import shutil

    spark = collection.spark
    delta = spark.read.parquet(delta_path)
    vocab = collection.read(VOCAB_TABLE)
    merged = (
        vocab.join(delta, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("ctf", F.lit(0)) + F.coalesce("d_ctf", F.lit(0))).alias("ctf"),
            (F.coalesce("df", F.lit(0)) + F.coalesce("d_df", F.lit(0))).alias("df"),
        )
        .filter(F.col("ctf") > 0)
    )

    # staged: materialize BOTH to __tmp while readers see intact tables
    tmp_vocab = Path(collection.table_path(f"{VOCAB_TABLE}__tmp"))
    merged.write.mode("overwrite").parquet(str(tmp_vocab))
    new_vocab = spark.read.parquet(str(tmp_vocab))
    tmp_didx = Path(collection.table_path(f"{DELETION_INDEX_TABLE}__tmp"))
    deletion_index_df(new_vocab, max_edits).write.mode("overwrite").partitionBy(
        "variant_bucket"
    ).parquet(str(tmp_didx))

    for table, tmp in ((VOCAB_TABLE, tmp_vocab), (DELETION_INDEX_TABLE, tmp_didx)):
        final = Path(collection.table_path(table))
        old = final.with_name(f"{table}__old")
        if final.exists():
            final.rename(old)
        tmp.rename(final)
        if old.exists():
            shutil.rmtree(old)
