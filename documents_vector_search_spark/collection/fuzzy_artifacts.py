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

Incremental maintenance (updater/deleter) is O(affected buckets), the
same contract as every other table:

* the vocabulary DELTA aggregates from exactly the postings rows the
  update touches (fresh minus stale — vocabulary-of-changed-docs-
  sized, never a corpus rescan);
* the vocab table is partitioned by ``term_bucket`` (same md5 scheme
  as postings), so the merge reads and rewrites ONLY the buckets the
  delta's terms hash into;
* the deletion index rewrites ONLY the ``variant_bucket`` partitions
  that deletion variants of changed terms hash into: changed-term rows
  in those buckets are replaced (anti-join + regenerated variants),
  unchanged terms' rows in them are carried over byte-equal, and every
  OTHER bucket directory is never touched (a changed term's index rows
  can only live in its own variants' buckets, so the carried set is
  complete by construction — pinned by pytest against the full
  rebuild).

Both land through the same partition-scoped two-phase swap as the
document tables (updater._swap_partitions, keyed on term_bucket /
variant_bucket instead of ``_pb``), with the same ``_PARTIAL.json``
crash rollback. Collections created before the partitioned-vocab
layout fall back to the legacy vocabulary-sized full regeneration;
``refit-fuzzy`` upgrades them in place.
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
    """Create-time build: vocabulary from the postings table
    (partitioned by term_bucket so incremental merges prune), deletion
    index partitioned by variant_bucket."""
    if postings is None:
        postings = collection.read("postings")
    vocab = build_term_dictionary(postings).withColumn(
        "term_bucket", term_bucket(F.col("term"))
    )
    collection.write(VOCAB_TABLE, vocab, partition_by=["term_bucket"])
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
    vocabulary and deletion index, rewriting ONLY the term_bucket /
    variant_bucket partitions the changed terms touch (legacy
    unpartitioned-vocab collections fall back to the full rewrite)."""
    spark = collection.spark
    delta = spark.read.parquet(delta_path)
    vocab = collection.read(VOCAB_TABLE)
    if "term_bucket" not in vocab.columns:
        _apply_vocab_delta_full(collection, delta, vocab, max_edits)
        return

    tbs, vbs = _affected_buckets(delta, delta_path, max_edits)
    if not tbs:
        return  # empty delta — nothing changed

    # merged vocab, affected term buckets only (partition-pruned scan);
    # every delta term hashes into tbs, so the merge is complete there
    # and all other buckets are untouched
    merged = (
        vocab.filter(F.col("term_bucket").isin(tbs))
        .drop("term_bucket")
        .join(delta, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("ctf", F.lit(0)) + F.coalesce("d_ctf", F.lit(0))).alias("ctf"),
            (F.coalesce("df", F.lit(0)) + F.coalesce("d_df", F.lit(0))).alias("df"),
        )
        .filter(F.col("ctf") > 0)
        .withColumn("term_bucket", term_bucket(F.col("term")))
    )

    # deletion index, affected variant buckets only: carry unchanged
    # terms' rows byte-equal, regenerate the changed (surviving) terms'
    # rows from the merged vocabulary
    didx = collection.read(DELETION_INDEX_TABLE)
    changed_terms = delta.select("term")
    carried = (
        didx.filter(F.col("variant_bucket").isin(vbs))
        .join(F.broadcast(changed_terms), "term", "left_anti")
    )
    regenerated = deletion_index_df(
        merged.join(F.broadcast(changed_terms), "term", "left_semi").drop(
            "term_bucket"
        ),
        max_edits,
    )
    new_didx = carried.unionByName(regenerated)

    # same two-phase partition-scoped swap as the document tables,
    # keyed on the artifacts' own query-pruning columns
    from documents_vector_search_spark.collection.updater import (
        _swap_partitions,
    )

    _swap_partitions(
        collection,
        {VOCAB_TABLE: merged, DELETION_INDEX_TABLE: new_didx},
        partition_cols={
            VOCAB_TABLE: ["term_bucket"],
            DELETION_INDEX_TABLE: ["variant_bucket"],
        },
        affected_pbs={VOCAB_TABLE: tbs, DELETION_INDEX_TABLE: vbs},
        swap_cols={
            VOCAB_TABLE: "term_bucket",
            DELETION_INDEX_TABLE: "variant_bucket",
        },
    )


# below this size the delta is read driver-side with pyarrow instead
# of paying a Spark job's scheduling overhead just to hash a handful
# of terms (typical incremental batches); larger deltas take the
# distributed path
_DRIVER_DELTA_BYTES = 64 << 20


def _affected_buckets(
    delta: DataFrame, delta_path: str, max_edits: int
) -> tuple[list[int], list[int]]:
    """Both affected-bucket sets from the delta: the vocab buckets the
    changed terms hash into, and the deletion-index buckets their
    deletion variants hash into (every index row of a changed term
    lives in one of those — a term's rows can only appear under its own
    variants' buckets). Small deltas compute driver-side via the
    engine-portable md5 twins; large ones in ONE delta-sized job."""
    try:
        local = Path(delta_path.removeprefix("file:"))
        size = sum(p.stat().st_size for p in local.rglob("*.parquet"))
        if size <= _DRIVER_DELTA_BYTES:
            import pyarrow.parquet as pq

            from documents_vector_search_spark.operators.bm25 import (
                term_bucket_py,
            )
            from documents_vector_search_spark.operators.fuzzy import (
                deletions_py,
            )

            terms = pq.read_table(local, columns=["term"])["term"].to_pylist()
            tbs = {term_bucket_py(t) for t in terms}
            vbs = {
                term_bucket_py(v)
                for t in terms
                for v in deletions_py(t, max_edits)
            }
            return sorted(tbs), sorted(vbs)
    except OSError:
        pass  # non-local path (object store) — distributed fallback
    buckets = (
        build_deletion_index(delta.select("term"), max_edits=max_edits)
        .select(
            term_bucket(F.col("term")).alias("tb"),
            term_bucket(F.col("variant")).alias("vb"),
        )
        .agg(
            F.collect_set("tb").alias("tbs"),
            F.collect_set("vb").alias("vbs"),
        )
        .collect()
    )
    tbs = sorted(buckets[0].tbs or []) if buckets else []
    vbs = sorted(buckets[0].vbs or []) if buckets else []
    return tbs, vbs


def _apply_vocab_delta_full(
    collection,
    delta: DataFrame,
    vocab: DataFrame,
    max_edits: int = DEFAULT_MAX_EDITS,
) -> None:
    """Legacy path for collections whose vocab predates the
    term_bucket layout: full-table merge + vocabulary-sized deletion
    index regeneration through staged whole-table swaps. ``refit-fuzzy``
    rebuilds into the partitioned layout."""
    import shutil

    spark = collection.spark
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
