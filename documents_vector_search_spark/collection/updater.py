"""Incremental update: delete-then-reinsert MERGE over Parquet tables.

Spark-first re-expression of the reference's update path
(main/core/documents_collection_creator.py:73-98,125-136,204-221):
for each re-read document, delete its old chunks from every index,
then re-add with fresh ids continuing the global counter
(lastIndexItemId, line 129). Delete-then-reinsert also makes the
watermark's 5-minute overlap window idempotent (SURVEY §7.4): a doc
re-sent unchanged is simply replaced by identical content.

Mechanics: anti-join each table on the changed document ids, union the
freshly built rows, and swap the table directory (write-to-tmp + rename
— Parquet can't be overwritten while being read; a Delta/Iceberg MERGE
is the drop-in upgrade on a real deployment).

Scale notes: the anti-join broadcasts the (small) changed-id set; only
the update batch is chunked/embedded — cost is O(batch), not O(corpus),
except for the table rewrite, which partition-pruned formats (or
Delta) reduce to touched partitions only.
"""

from __future__ import annotations

import shutil
from datetime import datetime
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.collection.catalog import Collection
from documents_vector_search_spark.collection.creator import (
    Embedder,
    build_chunks,
    default_embedder,
)
from documents_vector_search_spark.collection.manifest import Manifest
from documents_vector_search_spark.operators.bm25 import (
    build_doc_stats,
    build_postings,
)
from documents_vector_search_spark.operators.chunking import assign_chunk_ids


def _recover_orphans(collection: Collection, tables: list[str]) -> None:
    """Clean up leftovers of an interrupted previous update: restore a
    parked ``__old`` when the final directory is missing (crash between
    the two renames), then drop orphaned ``__tmp``/``__old`` dirs."""
    for table in tables:
        final = Path(collection.table_path(table))
        old = final.with_name(f"{table}__old")
        tmp = final.with_name(f"{table}__tmp")
        if not final.exists() and old.exists():
            old.rename(final)
        for orphan in (tmp, old):
            if orphan.exists():
                shutil.rmtree(orphan)


def _swap_all(
    collection: Collection,
    merged: dict[str, DataFrame],
    partition_cols: dict[str, list[str]] | None = None,
) -> None:
    """Two-phase table rewrite: FIRST materialize every merged table to a
    __tmp dir (all plans still read the intact originals — swapping any
    table earlier would make later lazy plans read post-swap data and
    corrupt the merge), THEN swap all directories.

    The swap is rename-based, not crash-atomic: single-writer only, and
    concurrent readers mid-swap may observe a missing directory (they
    recover via Collection.read's __old fallback on the next open; a
    Delta/Iceberg MERGE is the transactional upgrade on a real
    deployment). Interrupted runs are healed by _recover_orphans at the
    start of the next update or read.
    """
    for table, df in merged.items():
        writer = df.write.mode("overwrite")
        for col in (partition_cols or {}).get(table, []):
            writer = writer.partitionBy(col)
        writer.parquet(str(Path(collection.table_path(f"{table}__tmp"))))
    for table in merged:
        tmp = Path(collection.table_path(f"{table}__tmp"))
        final = Path(collection.table_path(table))
        old = final.with_name(f"{table}__old")
        if final.exists():
            final.rename(old)
        tmp.rename(final)
        if old.exists():
            shutil.rmtree(old)


def update_collection(
    collection: Collection,
    changed_docs: DataFrame,
    embedder: Embedder | None = None,
    embedding_dim: int | None = None,
    embedder_tag: str | None = None,
    title_col: str | None = None,
) -> Manifest:
    """Apply an update batch of canonical documents (changed + new).

    The batch must be embedded in the SAME vector space as the create:
    dim and embedder identity are validated against the manifest's
    ``converter.embedding`` record — a mismatch raises instead of
    silently mixing incompatible vectors into one index."""
    from documents_vector_search_spark.collection.catalog import TABLES

    _recover_orphans(collection, list(TABLES))
    manifest = collection.manifest()
    splitter = manifest.converter.get("splitter", {})
    chunk_size = splitter.get("chunkSize", 1000)
    chunk_overlap = splitter.get("chunkOverlap", 100)

    emb_cfg = manifest.converter.get("embedding") or {}
    recorded_dim = emb_cfg.get("dim")
    if (
        recorded_dim is not None
        and embedding_dim is not None
        and int(recorded_dim) != embedding_dim
    ):
        raise ValueError(
            f"embedding_dim={embedding_dim} does not match the "
            f"collection's recorded dim={recorded_dim}"
        )
    embedding_dim = (
        int(recorded_dim) if recorded_dim is not None else (embedding_dim or 16)
    )
    recorded_tag = emb_cfg.get("embedder")
    batch_tag = embedder_tag or ("hash" if embedder is None else "custom")
    if recorded_tag is not None and recorded_tag != batch_tag:
        raise ValueError(
            f"update embedder '{batch_tag}' does not match the collection's "
            f"recorded embedder '{recorded_tag}'; vectors from different "
            "embedders cannot share an index"
        )
    embed = embedder or default_embedder(embedding_dim)

    changed_ids = changed_docs.select(F.col("id")).distinct()

    # --- documents: replace changed, append new ---------------------------
    docs = collection.read("documents")
    merged_docs = docs.join(changed_ids, "id", "left_anti").unionByName(changed_docs)

    # --- stale chunk ids (for index deletes, U3) ---------------------------
    chunks = collection.read("chunks")
    stale_chunks = chunks.join(
        changed_ids, chunks["document_id"] == changed_ids["id"], "left_semi"
    ).select("chunk_id")

    # --- fresh chunks: ids per the collection's recorded strategy ---------
    # hash (default): deterministic on (document_id, chunk_number) — a
    # replaced document's chunks REUSE their ids, so the delete half of
    # delete-then-reinsert covers them and updates stay idempotent.
    # counter: reference parity — continue from lastIndexItemId
    # (documents_collection_creator.py:129); bounded update batch, so the
    # global window is fine here.
    built = build_chunks(changed_docs, chunk_size, chunk_overlap, title_col)
    if manifest.converter.get("idStrategy", "counter") == "hash":
        from documents_vector_search_spark.collection.creator import (
            _hash_chunk_ids,
        )

        fresh_chunks = _hash_chunk_ids(built)
    else:
        fresh_chunks = assign_chunk_ids(
            built,
            offset=manifest.lastIndexItemId + 1,
            id_col="document_id",
            chunk_number_col="chunk_number",
        )

    merged_chunks = (
        chunks.join(stale_chunks, "chunk_id", "left_anti").unionByName(fresh_chunks)
    )

    fresh_embeddings = fresh_chunks.select(
        "chunk_id",
        embed(F.col("indexed_data")).cast("array<float>").alias("vector"),
    )
    # ANN layout (create_collection(ann_planes=...)): fresh vectors get
    # their LSH bucket so the rewrite keeps the partitioned layout
    ann_cfg = manifest.converter.get("ann")
    if ann_cfg:
        from documents_vector_search_spark.operators.dedup import (
            hyperplane_bucket,
            random_hyperplanes,
        )

        planes = random_hyperplanes(
            embedding_dim, ann_cfg["nPlanes"], ann_cfg["seed"]
        )
        fresh_embeddings = fresh_embeddings.withColumn(
            "bucket",
            hyperplane_bucket(F.col("vector").cast("array<double>"), planes),
        )
    # IVF layout (create_collection(ivf_nlist=...)): assign fresh vectors
    # to their nearest manifest centroid — same rounded centroids the
    # create used, so assignment is bit-identical across updates
    ivf_cfg = manifest.converter.get("ivf")
    if ivf_cfg:
        from documents_vector_search_spark.operators.ivf import (
            assign_cluster_expr,
        )

        fresh_embeddings = fresh_embeddings.withColumn(
            "cluster_id",
            assign_cluster_expr(
                F.col("vector").cast("array<double>"), ivf_cfg["centroids"]
            ),
        )
        if ivf_cfg.get("pq"):
            # IVFPQ layout: re-encode fresh vectors with the manifest
            # codebooks so ADC search covers updates too
            from documents_vector_search_spark.operators.pq import (
                pq_encode_expr,
            )

            fresh_embeddings = fresh_embeddings.withColumn(
                "codes",
                pq_encode_expr(
                    F.col("vector").cast("array<double>"),
                    ivf_cfg["pq"]["codebooks"],
                ),
            )
    merged_embeddings = (
        collection.read("embeddings")
        .join(stale_chunks, "chunk_id", "left_anti")
        .unionByName(fresh_embeddings)
    )
    old_postings = collection.read("postings")
    fresh_postings = build_postings(
        fresh_chunks,
        id_col="chunk_id",
        text_col="indexed_data",
        with_dl="dl" in old_postings.columns,
    )
    postings_bucketed = "term_bucket" in old_postings.columns
    if postings_bucketed:
        from documents_vector_search_spark.operators.bm25 import term_bucket

        fresh_postings = fresh_postings.withColumn(
            "term_bucket", term_bucket(F.col("term"))
        )
    merged_postings = (
        old_postings
        .join(stale_chunks, "chunk_id", "left_anti")
        .unionByName(fresh_postings)
    )
    merged_doc_stats = (
        collection.read("doc_stats")
        .join(stale_chunks, "chunk_id", "left_anti")
        .unionByName(
            build_doc_stats(fresh_chunks, id_col="chunk_id", text_col="indexed_data")
        )
    )

    _swap_all(
        collection,
        {
            "documents": merged_docs,
            "chunks": merged_chunks,
            "embeddings": merged_embeddings,
            "postings": merged_postings,
            "doc_stats": merged_doc_stats,
        },
        partition_cols={
            **({"embeddings": ["bucket"]} if ann_cfg else {}),
            **({"embeddings": ["cluster_id"]} if ivf_cfg else {}),
            **({"postings": ["term_bucket"]} if postings_bucketed else {}),
        },
    )

    # --- manifest merge-update (documents_collection_creator.py:255-268) ---
    from documents_vector_search_spark.functions.text import tokenize

    new_docs = collection.read("documents")
    new_chunks = collection.read("chunks")
    stats = new_chunks.agg(
        F.count("*").alias("n"),
        F.max("chunk_id").alias("last"),
        F.avg(F.size(tokenize("indexed_data"))).alias("avgdl"),
    ).first()
    watermark = new_docs.agg(F.max("last_modified_at")).first()[0]
    manifest.numberOfDocuments = new_docs.count()
    manifest.numberOfChunks = stats["n"]
    manifest.avgChunkLength = (
        float(stats["avgdl"]) if stats["avgdl"] is not None else None
    )
    if manifest.converter.get("idStrategy", "counter") == "counter":
        manifest.lastIndexItemId = (
            int(stats["last"]) if stats["last"] is not None else -1
        )
    if watermark is not None:
        manifest.lastModifiedDocumentTime = (
            watermark.isoformat()
            if isinstance(watermark, datetime)
            else str(watermark)
        )
    collection.save_manifest(manifest)
    return manifest
