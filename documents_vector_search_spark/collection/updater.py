"""Incremental update: delete-then-reinsert MERGE over Parquet tables.

Spark-first re-expression of the reference's update path
(main/core/documents_collection_creator.py:73-98,125-136,204-221):
for each re-read document, delete its old chunks from every index,
then re-add with fresh ids continuing the global counter
(lastIndexItemId, line 129). Delete-then-reinsert also makes the
watermark's 5-minute overlap window idempotent (SURVEY §7.4): a doc
re-sent unchanged is simply replaced by identical content.

Two write strategies, chosen by the collection's manifest:

* **Partition-scoped** (collections created with ``update_buckets``,
  the default since round 4): every table is partitioned by a stable
  ``_pb`` bucket of its OWNING DOCUMENT's id
  (collection/partitioning.py) — one shared affected set, at most
  batch-doc-count buckets. The update reads ONLY those partitions
  (Parquet partition pruning), merges them with the fresh rows, writes
  them to a ``__tmp`` staging dir, and swaps just those partition
  directories. Cost: O(batch + batch_docs × corpus/update_buckets),
  not O(corpus). Manifest stats update incrementally from the batch.

* **Legacy full rewrite** (manifests without ``updateBuckets``):
  anti-join each whole table, rewrite everything, swap directories.

Neither swap is crash-ATOMIC (single-writer; a Delta/Iceberg MERGE is
the transactional upgrade on a real deployment), but both are crash
RECOVERABLE: the partition-scoped swap parks displaced directories in
``<table>__old`` under a ``_PARTIAL.json`` marker listing the affected
buckets, and recovery (updater start or Collection.read) rolls the
table back to its pre-update state. Since delete-then-reinsert is
idempotent, re-running the interrupted batch converges.
"""

from __future__ import annotations

import json
import shutil
from datetime import datetime
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.collection.catalog import (
    Collection,
    rollback_partial_swap,
)
from documents_vector_search_spark.collection.creator import (
    Embedder,
    build_chunks,
    default_embedder,
)
from documents_vector_search_spark.collection.manifest import Manifest
from documents_vector_search_spark.collection.partitioning import (
    UPDATE_PB_COL,
    pb_col,
    pb_dirs,
)
from documents_vector_search_spark.operators.bm25 import (
    build_doc_stats,
    build_field_postings,
    build_postings,
    field_text_exprs,
)
from documents_vector_search_spark.operators.chunking import assign_chunk_ids


def _recover_orphans(collection: Collection, tables: list[str]) -> None:
    """Clean up leftovers of an interrupted previous update: roll back a
    partial partition swap (``_PARTIAL.json`` marker), restore a parked
    whole-table ``__old`` when the final directory is missing (legacy
    swap crash), then drop orphaned ``__tmp``/``__old`` dirs."""
    for table in tables:
        rollback_partial_swap(collection.root, table)
        final = Path(collection.table_path(table))
        old = final.with_name(f"{table}__old")
        tmp = final.with_name(f"{table}__tmp")
        if not final.exists() and old.exists():
            old.rename(final)
        for orphan in (tmp, old):
            if orphan.exists():
                shutil.rmtree(orphan)


def _zorder_tables(manifest: Manifest) -> frozenset[str]:
    """Tables whose manifest records a Z-order layout."""
    zcfg = manifest.converter.get("zorder") or {}
    table = zcfg.get("table")
    return frozenset({table}) if table else frozenset()


def _record_zorder_degraded(
    collection: Collection, manifest: Manifest, pbs: list[int]
) -> None:
    """Record the update/delete-rewritten ``_pb`` buckets of the
    manifest's Z-order table as CLUSTERING-DEGRADED, and persist the
    manifest immediately (before the swap: over-recording after a
    crash costs one redundant re-cluster; under-recording would leave
    a degraded bucket invisible to OPTIMIZE forever).

    The staged merge write pre-clusters by partition values like every
    other table — ONE file per rewritten directory, the optimal
    between-compaction layout (guide §6: the earlier design sprayed
    one file per write-task×directory purely so the compactor's
    file-count heuristic would notice the bucket; that signal was
    unbounded on an update-heavy collection). compact_collection reads
    this list, re-clusters the buckets from the manifest's zorder
    record, and clears them."""
    zcfg = manifest.converter.get("zorder") or {}
    if not zcfg.get("table") or not pbs:
        return
    prev = set(zcfg.get("degraded_pbs") or [])
    new = prev | {int(pb) for pb in pbs}
    if new != prev:
        zcfg["degraded_pbs"] = sorted(new)
        manifest.converter["zorder"] = zcfg
        collection.save_manifest(manifest)


def _swap_all(
    collection: Collection,
    merged: dict[str, DataFrame],
    partition_cols: dict[str, list[str]] | None = None,
    no_cluster: frozenset[str] = frozenset(),
) -> None:
    """Legacy two-phase FULL table rewrite: FIRST materialize every
    merged table to a __tmp dir (all plans still read the intact
    originals — swapping any table earlier would make later lazy plans
    read post-swap data and corrupt the merge), THEN swap all
    directories. Used only for collections whose manifest predates
    ``updateBuckets``."""
    for table, df in merged.items():
        cols = (partition_cols or {}).get(table, [])
        if cols and table not in no_cluster:
            # cluster rows by partition values before the partitioned
            # write — same file-spray rationale as _swap_partitions
            df = df.repartition(*[F.col(c) for c in cols])
        writer = df.write.mode("overwrite")
        if cols:
            # one call with every level: DataFrameWriter.partitionBy
            # REPLACES the column list on each call, so a per-column
            # loop would silently keep only the last partition level
            writer = writer.partitionBy(*cols)
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


def _swap_partitions(
    collection: Collection,
    merged: dict[str, DataFrame],
    partition_cols: dict[str, list[str]],
    affected_pbs: dict[str, list[int]],
    swap_cols: dict[str, str] | None = None,
    no_cluster: frozenset[str] = frozenset(),
) -> None:
    """Two-phase PARTITION-scoped swap. Phase A stages every merged
    table (affected partitions only) under ``<table>__tmp`` while all
    plans still read the intact originals. Phase B, per table: park the
    live ``<col>=X`` directories in ``<table>__old`` (with a marker
    listing X values and the column, for rollback), then move the
    staged directories in. Phase C removes the parking dirs — the
    commit point. ``swap_cols`` names the partition column the swap
    keys on per table (default ``_pb``; the fuzzy artifacts swap on
    ``term_bucket`` / ``variant_bucket``).

    An affected bucket whose rows were ALL deleted has no staged dir;
    parking alone removes it, which is exactly the merge semantics.
    """
    # phase A: stage everything before touching any live directory.
    # The five table writes are independent batch-sized jobs — run them
    # as concurrent driver-thread actions (same fan-out pattern as the
    # creator) so job-scheduling overhead overlaps instead of summing.
    from concurrent.futures import ThreadPoolExecutor

    from documents_vector_search_spark.collection.creator import _StageTimer

    _timer = _StageTimer(f"swap:{collection.name}")

    def _stage(item) -> None:
        table, df = item
        with _timer.stage(f"stage_write:{table}"):
            cols = partition_cols[table]
            if cols and table not in no_cluster:
                # cluster the staged rows by their partition values
                # first: without it every write task sprays one file
                # into every (term_bucket, _pb) directory it holds rows
                # for — the creator measured the same partitioned write
                # at 2,047 files / 6.3s unclustered vs 64 files / 0.7s
                # clustered (write_fuzzy_artifacts docstring); with the
                # repartition each partition directory gets exactly the
                # tasks that own its hash, so file count ≈ directory
                # count and the commit protocol stays cheap
                df = df.repartition(*[F.col(c) for c in cols])
            writer = df.write.mode("overwrite")
            if cols:
                writer = writer.partitionBy(*cols)
            writer.parquet(
                str(Path(collection.table_path(f"{table}__tmp")))
            )

    with ThreadPoolExecutor(max_workers=len(merged)) as pool:
        list(pool.map(_stage, merged.items()))

    # phase B: park displaced partitions, move staged ones in
    for table in merged:
        live = Path(collection.table_path(table))
        tmp = Path(collection.table_path(f"{table}__tmp"))
        old = live.with_name(f"{table}__old")
        old.mkdir(parents=True, exist_ok=True)
        col = (swap_cols or {}).get(table, UPDATE_PB_COL)
        (old / "_PARTIAL.json").write_text(
            json.dumps({"pbs": affected_pbs[table], "col": col})
        )
        # one tree walk per root (not per bucket): at production bucket
        # counts a per-bucket rglob would rescan the whole layout tree
        # O(buckets) times
        wanted = set(affected_pbs[table])
        for src_root, dst_root in ((live, old), (tmp, live)):
            for d in pb_dirs(src_root, wanted, col):
                dest = dst_root / d.relative_to(src_root)
                dest.parent.mkdir(parents=True, exist_ok=True)
                d.rename(dest)

    # phase C: commit — drop parked state and staging dirs
    for table in merged:
        for suffix in ("__old", "__tmp"):
            p = Path(collection.table_path(f"{table}{suffix}"))
            if p.exists():
                shutil.rmtree(p)


def _materialize_fuzzy_delta(
    collection: Collection,
    manifest: Manifest,
    fresh_postings: DataFrame,
    stale_postings: DataFrame,
) -> str | None:
    """Pre-swap phase of fuzzy-artifact maintenance: aggregate the
    vocabulary delta from the changed postings rows only and WRITE it
    (post-swap lazy reads of the postings path would see merged data).
    Returns the delta path, or None when the collection carries no
    fuzzy artifacts. Crash between the main swap and the apply leaves
    the dictionary one batch stale — suggestions degrade gracefully,
    and `refit-fuzzy` rebuilds from postings."""
    from documents_vector_search_spark.collection.fuzzy_artifacts import (
        fuzzy_config,
        vocab_delta,
    )

    if not fuzzy_config(manifest):
        return None
    path = str(Path(collection.table_path("vocab_delta__tmp")))
    vocab_delta(fresh_postings, stale_postings).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _stage_fuzzy_delta(
    collection: Collection, manifest: Manifest, delta_path: str | None
) -> dict | None:
    """Staging half of the fuzzy append (fuzzy_artifacts.
    stage_vocab_delta): touches only ``__tmp`` dirs, so the updater
    runs it CONCURRENTLY with the partition swap."""
    if delta_path is None:
        return None
    from documents_vector_search_spark.collection.fuzzy_artifacts import (
        DEFAULT_MAX_EDITS,
        fuzzy_config,
        stage_vocab_delta,
    )

    cfg = fuzzy_config(manifest) or {}
    return stage_vocab_delta(
        collection,
        delta_path,
        max_edits=int(cfg.get("maxEdits", DEFAULT_MAX_EDITS)),
    )


_NOT_STAGED = object()  # "stage at publish time" marker (≠ None = empty)


def _apply_fuzzy_delta(
    collection: Collection,
    manifest: Manifest,
    delta_path: str | None,
    staged: dict | None | object = _NOT_STAGED,
) -> None:
    """Post-swap phase: publish the staged delta batch to the fuzzy
    delta logs (O(changed terms), base untouched), compacting when the
    log is long; remove the delta staging dir. Callers that did not
    pre-stage leave ``staged`` at the default and stage here (None is
    a real pre-staged result meaning the delta was empty)."""
    if delta_path is None:
        return
    from documents_vector_search_spark.collection.fuzzy_artifacts import (
        DEFAULT_COMPACT_AFTER,
        DEFAULT_MAX_EDITS,
        fuzzy_config,
        publish_vocab_delta,
        stage_vocab_delta,
    )

    cfg = fuzzy_config(manifest) or {}
    max_edits = int(cfg.get("maxEdits", DEFAULT_MAX_EDITS))
    if staged is _NOT_STAGED:
        staged = stage_vocab_delta(collection, delta_path, max_edits)
    publish_vocab_delta(
        collection,
        staged,
        delta_path,
        max_edits=max_edits,
        compact_after=int(cfg.get("compactAfter", DEFAULT_COMPACT_AFTER)),
    )
    shutil.rmtree(delta_path, ignore_errors=True)


def _apply_chunk_delta(
    manifest: Manifest,
    n_stale: int,
    stale_dl: float,
    n_fresh: int = 0,
    fresh_dl: float = 0.0,
) -> None:
    """Incremental manifest chunk stats, shared by update (−stale
    +fresh) and delete (−stale): count and avgdl adjust from the total
    document length rather than a corpus recount."""
    old_n = manifest.numberOfChunks
    old_total = (
        (manifest.avgChunkLength or 0.0) * old_n
        if manifest.avgChunkLength is not None
        else None
    )
    new_n = old_n - n_stale + n_fresh
    manifest.numberOfChunks = max(0, new_n)
    if old_total is not None and new_n > 0:
        manifest.avgChunkLength = (
            max(old_total - float(stale_dl) + float(fresh_dl), 0.0) / new_n
        )
    elif new_n <= 0:
        manifest.avgChunkLength = None


def _field_stats_from_table(collection: Collection) -> dict:
    """Exact manifest fieldStats recomputed from the field_postings
    table (fl repeats per term row, so distinct per (doc, field)
    first). Convergence backstop for the legacy rewrite path and
    _exact_recount."""
    rows = (
        collection.read("field_postings")
        .select("document_id", "field", "fl")
        .distinct()
        .groupBy("field")
        .agg(F.count("*").alias("n"), F.sum("fl").alias("s"))
        .collect()
    )
    stats: dict = {name: {"docs": 0, "sumFl": 0} for name in ("title", "body")}
    for r in rows:
        stats[r["field"]] = {"docs": int(r["n"]), "sumFl": int(r["s"])}
    return stats


def _apply_field_delta(manifest: Manifest, field_delta: dict) -> None:
    """Incremental manifest fieldStats (BM25F avgfl numerators and
    denominators), shared by update (−stale +fresh) and delete
    (−stale): ``field_delta`` maps side → Row with ``_fn_<field>`` /
    ``_fs_<field>`` aggregates per field."""
    if manifest.fieldStats is None:
        return
    stale = field_delta.get("stale")
    fresh = field_delta.get("fresh")
    for name, rec in manifest.fieldStats.items():
        dn = ds = 0
        if stale is not None:
            dn -= int(stale[f"_fn_{name}"] or 0)
            ds -= int(stale[f"_fs_{name}"] or 0)
        if fresh is not None:
            dn += int(fresh[f"_fn_{name}"] or 0)
            ds += int(fresh[f"_fs_{name}"] or 0)
        rec["docs"] = max(0, int(rec["docs"]) + dn)
        rec["sumFl"] = max(0, int(rec["sumFl"]) + ds)


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

    # fuzzy artifacts recover through the same orphan sweep: an
    # interrupted vocab/deletion_index staged swap rolls back to the
    # parked ``__old`` (see _apply_fuzzy_delta)
    from documents_vector_search_spark.collection.creator import _StageTimer

    _timer = _StageTimer(f"update:{collection.name}")
    with _timer.stage("recover_orphans"):
        _recover_orphans(
            collection,
            list(TABLES)
            + [
                "vocab",
                "deletion_index",
                "vocab_deltas",
                "deletion_index_deltas",
            ],
        )
    manifest = collection.manifest()
    splitter = manifest.converter.get("splitter", {})
    chunk_size = splitter.get("chunkSize", 1000)
    chunk_overlap = splitter.get("chunkOverlap", 100)
    # chunk-0 topology recorded at create: changed docs must re-chunk
    # the same way (title line from text vs title_col/id); the recorded
    # titleCol backstops callers that don't re-pass it
    title_from_text = bool(manifest.converter.get("titleFromText"))
    title_col = title_col or manifest.converter.get("titleCol")

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
    update_buckets = manifest.converter.get("updateBuckets")

    # --- pruned vs full reads --------------------------------------------
    # Partition-scoped path: documents and chunks are partitioned by
    # pb(document id), so every read below prunes to the changed docs'
    # buckets — O(corpus/update_buckets) per touched table, not
    # O(corpus). The bucket list is tiny (≤ update_buckets ints).
    # ONE batch-sized job yields the bucket set AND the manifest's
    # batch stats (count, watermark) — driver-action count, not data,
    # dominates a small update, so scalar probes are fused throughout.
    doc_pbs: list[int] = []
    n_batch = 0
    batch_watermark = None
    if update_buckets:
        with _timer.stage("batch_stats"):
            batch_row = changed_docs.agg(
                F.collect_set(
                    pb_col(F.col("id"), update_buckets)
                ).alias("pbs"),
                F.count("*").alias("n"),
                F.max("last_modified_at").alias("wm"),
            ).first()
        doc_pbs = sorted(batch_row["pbs"])
        n_batch = int(batch_row["n"])
        batch_watermark = batch_row["wm"]

    def _pruned(table: str, pbs: list[int]) -> DataFrame:
        df = collection.read(table)
        if update_buckets:
            df = df.filter(F.col(UPDATE_PB_COL).isin(pbs))
        elif UPDATE_PB_COL in df.columns:
            # manifest predates updateBuckets but the table carries a
            # _pb level (e.g. manifest hand-edited/restored): the legacy
            # full rewrite drops the bucketing rather than guessing a
            # bucket count that may not match the directories
            df = df.drop(UPDATE_PB_COL)
        return df

    # --- documents: replace changed, append new ---------------------------
    docs = _pruned("documents", doc_pbs)
    fresh_docs = changed_docs
    if update_buckets:
        fresh_docs = fresh_docs.withColumn(
            UPDATE_PB_COL, pb_col(F.col("id"), update_buckets)
        )
    merged_docs = docs.join(changed_ids, "id", "left_anti").unionByName(fresh_docs)

    # --- stale chunk ids (for index deletes, U3) ---------------------------
    # localCheckpoint: this tiny id list feeds SIX downstream plans
    # (four anti-joins, the bucket-set collect, the stale-stats
    # semi-join) — materialized once, every consumer broadcasts rows
    # instead of re-running the pruned read + semi-join.
    chunks = _pruned("chunks", doc_pbs)
    with _timer.stage("stale_chunk_ids"):
        stale_chunks = (
            chunks.join(
                changed_ids,
                chunks["document_id"] == changed_ids["id"],
                "left_semi",
            )
            .select("chunk_id")
            .localCheckpoint()
        )

    # --- fresh chunks: ids per the collection's recorded strategy ---------
    # hash (default): deterministic on (document_id, chunk_number) — a
    # replaced document's chunks REUSE their ids, so the delete half of
    # delete-then-reinsert covers them and updates stay idempotent.
    # counter: reference parity — continue from lastIndexItemId
    # (documents_collection_creator.py:129); bounded update batch, so the
    # global window is fine here.
    built = build_chunks(
        changed_docs, chunk_size, chunk_overlap, title_col, title_from_text
    )
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
    if update_buckets:
        fresh_chunks = fresh_chunks.withColumn(
            UPDATE_PB_COL, pb_col(F.col("document_id"), update_buckets)
        )
    # Materialize the freshly built chunks ONCE: every index table, the
    # bucket-set collect, and the incremental stats all read this frame
    # — without the checkpoint each of those ~8 driver actions re-runs
    # the chunking lineage, and job-count overhead (not data) dominates
    # the update. Batch-sized, so the materialization is trivially small.
    with _timer.stage("fresh_chunks_build"):
        fresh_chunks = fresh_chunks.localCheckpoint()

    merged_chunks = (
        chunks.join(stale_chunks, "chunk_id", "left_anti").unionByName(fresh_chunks)
    )

    # --- incremental manifest stats (O(batch)), fused into two jobs ---
    # EVERY table buckets by the owning document's id (partitioning.py),
    # so the batch's doc_pbs IS the affected set for all five tables —
    # no per-table bucket collection needed.
    stale_stats = fresh_stats = None
    if update_buckets:
        from documents_vector_search_spark.functions.text import tokenize

        # ONE job for both sides: tag the stale and fresh chunk rows and
        # aggregate per side (both inputs are materialized checkpoints,
        # so the union costs nothing beyond the rows themselves).
        # n_docs rides along: every document this engine writes has at
        # least its title chunk (creator.build_chunks chunk 0), so the
        # distinct owning docs of the stale chunks ARE the replaced docs.
        cols = ["chunk_id", "document_id", "indexed_data"]
        tagged = (
            chunks.join(stale_chunks, "chunk_id", "left_semi")
            .select(F.lit("stale").alias("_side"), *cols)
            .unionByName(
                fresh_chunks.select(F.lit("fresh").alias("_side"), *cols)
            )
        )
        with _timer.stage("chunk_side_stats"):
            side_rows = {
                r["_side"]: r
                for r in tagged.groupBy("_side")
                .agg(
                    F.count("*").alias("n"),
                    F.max("chunk_id").alias("last"),
                    F.sum(F.size(tokenize("indexed_data"))).alias("dl"),
                    F.countDistinct("document_id").alias("n_docs"),
                )
                .collect()
            }
        empty = {"n": 0, "last": None, "dl": 0, "n_docs": 0}
        stale_stats = side_rows.get("stale", empty)
        fresh_stats = side_rows.get("fresh", empty)

    fresh_embeddings = fresh_chunks.select(
        "chunk_id",
        embed(F.col("indexed_data")).cast("array<float>").alias("vector"),
        # owning doc's bucket, ridden from fresh_chunks (partitioning.py)
        *([F.col(UPDATE_PB_COL)] if update_buckets else []),
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
            assign_cluster_auto,
        )

        fresh_embeddings = fresh_embeddings.withColumn(
            "cluster_id",
            assign_cluster_auto(
                F.col("vector").cast("array<double>"), ivf_cfg["centroids"]
            ),
        )
        if ivf_cfg.get("pq"):
            # IVFPQ layout: re-encode fresh vectors with the manifest
            # codebooks so ADC search covers updates too
            from documents_vector_search_spark.operators.pq import (
                pq_encode_auto,
            )

            fresh_embeddings = fresh_embeddings.withColumn(
                "codes",
                pq_encode_auto(
                    F.col("vector").cast("array<double>"),
                    ivf_cfg["pq"]["codebooks"],
                ),
            )
    # SQ8 layout (create_collection(sq8=True)): re-encode fresh vectors
    # with the manifest's FITTED bounds — never refit mid-update (codes
    # across the corpus must share one scale; out-of-range values clamp)
    sq_cfg = manifest.converter.get("sq8")
    if sq_cfg:
        from documents_vector_search_spark.operators.sq import (
            sq_encode_auto,
        )

        fresh_embeddings = fresh_embeddings.withColumn(
            "codes",
            sq_encode_auto(
                F.col("vector").cast("array<double>"),
                sq_cfg["mins"],
                sq_cfg["maxs"],
            ),
        )
    merged_embeddings = (
        _pruned("embeddings", doc_pbs)
        .join(stale_chunks, "chunk_id", "left_anti")
        .unionByName(fresh_embeddings)
    )

    carry = [UPDATE_PB_COL] if update_buckets else []
    old_postings = _pruned("postings", doc_pbs)
    fresh_postings = build_postings(
        fresh_chunks,
        id_col="chunk_id",
        text_col="indexed_data",
        with_dl="dl" in old_postings.columns,
        carry_cols=carry,
        # schema-sniffed like dl: a positional collection stays
        # positional through incremental merges
        with_positions="positions" in old_postings.columns,
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

    fresh_doc_stats = build_doc_stats(
        fresh_chunks, id_col="chunk_id", text_col="indexed_data",
        carry_cols=carry,
    )
    merged_doc_stats = (
        _pruned("doc_stats", doc_pbs)
        .join(stale_chunks, "chunk_id", "left_anti")
        .unionByName(fresh_doc_stats)
    )

    # --- field_postings: document-level BM25F index (doc-keyed merge) --
    # replaced docs drop by anti-join on document_id; fresh rows rebuild
    # from the batch's TEXT with the collection's recorded field split
    # (exact under any chunk_overlap — build_field_postings docstring).
    # Collections created before the table existed skip it (BM25F then
    # serves the chunk-derived approximation).
    has_fp = (collection.root / "field_postings").exists()
    merged_fp = None
    fp_bucketed = False
    field_delta = None
    field_delta_df = None
    if has_fp:
        from documents_vector_search_spark.operators.bm25 import term_bucket

        old_fp = _pruned("field_postings", doc_pbs)
        fresh_fp = build_field_postings(
            changed_docs, title_col, title_from_text
        )
        if update_buckets:
            fresh_fp = fresh_fp.withColumn(
                UPDATE_PB_COL, pb_col(F.col("document_id"), update_buckets)
            )
        fp_bucketed = "term_bucket" in old_fp.columns
        if fp_bucketed:
            fresh_fp = fresh_fp.withColumn(
                "term_bucket", term_bucket(F.col("term"))
            )
        merged_fp = old_fp.join(
            changed_ids, old_fp["document_id"] == changed_ids["id"],
            "left_anti",
        ).unionByName(fresh_fp)

        # manifest fieldStats delta (BM25F avgfl): per-field non-empty
        # doc counts and length sums for the replaced docs (pruned +
        # semi-join, bounded) and the fresh batch — ONE fused job, the
        # same stale/fresh tagging as the chunk stats above. Must run
        # BEFORE the swap (it reads the pre-swap documents table).
        if update_buckets and manifest.fieldStats is not None:
            from documents_vector_search_spark.functions.text import tokenize

            field_aggs = []
            for name, col in field_text_exprs(
                title_col, title_from_text
            ).items():
                fl = F.size(tokenize(col))
                field_aggs.append(
                    F.count(F.when(fl > 0, True)).alias(f"_fn_{name}")
                )
                field_aggs.append(
                    F.coalesce(F.sum(F.when(fl > 0, fl)), F.lit(0)).alias(
                        f"_fs_{name}"
                    )
                )
            doc_cols = changed_docs.columns
            tagged_docs = (
                docs.join(changed_ids, "id", "left_semi")
                .select(F.lit("stale").alias("_side"), *doc_cols)
                .unionByName(
                    changed_docs.select(
                        F.lit("fresh").alias("_side"), *doc_cols
                    )
                )
            )
            field_delta_df = tagged_docs.groupBy("_side").agg(*field_aggs)

    # fuzzy artifacts (collection/fuzzy_artifacts.py): aggregate the
    # vocabulary DELTA from exactly the postings rows this batch
    # touches and MATERIALIZE it before any swap (post-swap lazy reads
    # of the postings path would see merged data and double-count).
    # The fieldStats delta collect is an independent pre-swap read, so
    # the two driver actions run as concurrent jobs instead of summing.
    from concurrent.futures import ThreadPoolExecutor

    def _fuzzy() -> str | None:
        return _materialize_fuzzy_delta(
            collection,
            manifest,
            fresh_postings,
            old_postings.join(stale_chunks, "chunk_id", "left_semi"),
        )

    with ThreadPoolExecutor(max_workers=2) as _pool:
        with _timer.stage("fuzzy_and_field_deltas"):
            f_fuzzy = _pool.submit(_fuzzy)
            f_field = (
                _pool.submit(field_delta_df.collect)
                if field_delta_df is not None
                else None
            )
            fuzzy_delta_path = f_fuzzy.result()
            if f_field is not None:
                field_delta = {r["_side"]: r for r in f_field.result()}

    merged = {
        "documents": merged_docs,
        "chunks": merged_chunks,
        "embeddings": merged_embeddings,
        "postings": merged_postings,
        "doc_stats": merged_doc_stats,
        **({"field_postings": merged_fp} if merged_fp is not None else {}),
    }
    layout_cols = {
        "documents": [],
        "chunks": [],
        "embeddings": (
            ["bucket"] if ann_cfg else (["cluster_id"] if ivf_cfg else [])
        ),
        "postings": ["term_bucket"] if postings_bucketed else [],
        "doc_stats": [],
        **(
            {"field_postings": ["term_bucket"] if fp_bucketed else []}
            if merged_fp is not None
            else {}
        ),
    }

    if update_buckets:
        # replaced-doc count was fused into the stale-stats job above
        n_replaced = int(stale_stats["n_docs"] or 0)

        # every table buckets by owning-document id → ONE affected set.
        # The fuzzy delta's two batch-dir stagings touch only __tmp
        # dirs (stage_vocab_delta contract), so they run CONCURRENTLY
        # with the swap — only the publish renames wait for the commit.
        with _timer.stage("partition_swap"):
            with ThreadPoolExecutor(max_workers=1) as _sp:
                f_fuzzy_staged = _sp.submit(
                    _stage_fuzzy_delta, collection, manifest, fuzzy_delta_path
                )
                _record_zorder_degraded(collection, manifest, doc_pbs)
                _swap_partitions(
                    collection,
                    merged,
                    partition_cols={
                        t: cols + [UPDATE_PB_COL]
                        for t, cols in layout_cols.items()
                    },
                    affected_pbs={t: doc_pbs for t in merged},
                )
                fuzzy_staged = f_fuzzy_staged.result()

        manifest.numberOfDocuments = (
            manifest.numberOfDocuments - n_replaced + n_batch
        )
        _apply_chunk_delta(
            manifest,
            n_stale=int(stale_stats["n"] or 0),
            stale_dl=float(stale_stats["dl"] or 0),
            n_fresh=int(fresh_stats["n"] or 0),
            fresh_dl=float(fresh_stats["dl"] or 0),
        )
        if field_delta is not None:
            _apply_field_delta(manifest, field_delta)
        if manifest.converter.get("idStrategy", "counter") == "counter":
            last = fresh_stats["last"]
            if last is not None:
                manifest.lastIndexItemId = max(
                    manifest.lastIndexItemId, int(last)
                )
        if batch_watermark is not None:
            new_wm = (
                batch_watermark.isoformat()
                if isinstance(batch_watermark, datetime)
                else str(batch_watermark)
            )
            if (
                manifest.lastModifiedDocumentTime is None
                or new_wm > manifest.lastModifiedDocumentTime
            ):
                manifest.lastModifiedDocumentTime = new_wm
        with _timer.stage("fuzzy_delta_publish"):
            _apply_fuzzy_delta(
                collection, manifest, fuzzy_delta_path, staged=fuzzy_staged
            )
        collection.save_manifest(manifest)
        return manifest

    # --- legacy full-rewrite path (manifests without updateBuckets) -------
    _swap_all(
        collection,
        merged,
        partition_cols={t: cols for t, cols in layout_cols.items() if cols},
    )
    _apply_fuzzy_delta(collection, manifest, fuzzy_delta_path)

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
    if has_fp:
        manifest.fieldStats = _field_stats_from_table(collection)
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


def delete_documents(
    collection: Collection,
    doc_ids,
) -> Manifest:
    """Remove documents — and every derived chunk/embedding/posting/
    stat row — from the collection: the right-to-be-forgotten
    operation a training-data deployment must be able to run on
    demand (the reference can only upsert; documents deleted at the
    source linger in its indexes forever).

    ``doc_ids`` is a DataFrame with an ``id`` column, or any iterable
    of id strings. Unknown ids are no-ops. Same machinery and same
    cost model as :func:`update_collection`: reads prune to the ids'
    ``_pb`` buckets, every table drops rows by anti-join, and only the
    affected partition directories swap (crash-recoverable) —
    O(affected buckets), not O(corpus). The watermark is untouched
    (deletion is not a document modification).

    Crash convergence: unlike an update, a delete has no reinsert leg,
    so a re-run must be able to FINISH a partially-committed delete.
    Two invariants guarantee that: (a) tables swap derived-first
    (embeddings/postings/doc_stats, then chunks, then documents), so
    the evidence needed to re-derive the stale set survives until
    everything downstream of it is committed; (b) the proceed/no-op
    decision is based on the DOCUMENTS table — the last to commit —
    so any interrupted run re-enters. If a re-run detects a partial
    state (documents still present but their chunks already gone) the
    manifest counts recompute exactly from the tables instead of
    applying incremental arithmetic twice.
    """
    from documents_vector_search_spark.collection.catalog import TABLES

    spark = collection.spark
    # fuzzy artifacts recover through the same orphan sweep: an
    # interrupted vocab/deletion_index staged swap rolls back to the
    # parked ``__old`` (see _apply_fuzzy_delta)
    _recover_orphans(
        collection,
        list(TABLES)
        + ["vocab", "deletion_index", "vocab_deltas", "deletion_index_deltas"],
    )
    manifest = collection.manifest()

    if isinstance(doc_ids, DataFrame):
        ids = doc_ids.select(F.col("id").cast("string").alias("id"))
    else:
        ids = spark.createDataFrame(
            [(str(i),) for i in doc_ids], "id string"
        )
    ids = ids.distinct().localCheckpoint()

    update_buckets = manifest.converter.get("updateBuckets")
    doc_pbs: list[int] = []
    if update_buckets:
        row = ids.agg(
            F.collect_set(pb_col(F.col("id"), update_buckets)).alias("pbs")
        ).first()
        doc_pbs = sorted(row["pbs"])
        if not doc_pbs:
            return manifest  # empty id set: nothing to do

    def _pruned(table: str) -> DataFrame:
        df = collection.read(table)
        if update_buckets:
            df = df.filter(F.col(UPDATE_PB_COL).isin(doc_pbs))
        elif UPDATE_PB_COL in df.columns:
            df = df.drop(UPDATE_PB_COL)
        return df

    docs = _pruned("documents")
    chunks = _pruned("chunks")
    stale_chunks = (
        chunks.join(ids, chunks["document_id"] == ids["id"], "left_semi")
        .select("chunk_id")
        .localCheckpoint()
    )

    from documents_vector_search_spark.functions.text import tokenize

    # chunk-side stats feed the incremental manifest arithmetic
    stale_row = (
        chunks.join(stale_chunks, "chunk_id", "left_semi")
        .agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.size(tokenize("indexed_data"))), F.lit(0)
            ).alias("dl"),
        )
        .first()
    )
    n_stale = int(stale_row["n"])
    # the proceed/no-op decision reads the DOCUMENTS table — it commits
    # LAST, so a crashed earlier run always re-enters here (chunk-based
    # evidence may already be gone in a partial state). fieldStats
    # decrements (BM25F avgfl) fuse into the same job: the deleted
    # docs' per-field non-empty counts and length sums.
    has_fp = (collection.root / "field_postings").exists()
    field_aggs = []
    if has_fp and manifest.fieldStats is not None:
        from documents_vector_search_spark.functions.text import tokenize

        title_from_text = bool(manifest.converter.get("titleFromText"))
        title_col = manifest.converter.get("titleCol")
        for name, col in field_text_exprs(title_col, title_from_text).items():
            fl = F.size(tokenize(col))
            field_aggs.append(
                F.count(F.when(fl > 0, True)).alias(f"_fn_{name}")
            )
            field_aggs.append(
                F.coalesce(F.sum(F.when(fl > 0, fl)), F.lit(0)).alias(
                    f"_fs_{name}"
                )
            )
    del_row = (
        docs.join(ids, "id", "left_semi")
        .agg(F.count("*").alias("n"), *field_aggs)
        .first()
    )
    n_docs_deleted = int(del_row["n"])
    if n_docs_deleted == 0 and n_stale == 0:
        # Unknown ids / fully-completed prior delete — but a prior run
        # may have died AFTER the final documents swap committed and
        # BEFORE save_manifest, in which case the stored counts are
        # permanently stale (avgChunkLength feeds BM25 scoring). Before
        # trusting the no-op, validate the manifest against a cheap
        # column-pruned full count. numberOfDocuments alone suffices:
        # documents commits LAST in the swap order, so every other
        # partial state still shows n_docs_deleted > 0 and takes the
        # partial-recovery recount above this check.
        if (
            collection.read("documents").count()
            == manifest.numberOfDocuments
        ):
            return manifest
        return _exact_recount(collection, manifest)
    # documents present but their chunks already deleted = a prior run
    # crashed between the chunks and documents swaps — finish the job,
    # but recompute manifest counts exactly (the incremental arithmetic
    # was never applied and the stale stats can no longer see the rows)
    partial_recovery = n_docs_deleted > 0 and n_stale == 0

    fuzzy_delta_path = _materialize_fuzzy_delta(
        collection,
        manifest,
        _pruned("postings").limit(0),  # deletes have no fresh leg
        _pruned("postings").join(stale_chunks, "chunk_id", "left_semi"),
    )

    # swap ORDER is the crash-convergence contract: derived tables
    # first, then chunks, documents last (dict order drives the swap)
    merged = {
        "embeddings": _pruned("embeddings").join(
            stale_chunks, "chunk_id", "left_anti"
        ),
        "postings": _pruned("postings").join(
            stale_chunks, "chunk_id", "left_anti"
        ),
        "doc_stats": _pruned("doc_stats").join(
            stale_chunks, "chunk_id", "left_anti"
        ),
        **(
            {
                "field_postings": _pruned("field_postings").join(
                    ids,
                    F.col("document_id") == ids["id"],
                    "left_anti",
                )
            }
            if has_fp
            else {}
        ),
        "chunks": chunks.join(
            ids, chunks["document_id"] == ids["id"], "left_anti"
        ),
        "documents": docs.join(ids, "id", "left_anti"),
    }
    # layout partition levels survive the anti-join as ordinary columns
    emb_cols = merged["embeddings"].columns
    layout_cols = {
        "documents": [],
        "chunks": [],
        "embeddings": [
            c for c in ("bucket", "cluster_id") if c in emb_cols
        ],
        "postings": (
            ["term_bucket"] if "term_bucket" in merged["postings"].columns else []
        ),
        "doc_stats": [],
        **(
            {
                "field_postings": (
                    ["term_bucket"]
                    if "term_bucket" in merged["field_postings"].columns
                    else []
                )
            }
            if has_fp
            else {}
        ),
    }

    if update_buckets:
        # fuzzy staging overlaps the swap, same as update_collection
        # (stage_vocab_delta touches only __tmp dirs)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as _sp:
            f_fuzzy_staged = _sp.submit(
                _stage_fuzzy_delta, collection, manifest, fuzzy_delta_path
            )
            _record_zorder_degraded(collection, manifest, doc_pbs)
            _swap_partitions(
                collection,
                merged,
                partition_cols={
                    t: cols + [UPDATE_PB_COL]
                    for t, cols in layout_cols.items()
                },
                affected_pbs={t: doc_pbs for t in merged},
            )
            fuzzy_staged = f_fuzzy_staged.result()
        if not partial_recovery:
            manifest.numberOfDocuments = max(
                0, manifest.numberOfDocuments - n_docs_deleted
            )
            _apply_chunk_delta(
                manifest, n_stale=n_stale, stale_dl=float(stale_row["dl"])
            )
            if field_aggs:
                _apply_field_delta(manifest, {"stale": del_row})
            _apply_fuzzy_delta(
                collection, manifest, fuzzy_delta_path, staged=fuzzy_staged
            )
            collection.save_manifest(manifest)
            return manifest
        # partial-recovery re-run falls through to the exact recount
        _apply_fuzzy_delta(
            collection, manifest, fuzzy_delta_path, staged=fuzzy_staged
        )
        return _exact_recount(collection, manifest)

    _swap_all(
        collection,
        merged,
        partition_cols={
            t: cols for t, cols in layout_cols.items() if cols
        },
    )
    # legacy path: exact recount
    _apply_fuzzy_delta(collection, manifest, fuzzy_delta_path)
    return _exact_recount(collection, manifest)


def _exact_recount(collection, manifest: Manifest) -> Manifest:
    """Recompute manifest counts from the stored tables and persist.

    Convergence backstop for delete_documents: used on partial-recovery
    re-runs AND when the no-op path detects a manifest whose
    numberOfDocuments disagrees with the documents table (a prior run
    crashed between the final swap and save_manifest)."""
    from documents_vector_search_spark.functions.text import tokenize

    stats = collection.read("chunks").agg(
        F.count("*").alias("n"),
        F.avg(F.size(tokenize("indexed_data"))).alias("avgdl"),
    ).first()
    manifest.numberOfDocuments = collection.read("documents").count()
    manifest.numberOfChunks = stats["n"]
    manifest.avgChunkLength = (
        float(stats["avgdl"]) if stats["avgdl"] is not None else None
    )
    if (collection.root / "field_postings").exists():
        manifest.fieldStats = _field_stats_from_table(collection)
    collection.save_manifest(manifest)
    return manifest
