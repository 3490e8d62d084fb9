"""Incremental update: watermark rewrites + Structured Streaming driver.

Spark-first re-expression of the reference's update pipeline
(main/factories/update_collection_factory.py:22-95):

- watermark query rewrites (U1): from the manifest's
  ``lastModifiedDocumentTime`` minus a 5-minute overlap buffer
  (update_collection_factory.py:56), compose JQL
  ``(original) AND updated >= "YYYY/MM/DD HH:mm"`` and CQL
  ``(original) AND (created >= ... OR lastModified >= ...)``
  (lines 47-65), or a files mtime predicate (U2, lines 170-186).
- the merge itself is collection/updater.py (U3: delete-then-reinsert,
  idempotent under the overlap window).
- ``run_streaming_update``: the continuous form — a Structured
  Streaming file source over a canonical-documents drop directory,
  ``foreachBatch`` applying the same merge, ``Trigger.AvailableNow``
  for catch-up-then-stop semantics (the exact streaming analog of the
  reference's one-shot update CLI).

Scale: each micro-batch costs O(batch) for chunk/embed and one table
rewrite; checkpointing gives exactly-once per batch, and delete-then-
reinsert makes replays idempotent anyway.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame

from documents_vector_search_spark.collection.catalog import (
    DOCUMENT_SCHEMA,
    Collection,
)
from documents_vector_search_spark.collection.manifest import Manifest
from documents_vector_search_spark.collection.updater import update_collection

OVERLAP_MINUTES = 5


def watermark_start_time(manifest: Manifest) -> datetime | None:
    """Manifest watermark minus the 5-minute overlap buffer."""
    if not manifest.lastModifiedDocumentTime:
        return None
    ts = datetime.fromisoformat(manifest.lastModifiedDocumentTime)
    return ts - timedelta(minutes=OVERLAP_MINUTES)


def watermark_jql(original_jql: str, start: datetime) -> str:
    """JQL rewrite (update_collection_factory.py:47-53): minute
    precision, composed with AND."""
    stamp = start.strftime("%Y/%m/%d %H:%M")
    predicate = f'updated >= "{stamp}"'
    return f"({original_jql}) AND {predicate}" if original_jql else predicate


def watermark_cql(original_cql: str, start: datetime) -> str:
    """CQL rewrite (update_collection_factory.py:58-65): created OR
    lastModified, composed with AND."""
    stamp = start.strftime("%Y/%m/%d %H:%M")
    predicate = f'(created >= "{stamp}" OR lastModified >= "{stamp}")'
    return f"({original_cql}) AND {predicate}" if original_cql else predicate


def incremental_files_update(
    collection: Collection,
    base_path: str,
    **files_kwargs,
) -> Manifest:
    """One-shot incremental update from a files source (U2): rescan with
    ``modifiedAfter = watermark - overlap`` and merge."""
    from documents_vector_search_spark.sources.files import read_files_documents

    manifest = collection.manifest()
    start = watermark_start_time(manifest)
    changed = read_files_documents(
        collection.spark, base_path, modified_after=start, **files_kwargs
    )
    if changed.isEmpty():
        return manifest
    return update_collection(collection, changed)


def incremental_jira_update(
    collection: Collection,
    base_url: str,
    jql: str,
    transport=None,
    token: str | None = None,
) -> Manifest:
    """One-shot incremental update from Jira (U1): rewrite the original
    JQL with the watermark predicate, scan, merge."""
    from documents_vector_search_spark.sources.jira import read_jira_documents

    manifest = collection.manifest()
    start = watermark_start_time(manifest)
    query = watermark_jql(jql, start) if start else jql
    changed = read_jira_documents(
        collection.spark, base_url, query, transport=transport, token=token
    )
    if changed.isEmpty():
        return manifest
    return update_collection(collection, changed)


def incremental_confluence_update(
    collection: Collection,
    base_url: str,
    cql: str = "",
    transport=None,
    token: str | None = None,
) -> Manifest:
    """One-shot incremental update from Confluence (U1): watermark CQL
    rewrite, scan, merge."""
    from documents_vector_search_spark.sources.confluence import (
        read_confluence_documents,
    )

    manifest = collection.manifest()
    start = watermark_start_time(manifest)
    query = watermark_cql(cql, start) if start else cql
    changed = read_confluence_documents(
        collection.spark, base_url, query, transport=transport, token=token
    )
    if changed.isEmpty():
        return manifest
    return update_collection(collection, changed)


def incremental_dataset_update(
    collection: Collection,
    path: str,
    fmt: str = "jsonl",
    last_modified_col: str | None = None,
    **dataset_kwargs,
) -> Manifest:
    """One-shot incremental update from a record dataset
    (sources/datasets.py). With ``last_modified_col`` the re-read
    filters to records modified after ``watermark - overlap`` (pushed
    to the source scan where the format allows); without one there is
    no change signal, so the whole dataset re-merges — delete-then-
    reinsert keeps that idempotent, just O(dataset)."""
    from pyspark.sql import functions as F

    from documents_vector_search_spark.sources.datasets import (
        read_dataset_documents,
    )

    manifest = collection.manifest()
    changed = read_dataset_documents(
        collection.spark, path, fmt=fmt,
        last_modified_col=last_modified_col, **dataset_kwargs,
    )
    start = watermark_start_time(manifest)
    if last_modified_col and start is not None:
        changed = changed.filter(
            F.col("last_modified_at") >= F.lit(start)
        )
    if changed.isEmpty():
        return manifest
    return update_collection(collection, changed)


def run_streaming_update(
    collection: Collection,
    drop_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    fmt: str = "parquet",
    stream_transform=None,
    admission_gate=None,
):
    """Continuous incremental indexing: stream canonical-document files
    from ``drop_dir`` and MERGE each micro-batch into the collection.

    Returns the StreamingQuery (caller awaits termination). With
    ``available_now`` the stream processes everything present and stops
    — the reference's one-shot update, expressed as a stream; without
    it the collection follows the drop directory indefinitely.

    The two curation seams compose the intake pipeline without touching
    the merge itself:
    - ``stream_transform``: a streaming-DataFrame → streaming-DataFrame
      callable applied BEFORE the sink (e.g.
      ``streaming/curation.curate_stream`` — quality gate,
      decontamination, bounded-state exact dedup);
    - ``admission_gate``: an object with ``admit(batch_df) ->
      DataFrame`` applied to each micro-batch INSIDE foreachBatch
      (e.g. ``streaming/neardup.NearDupGate`` — near-dup admission
      against its persistent band store; per-batch state lives with
      the gate, not the stream).
    """
    spark = collection.spark
    stream = (
        spark.readStream.format(fmt)
        .schema(DOCUMENT_SCHEMA)
        .load(drop_dir)
    )
    if stream_transform is not None:
        stream = stream_transform(stream)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # newest version per document id wins within a batch
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("id").orderBy(
            F.col("last_modified_at").desc_nulls_last()
        )
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if admission_gate is not None:
            # decide → merge → record: foreachBatch is at-least-once,
            # so the gate must not remember a batch's signatures until
            # the merge has committed — recording first would make a
            # retried batch collide with its own bands and vanish
            latest = admission_gate.decide(latest)
            if latest.isEmpty():
                return
            update_collection(collection, latest)
            admission_gate.record()
            return
        update_collection(collection, latest)

    writer = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
