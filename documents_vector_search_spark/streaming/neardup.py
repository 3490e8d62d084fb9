"""Streaming NEAR-dup admission gate — MinHash-LSH against a signature
store, the fuzzy twin of streaming/dedup.py's exact gate.

Exact streaming dedup (content hash within a watermark) misses the
dominant real-world duplicate class: boilerplate re-crawls and
lightly-edited reposts. This gate drops an arriving document when its
MinHash band signature collides with anything ALREADY ADMITTED —
across all past batches, not just a watermark horizon — by keeping the
admitted band signatures in a parquet store and joining each
micro-batch against it.

Semantics (documented trade, the production-stream standard):
- Decision is LSH COLLISION, not verified Jaccard: state holds only
  ``(band_index, band_value)`` — 8-byte-ish rows — never shingle sets,
  so the store stays ~bands rows per admitted doc. Precision/recall
  tune via (num_hashes, bands) exactly as in the batch operator; the
  counted, Jaccard-verified report remains the batch job
  (operators/dedup.py), and a nightly batch sweep reconciles exactly.
- First-wins WITHIN a batch too: a doc is dropped if any of its bands
  matches a smaller-id doc in the same batch (chained near-dups all
  drop — they each collide with the admitted head or a dropped
  intermediate, either way their content matched something seen).

Scale shape per micro-batch: band rows are map-only over the batch;
the store probe is one join keyed on (band_index, band_value) — batch
side tiny, store side a 2-column columnar scan (no shingles, no text);
the in-batch first-wins is one window over the batch's own band rows.
Admission appends ``bands`` rows per admitted doc (append-mode parquet,
no rewrite). Used inside ``foreachBatch`` beside the collection update
(streaming/incremental.py), the gate's decision-then-append runs
through an eager localCheckpoint so the store append never races the
probe that read it.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.dedup import minhash_band_rows


class NearDupGate:
    """foreachBatch near-dup admission against a persistent band store.

    ``admit(batch_docs)`` returns the admitted subset of the batch and
    appends their band signatures to ``store_path``. Deterministic:
    same batches in the same order admit the same documents on any
    engine/partitioning (in-batch precedence is by ascending id).
    """

    def __init__(
        self,
        store_path: str,
        num_hashes: int = 8,
        bands: int = 4,
        shingle_words: int = 3,
        id_col: str = "id",
        text_col: str = "text",
    ):
        self.store_path = store_path
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_words = shingle_words
        self.id_col = id_col
        self.text_col = text_col

    def _band_rows(self, docs: DataFrame) -> DataFrame:
        return minhash_band_rows(
            docs,
            num_hashes=self.num_hashes,
            bands=self.bands,
            shingle_words=self.shingle_words,
            id_col=self.id_col,
            text_col=self.text_col,
        )

    def _recover(self) -> None:
        """Roll forward an interrupted :meth:`compact_store`: if the
        live store vanished mid-swap, the parked ``__old`` dir is the
        intact previous state — restore it."""
        import shutil

        live = Path(self.store_path)
        old = live.with_name(live.name + "__old")
        tmp = live.with_name(live.name + "__tmp")
        if not live.exists() and old.exists():
            old.rename(live)
        for orphan in (tmp, old):
            if orphan.exists():
                shutil.rmtree(orphan)

    def compact_store(self, spark) -> dict:
        """Rewrite the append-only store as DISTINCT band rows — the
        periodic maintenance for a long-lived gate. Membership is all
        the probe needs, so dropping repeated (band_index, band_value)
        rows loses nothing; a store that admitted boilerplate-heavy
        corpora shrinks by the repeat factor, and file count resets
        from one-per-batch-task to one. Two-phase swap (stage → park →
        commit) with roll-forward recovery, same discipline as the
        collection updater."""
        import shutil

        self._recover()
        live = Path(self.store_path)
        if not live.exists():
            return {"compacted": False}
        old = live.with_name(live.name + "__old")
        tmp = live.with_name(live.name + "__tmp")
        before = spark.read.parquet(self.store_path)
        n_before = before.count()
        before.distinct().coalesce(1).write.mode("overwrite").parquet(str(tmp))
        n_after = spark.read.parquet(str(tmp)).count()
        live.rename(old)
        tmp.rename(live)
        shutil.rmtree(old)
        return {"compacted": True, "rows_before": n_before, "rows_after": n_after}

    def decide(self, batch_docs: DataFrame) -> DataFrame:
        """Admission DECISION only: returns the admitted rows of
        ``batch_docs`` (all columns preserved) without touching the
        store. Pair with :meth:`record` once the batch's downstream
        effect has committed — the split is what makes the gate safe
        under at-least-once micro-batch semantics (see
        streaming/incremental.py): recording BEFORE the downstream
        commit would make a retried batch collide with its own
        signatures and silently vanish.

        The band computation (tokenize + shingle + minhash — the
        gate's dominant cost) runs ONCE: the band rows are
        checkpointed, and both the decision and the later
        :meth:`record` append derive from those materialized rows.
        """
        self._recover()
        spark = batch_docs.sparkSession
        bands = self._band_rows(batch_docs).localCheckpoint()

        # in-batch first-wins: a band key's minimum id is its head;
        # anyone above the head in ANY shared band drops
        w = Window.partitionBy("band_index", "band_value")
        in_batch_hit = (
            bands.withColumn("_head", F.min("id").over(w))
            .filter(F.col("id") != F.col("_head"))
            .select(F.col("id").alias(self.id_col))
            .distinct()
        )

        # store probe: any band collision with previously admitted docs
        if Path(self.store_path).exists():
            store = spark.read.parquet(self.store_path)
            store_hit = (
                bands.join(store, ["band_index", "band_value"], "left_semi")
                .select(F.col("id").alias(self.id_col))
                .distinct()
            )
            hits = in_batch_hit.unionByName(store_hit).distinct()
        else:
            hits = in_batch_hit

        admitted = batch_docs.join(hits, self.id_col, "left_anti").localCheckpoint()
        self._pending_bands = bands
        self._pending_ids = admitted.select(
            F.col(self.id_col).alias("id")
        ).localCheckpoint()
        return admitted

    def record(self) -> None:
        """Append the signatures of the last :meth:`decide`'s admitted
        rows to the store — call AFTER the batch's downstream effect
        (e.g. the collection merge) has committed. Crash windows are
        safe in both directions: dying before record means the retry
        re-decides against the unchanged store (downstream merge is
        idempotent); dying after record means the retry's decide drops
        every doc as a duplicate and the already-committed batch is
        simply not re-applied."""
        bands = getattr(self, "_pending_bands", None)
        if bands is None:
            raise RuntimeError("record() without a preceding decide()")
        bands.join(self._pending_ids, "id", "left_semi").select(
            "band_index", "band_value"
        ).write.mode("append").parquet(self.store_path)
        self._pending_bands = None
        self._pending_ids = None

    def admit(self, batch_docs: DataFrame) -> DataFrame:
        """Decide-and-record in one step — for batch callers with no
        downstream commit to sequence against. Streaming pipelines
        should use :meth:`decide` / :meth:`record` around their merge
        instead."""
        admitted = self.decide(batch_docs)
        self.record()
        return admitted
