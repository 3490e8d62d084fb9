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
side tiny, store side PRUNED to the batch's own signature buckets: the
store is hash-partitioned on ``sig_bucket = hash(band_index,
band_value) % store_buckets`` (the same ``_pb`` discipline as the
collection's update buckets), and the probe filters on the partition
column before the semi join, so a micro-batch reads only the bucket
directories its own band values hash into — O(batch buckets), not
O(store). The in-batch first-wins is one window over the batch's own
band rows. Admission appends ``bands`` rows per admitted doc
(append-mode parquet, no rewrite). Used inside ``foreachBatch`` beside
the collection update (streaming/incremental.py), the gate's
decision-then-append runs through an eager localCheckpoint so the
store append never races the probe that read it.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.dedup import minhash_band_rows

SIG_BUCKET_COL = "sig_bucket"


class NearDupGate:
    """foreachBatch near-dup admission against a persistent band store.

    ``admit(batch_docs)`` returns the admitted subset of the batch and
    appends their band signatures to ``store_path``. Deterministic:
    same batches in the same order admit the same documents on any
    engine/partitioning (in-batch precedence is by ascending id).

    Sizing (num_hashes, bands) — drops are IRREVERSIBLE, so the false-
    positive curve matters more here than in the batch pair finder
    (which Jaccard-verifies its candidates). With r = num_hashes/bands
    rows per band, a document whose true Jaccard similarity to any
    admitted document is s collides with probability
    ``1 - (1 - s^r)^bands``:

    =====  ==================  ==================
      s    r=2, b=4 (loose)    r=4, b=4 (default)
    =====  ==================  ==================
    0.3    31%  (!)            3.2%
    0.5    66%                 22%
    0.7    94%                 68%
    0.9    99.98%              95%
    =====  ==================  ==================

    The default (num_hashes=16, bands=4 → r=4) keeps the ~0.3-similar
    false-drop rate in single digits while still catching most ≥0.7
    near-dups; loosen to num_hashes=8 only when recall against lightly
    edited reposts outweighs silently dropping novel documents.

    ``store_path`` must be a LOCAL-FILESYSTEM path: the metadata
    compatibility check, crash recovery, and compaction swap go through
    pathlib (``Path.rglob`` / ``rename``), which an ``s3://`` or
    ``hdfs://`` URI would silently bypass — the gate would see "no
    store" and skip the compatibility guard. Streaming state belongs on
    the driver-local disk (or a mounted DFS path that LOOKS local);
    routing the store through the Hadoop FS API is the documented
    follow-up if an object-store URI is ever needed.
    """

    def __init__(
        self,
        store_path: str,
        num_hashes: int = 16,
        bands: int = 4,
        shingle_words: int = 3,
        id_col: str = "id",
        text_col: str = "text",
        store_buckets: int = 64,
    ):
        if "://" in store_path:
            # pathlib-based meta/recovery/compaction would silently
            # no-op on a scheme URI (see class docstring) — refuse
            raise ValueError(
                "NearDupGate store_path must be a local filesystem "
                f"path, got URI {store_path!r}"
            )
        self.store_path = store_path
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_words = shingle_words
        self.id_col = id_col
        self.text_col = text_col
        self.store_buckets = store_buckets

    def _band_rows(self, docs: DataFrame) -> DataFrame:
        return minhash_band_rows(
            docs,
            num_hashes=self.num_hashes,
            bands=self.bands,
            shingle_words=self.shingle_words,
            id_col=self.id_col,
            text_col=self.text_col,
        ).withColumn(
            SIG_BUCKET_COL,
            F.pmod(
                F.xxhash64("band_index", "band_value"),
                F.lit(self.store_buckets),
            ).cast("int"),
        )

    def _pruned_store(self, spark, buckets: list[int]) -> DataFrame:
        """The store narrowed to ``buckets`` — a partition-column filter,
        so only the touched ``sig_bucket=N`` directories are read."""
        return spark.read.parquet(self.store_path).filter(
            F.col(SIG_BUCKET_COL).isin(buckets)
        )

    # -- store compatibility metadata ---------------------------------
    # Band values are only comparable when BOTH sides used the same
    # hash family and (num_hashes, bands, shingle_words) — and bucket
    # pruning is only sound against the modulus the store was written
    # with. A silent mismatch re-admits near-duplicates forever (the
    # probe join just never matches), so the store carries its
    # parameters in a _GATE_META.json (underscore prefix: Spark readers
    # ignore it inside the parquet dir) and every decide/record/compact
    # validates. A store WITHOUT the sidecar predates this format (and
    # the current 32-bit MinHash family), so its signatures are
    # incomparable — refuse loudly instead of silently admitting dups.

    _FAMILY = "minhash-cw32"

    def _meta(self) -> dict:
        return {
            "family": self._FAMILY,
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "shingle_words": self.shingle_words,
            "store_buckets": self.store_buckets,
        }

    def _meta_path(self, root: Path | None = None) -> Path:
        return (root or Path(self.store_path)) / "_GATE_META.json"

    def _store_has_data(self) -> bool:
        live = Path(self.store_path)
        return live.exists() and any(live.rglob("*.parquet"))

    def _write_meta(self, root: Path | None = None) -> None:
        import json

        path = self._meta_path(root)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(self._meta(), sort_keys=True))

    def _check_meta(self) -> None:
        import json

        if not self._store_has_data():
            return
        meta_path = self._meta_path()
        if not meta_path.exists():
            raise RuntimeError(
                f"near-dup store at {self.store_path} has no _GATE_META"
                ".json: it was written by an incompatible gate version "
                "(pre-bucketed layout / old hash family) and its band "
                "signatures cannot be compared with current ones — "
                "rebuild the store by re-admitting the corpus (or "
                "delete it to start empty)"
            )
        stored = json.loads(meta_path.read_text())
        if stored != self._meta():
            raise ValueError(
                "near-dup store parameters do not match this gate: "
                f"store={stored} gate={self._meta()} — construct the "
                "gate with the store's parameters, or rebuild the "
                "store"
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
        collection updater.

        CONCURRENCY CONTRACT — single writer, sequential calls only:
        compact must run from the same control loop as decide/record
        (e.g. a foreachBatch maintenance slot between batches), never
        concurrently with them. A concurrent decide would race the
        rename swap twice over: its ``_recover()`` treats the staged
        ``__tmp``/parked ``__old`` dirs as crash orphans and deletes
        them mid-swap, and a store scan planned before the swap would
        read files the commit step deletes. What IS safe — and pinned
        by test_streaming.py::test_compact_crash_windows — is a CRASH
        at any point of the sequence: the next decide/record/compact
        first runs ``_recover()`` and sees either the complete old
        store or the complete compacted store, never a partial one
        (the staged tmp is complete before the first rename, and the
        parked old dir is restored if the commit rename never
        happened)."""
        import shutil

        self._recover()
        self._check_meta()
        live = Path(self.store_path)
        if not self._store_has_data():
            return {"compacted": False}
        old = live.with_name(live.name + "__old")
        tmp = live.with_name(live.name + "__tmp")
        before = spark.read.parquet(self.store_path)
        n_before = before.count()
        # repartition ON the bucket column → each bucket lands in one
        # task → exactly one file per sig_bucket directory
        (
            before.distinct()
            .repartition(self.store_buckets, F.col(SIG_BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(SIG_BUCKET_COL)
            .parquet(str(tmp))
        )
        self._write_meta(tmp)
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
        self._check_meta()
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

        # store probe: any band collision with previously admitted
        # docs. Pruned to the batch's own signature buckets — the
        # bucket list is a tiny driver collect over the checkpointed
        # band rows (≤ min(batch×bands, store_buckets) ints), and the
        # resulting isin() is a partition-column filter, so the scan
        # touches only those sig_bucket directories.
        if self._store_has_data():
            touched = sorted(
                r[0]
                for r in bands.select(SIG_BUCKET_COL).distinct().collect()
            )
            self._last_probe_buckets = touched
            store = self._pruned_store(spark, touched)
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
        self._check_meta()
        # meta BEFORE the append: a crash in between leaves a dir whose
        # only content is the sidecar — _store_has_data() still reports
        # empty, so nothing ever reads a half-initialized store
        self._write_meta()
        bands.join(self._pending_ids, "id", "left_semi").select(
            "band_index", "band_value", SIG_BUCKET_COL
        ).write.mode("append").partitionBy(SIG_BUCKET_COL).parquet(
            self.store_path
        )
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
