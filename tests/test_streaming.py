"""Incremental update: watermark rewrites + Structured Streaming merge."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.collection import (
    Collection,
    CollectionSearcher,
    create_collection,
)
from documents_vector_search_spark.collection.manifest import Manifest
from documents_vector_search_spark.streaming.incremental import (
    incremental_files_update,
    run_streaming_update,
    watermark_cql,
    watermark_jql,
    watermark_start_time,
)


class TestWatermarkRewrites:
    def test_start_time_has_overlap_buffer(self):
        m = Manifest("c", lastModifiedDocumentTime="2024-05-01T12:00:00")
        assert watermark_start_time(m) == datetime(2024, 5, 1, 11, 55)

    def test_no_watermark(self):
        assert watermark_start_time(Manifest("c")) is None

    def test_jql_rewrite(self):
        got = watermark_jql("project = X", datetime(2024, 5, 1, 11, 55))
        assert got == '(project = X) AND updated >= "2024/05/01 11:55"'
        assert watermark_jql("", datetime(2024, 5, 1, 11, 55)) == (
            'updated >= "2024/05/01 11:55"'
        )

    def test_cql_rewrite(self):
        got = watermark_cql("space = E", datetime(2024, 5, 1, 11, 55))
        assert got == (
            '(space = E) AND (created >= "2024/05/01 11:55" '
            'OR lastModified >= "2024/05/01 11:55")'
        )


def _canonical(spark, rows):
    return spark.createDataFrame(
        [
            (
                rid,
                f"file:///{rid}",
                {"lang": "en"},
                text,
                datetime.fromisoformat(ts),
                "localFiles",
            )
            for rid, text, ts in rows
        ],
        "id STRING, url STRING, metadata MAP<STRING,STRING>, text STRING, "
        "last_modified_at TIMESTAMP, source_type STRING",
    )


class TestStreamingUpdate:
    def test_availablenow_merges_drop_dir(self, spark, tmp_path):
        coll = Collection(spark, str(tmp_path / "coll"), "s")
        base = _canonical(
            spark,
            [
                ("a", "alpha content about scan", "2024-01-01T00:00:00"),
                ("b", "beta content about merge", "2024-01-01T00:00:00"),
            ],
        )
        create_collection(coll, base, chunk_size=100, chunk_overlap=10)

        drop = tmp_path / "drop"
        # two versions of doc a in one batch: newest must win
        _canonical(
            spark,
            [
                ("a", "stale version", "2024-02-01T00:00:00"),
                ("a", "fresh alpha about broadcast join", "2024-03-01T00:00:00"),
                ("c", "new gamma document", "2024-03-02T00:00:00"),
            ],
        ).write.mode("overwrite").parquet(str(drop))

        q = run_streaming_update(
            coll, str(drop), str(tmp_path / "ckpt"), available_now=True
        )
        q.awaitTermination(120)

        docs = {r.id: r.text for r in coll.read("documents").collect()}
        assert docs["a"] == "fresh alpha about broadcast join"
        assert "c" in docs and len(docs) == 3
        m = coll.manifest()
        assert m.numberOfDocuments == 3
        assert m.lastModifiedDocumentTime.startswith("2024-03-02")
        # updated content is searchable
        s = CollectionSearcher(coll)
        hits = s.search("broadcast join", indexes=("bm25",)).collect()
        assert {r.document_id for r in hits} == {"a"}


class TestIncrementalFiles:
    def test_mtime_watermark_scan(self, spark, tmp_path):
        src = tmp_path / "srcfiles"
        src.mkdir()
        (src / "old.txt").write_text("old doc about filters")
        coll = Collection(spark, str(tmp_path / "coll2"), "f")
        from documents_vector_search_spark.sources.files import read_files_documents

        create_collection(
            coll, read_files_documents(spark, str(src)), chunk_size=100, chunk_overlap=10
        )
        m0 = coll.manifest()
        assert m0.numberOfDocuments == 1

        # watermark is "now"; a file written after it must be picked up
        import time

        time.sleep(1.1)
        (src / "new.txt").write_text("new doc about salting skew")
        m1 = incremental_files_update(coll, str(src))
        assert m1.numberOfDocuments == 2
        ids = {r.id for r in coll.read("documents").collect()}
        assert ids == {"old.txt", "new.txt"}


class TestStatefulSessionization:
    """applyInPandasWithState custom operator: open sessions live in the
    checkpointed state store across micro-batches AND query restarts."""

    def test_sessions_close_across_restarts(self, spark, tmp_path):
        from datetime import datetime, timedelta

        from documents_vector_search_spark.streaming.stateful import (
            sessionize_stream,
        )

        src = tmp_path / "sess_events"
        src.mkdir()
        ckpt = str(tmp_path / "sess_ckpt")
        out = str(tmp_path / "sess_out")
        schema = "user_id string, ts timestamp"
        base = datetime(2024, 1, 1)

        # The memory sink cannot recover from a checkpoint; foreachBatch
        # appending parquet can, which is what makes the restart real.
        def sink(batch_df, _batch_id):
            batch_df.write.mode("append").parquet(out)

        def run_batch(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            stream = spark.readStream.schema(schema).parquet(str(src))
            q = (
                sessionize_stream(stream, gap_seconds=60, ts_col="ts")
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            try:
                return spark.read.parquet(out).collect()
            except Exception:
                return []  # no closed sessions written yet

        # batch 1: one burst per user — sessions stay OPEN, nothing emits
        got1 = run_batch(
            [
                ("u1", base),
                ("u1", base + timedelta(seconds=10)),
                ("u1", base + timedelta(seconds=20)),
                ("u2", base),
            ],
        )
        assert got1 == []

        # batch 2 (new query run, same checkpoint): a late burst closes
        # u1's first session; u2 stays open
        got2 = run_batch([("u1", base + timedelta(seconds=500))])
        assert len(got2) == 1
        r = got2[0]
        assert r.user_id == "u1" and r.n_events == 3
        assert r.session_start == base
        assert r.session_end == base + timedelta(seconds=20)

    def test_closed_sessions_match_batch_operator(self, spark, tmp_path):
        """Stream == batch twin: every session the stream CLOSES must
        match operators/sessions.py::sessionize row-for-row (the
        per-user final session stays open in the stream and is the
        only difference)."""
        from datetime import datetime, timedelta

        from documents_vector_search_spark.operators.sessions import (
            sessionize,
        )
        from documents_vector_search_spark.streaming.stateful import (
            sessionize_stream,
        )

        src = tmp_path / "sessp_events"
        src.mkdir()
        ckpt = str(tmp_path / "sessp_ckpt")
        out = str(tmp_path / "sessp_out")
        schema = "user_id string, ts timestamp"
        base = datetime(2024, 1, 1)
        rows = [
            ("u1", base),
            ("u1", base + timedelta(seconds=30)),
            ("u1", base + timedelta(seconds=200)),   # new session
            ("u1", base + timedelta(seconds=210)),
            ("u1", base + timedelta(seconds=500)),   # third session
            ("u2", base),
            ("u2", base + timedelta(seconds=300)),   # closes u2's first
        ]

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out)

        def run(batch_rows):
            spark.createDataFrame(batch_rows, schema).coalesce(1) \
                .write.mode("append").parquet(str(src))
            q = (
                sessionize_stream(
                    spark.readStream.schema(schema).parquet(str(src)),
                    gap_seconds=60,
                    ts_col="ts",
                )
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run(rows[:4])
        run(rows[4:])

        streamed = {
            (r["user_id"], int(r["session_start"].timestamp()),
             int(r["session_end"].timestamp()), r["n_events"])
            for r in spark.read.parquet(out).collect()
        }
        ev = spark.createDataFrame(
            [(i + 1, u, t) for i, (u, t) in enumerate(rows)],
            "event_id long, user_id string, ts timestamp",
        )
        batch = sessionize(ev, gap_seconds=60)
        # drop each user's LAST session (still open in the stream)
        from pyspark.sql import Window as W
        from pyspark.sql import functions as SF

        w = W.partitionBy("user").orderBy(SF.col("session_id").desc())
        closed = (
            batch.withColumn("_rn", SF.row_number().over(w))
            .filter("_rn > 1")
        )
        expected = {
            (r["user"], r["session_start_us"] // 1_000_000,
             r["session_end_us"] // 1_000_000, r["n_events"])
            for r in closed.collect()
        }
        assert streamed == expected

    def test_idle_flush_event_time_timeout(self, spark, tmp_path):
        """idle_flush: the watermark passing end+gap closes u1's session
        even though u1 never sends another event — the state store stays
        bounded by recently-active users."""
        from datetime import datetime, timedelta

        from documents_vector_search_spark.streaming.stateful import (
            sessionize_stream,
        )

        src = tmp_path / "idle_events"
        src.mkdir()
        ckpt = str(tmp_path / "idle_ckpt")
        out = str(tmp_path / "idle_out")
        schema = "user_id string, ts timestamp"
        base = datetime(2024, 1, 1)

        def sink(batch_df, _batch_id):
            batch_df.write.mode("append").parquet(out)

        def run_batch(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            stream = (
                spark.readStream.schema(schema)
                .parquet(str(src))
                .withWatermark("ts", "0 seconds")
            )
            q = (
                sessionize_stream(
                    stream, gap_seconds=60, ts_col="ts", idle_flush=True
                )
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            try:
                return spark.read.parquet(out).collect()
            except Exception:
                return []

        # batch 1: u1's burst stays open (watermark hasn't passed the gap)
        got1 = run_batch(
            [("u1", base), ("u1", base + timedelta(seconds=10))]
        )
        assert got1 == []

        # batch 2: an OTHER-user event far in the future advances the
        # watermark past u1's end+gap → u1's session flushes by timeout
        got2 = run_batch([("u2", base + timedelta(hours=3))])
        flushed = [r for r in got2 if r.user_id == "u1"]
        assert len(flushed) == 1
        assert flushed[0].n_events == 2
        assert flushed[0].session_end == base + timedelta(seconds=10)

    def test_multiple_sessions_in_one_batch(self, spark, tmp_path):
        from datetime import datetime, timedelta

        from documents_vector_search_spark.streaming.stateful import (
            sessionize_stream,
        )

        src = tmp_path / "sess2_events"
        src.mkdir()
        schema = "user_id string, ts timestamp"
        base = datetime(2024, 3, 1)
        rows = [
            ("u1", base),
            ("u1", base + timedelta(seconds=30)),
            ("u1", base + timedelta(seconds=200)),   # closes session 1
            ("u1", base + timedelta(seconds=500)),   # closes session 2
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            sessionize_stream(stream, gap_seconds=60, ts_col="ts")
            .writeStream.format("memory")
            .queryName("sess_multi")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            spark.sql("SELECT * FROM sess_multi").collect(),
            key=lambda r: r.session_start,
        )
        assert [(r.n_events) for r in got] == [2, 1]
        assert got[0].session_end == base + timedelta(seconds=30)


class TestStreamingWindowedAggregation:
    """Structured Streaming windowed aggregate with watermark — the
    streaming twin of registry.q_events_window (the reference has no
    true streaming, SURVEY §2.7; the engine gets it natively)."""

    def test_windowed_counts_match_batch(self, spark, tmp_path):
        from datetime import datetime

        rows = [
            (i, datetime(2024, 1, 1 + (i % 3), i % 24), f"type{i % 2}", float(i))
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
        )
        src = str(tmp_path / "events_stream")
        df.write.mode("overwrite").parquet(src)

        stream = (
            spark.readStream.schema(
                "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
            )
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day"), F.col("event_type"))
            .agg(F.count("*").alias("n"))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("win_agg")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {
            (r.window.start.isoformat(), r.event_type): r.n
            for r in spark.sql("SELECT * FROM win_agg").collect()
        }
        batch = {
            (r.w.isoformat(), r.event_type): r.n
            for r in df.groupBy(
                F.date_trunc("day", "ts").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # append mode emits only watermark-closed windows; every emitted
        # window must match the batch result exactly
        assert len(got) > 0
        for key, n in got.items():
            assert batch[key] == n


class TestStreamingDedup:
    """dropDuplicatesWithinWatermark exact dedup — the streaming twin
    of operators/dedup.exact_dedup (bounded state by watermark)."""

    def test_first_arrival_wins(self, spark, tmp_path):
        from datetime import datetime

        from documents_vector_search_spark.streaming.dedup import dedup_stream

        rows = [
            (1, "same text", datetime(2024, 1, 1, 10, 0, 0)),
            (2, "same text", datetime(2024, 1, 1, 10, 1, 0)),  # dup
            (3, "other text", datetime(2024, 1, 1, 10, 2, 0)),
            (4, "same text", datetime(2024, 1, 1, 10, 3, 0)),  # dup
            (5, "third text", datetime(2024, 1, 1, 10, 4, 0)),
        ]
        schema = "doc_id LONG, text STRING, last_modified_at TIMESTAMP"
        df = spark.createDataFrame(rows, schema)
        src = str(tmp_path / "docs_stream")
        df.write.mode("overwrite").parquet(src)

        stream = spark.readStream.schema(schema).parquet(src)
        out = dedup_stream(stream, watermark_delay="10 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = spark.sql("SELECT * FROM dedup_out").collect()
        assert {r.text for r in got} == {"same text", "other text", "third text"}
        assert len(got) == 3
        assert "content_hash" in got[0].asDict()
        # batch twin agrees on the surviving set of hashes
        from documents_vector_search_spark.operators.dedup import exact_dedup

        batch = exact_dedup(df, id_col="doc_id", text_col="text")
        assert batch.count() == len(got)  # one group per distinct content
        assert {r.content_hash for r in batch.collect()} == {
            r.content_hash for r in got
        }

    def test_rejects_batch_dataframe(self, spark):
        from documents_vector_search_spark.streaming.dedup import dedup_stream

        df = spark.createDataFrame(
            [(1, "t")], "doc_id LONG, text STRING"
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="streaming"):
            dedup_stream(df)


class TestStreamingCuration:
    def test_gate_filters_quality_contamination_and_dups(self, spark, tmp_path):
        """curate_stream drops low-quality, eval-contaminated, and
        duplicate docs in one availableNow pass; survivors match the
        equivalent batch predicates."""
        from datetime import datetime

        from documents_vector_search_spark.streaming.curation import (
            curate_stream,
        )

        good = (
            "the quick brown fox jumps over the lazy dog and then "
            "writes a long readable paragraph about distributed joins "
            "with many common english words in it for quality scoring "
        ) * 3
        rows = [
            ("keep-1", good + "unique one", datetime(2024, 1, 1, 10)),
            ("keep-2", good + "unique two", datetime(2024, 1, 1, 10, 1)),
            # exact duplicate of keep-1 (later arrival)
            ("dup-1", good + "unique one", datetime(2024, 1, 1, 10, 2)),
            # junk: short, no english
            ("junk-1", "zzz 123", datetime(2024, 1, 1, 10, 3)),
            # contaminated: contains the benchmark 5-gram
            (
                "contam-1",
                good + " the secret eval answer is forty two",
                datetime(2024, 1, 1, 10, 4),
            ),
        ]
        df = spark.createDataFrame(
            rows, "id STRING, text STRING, last_modified_at TIMESTAMP"
        )
        src = str(tmp_path / "intake")
        df.write.mode("overwrite").parquet(src)

        stream = spark.readStream.schema(
            "id STRING, text STRING, last_modified_at TIMESTAMP"
        ).parquet(src)
        gated = curate_stream(
            stream,
            min_quality=0.3,
            benchmark_grams=["secret eval answer is forty"],
            n=5,
            dedup_watermark="1 hour",
        )
        q = (
            gated.writeStream.format("memory")
            .queryName("gated")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM gated").collect()
        kept = {r.id for r in got}
        # dedup keeps ONE of {keep-1, dup-1} (same content hash)
        assert "keep-2" in kept
        assert len(kept & {"keep-1", "dup-1"}) == 1
        assert "junk-1" not in kept and "contam-1" not in kept
        assert all(r.quality >= 0.3 for r in got)

    def test_hashed_gram_gate_matches_string_gate(self, spark, tmp_path):
        from datetime import datetime

        from documents_vector_search_spark.functions.hashing import (
            md5_hash64_py,
        )
        from documents_vector_search_spark.streaming.curation import (
            curate_stream,
        )

        base = "plenty of ordinary english text that scores well " * 5
        rows = [
            ("a", base + "the secret eval answer is forty two",
             datetime(2024, 1, 1)),
            ("b", base + "nothing overlapping here", datetime(2024, 1, 1)),
        ]
        df = spark.createDataFrame(
            rows, "id STRING, text STRING, last_modified_at TIMESTAMP"
        )
        src = str(tmp_path / "intake2")
        df.write.mode("overwrite").parquet(src)
        gram = "secret eval answer is forty"

        outs = {}
        for name, kwargs in (
            ("plain", {"benchmark_grams": [gram]}),
            (
                "hashed",
                {
                    "benchmark_grams": [md5_hash64_py(gram)],
                    "hash_grams": True,
                },
            ),
        ):
            stream = spark.readStream.schema(
                "id STRING, text STRING, last_modified_at TIMESTAMP"
            ).parquet(src)
            gated = curate_stream(
                stream, min_quality=None, n=5, **kwargs
            )
            q = (
                gated.writeStream.format("memory")
                .queryName(f"gated_{name}")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            outs[name] = {
                r.id for r in spark.sql(f"SELECT * FROM gated_{name}").collect()
            }
        assert outs["plain"] == outs["hashed"] == {"b"}

    def test_rejects_batch_input(self, spark):
        from documents_vector_search_spark.streaming.curation import (
            curate_stream,
        )

        df = spark.createDataFrame([("a", "t")], ["id", "text"])
        with pytest.raises(ValueError, match="streaming"):
            curate_stream(df)


class TestNearDupGate:
    """streaming/neardup.py: MinHash-LSH admission against a persistent
    band-signature store — the fuzzy twin of the exact streaming gate."""

    BASE = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the distributed query engine shuffles partitions around"
    )

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, ["id", "text"])

    def test_in_batch_and_cross_batch_admission(self, spark, tmp_path):
        from documents_vector_search_spark.streaming import NearDupGate

        store = str(tmp_path / "bands")
        gate = NearDupGate(store)

        batch1 = self._docs(spark, [
            (1, self.BASE),
            (2, self.BASE.replace("dog", "cat")),   # near dup of 1
            (3, "completely different text about training data mixes"),
        ])
        admitted1 = {r.id for r in gate.admit(batch1).collect()}
        assert admitted1 == {1, 3}  # 2 drops in-batch (first-wins by id)

        batch2 = self._docs(spark, [
            (4, self.BASE.replace("fox", "wolf")),  # near dup of stored 1
            (5, "yet another unrelated document about parquet readers"),
        ])
        admitted2 = {r.id for r in gate.admit(batch2).collect()}
        assert admitted2 == {5}

        # a FRESH gate over the same store path sees the same state
        gate2 = NearDupGate(store)
        batch3 = self._docs(spark, [
            (6, self.BASE),                         # exact dup of stored 1
            (7, "one more genuinely novel piece of text entirely"),
        ])
        admitted3 = {r.id for r in gate2.admit(batch3).collect()}
        assert admitted3 == {7}

    def test_compact_store_dedups_and_preserves_decisions(
        self, spark, tmp_path
    ):
        from documents_vector_search_spark.streaming import NearDupGate

        store = str(tmp_path / "bands3")
        gate = NearDupGate(store)
        gate.admit(self._docs(spark, [(1, self.BASE)]))
        gate.admit(self._docs(spark, [
            (2, "some unrelated new document text for the second batch"),
        ]))
        report = gate.compact_store(spark)
        assert report["compacted"] is True
        assert report["rows_after"] <= report["rows_before"]
        # exactly one parquet piece per sig_bucket directory
        from pathlib import Path as P
        bucket_dirs = list(P(store).glob("sig_bucket=*"))
        assert bucket_dirs
        for d in bucket_dirs:
            assert len(list(d.glob("*.parquet"))) == 1
        # decisions unchanged: a dup of batch-1 content still drops
        admitted = gate.admit(self._docs(spark, [
            (3, self.BASE),
            (4, "fresh content that matches nothing admitted before"),
        ]))
        assert {r.id for r in admitted.collect()} == {4}

    def test_compact_crash_windows(self, spark, tmp_path):
        """A crash at ANY point of compact_store's stage → park →
        commit sequence leaves the next decide() a COMPLETE store —
        either the old one or the compacted one, never a partial or
        empty view (the docstring's crash contract; true concurrency
        is explicitly unsupported). Each window is replayed by
        reproducing compact's directory states by hand and asserting
        a known duplicate still drops."""
        import shutil
        from pathlib import Path as P

        from documents_vector_search_spark.streaming import NearDupGate

        def fresh_store(name):
            store = str(tmp_path / name)
            gate = NearDupGate(store)
            gate.admit(self._docs(spark, [(1, self.BASE)]))
            gate.admit(self._docs(spark, [(1, self.BASE)]))  # repeat rows
            return store, gate

        def staged_tmp(store, gate):
            """Reproduce compact's staging step: complete __tmp dir."""
            live, tmp = P(store), P(store + "__tmp")
            (
                spark.read.parquet(store)
                .distinct()
                .repartition(gate.store_buckets, "sig_bucket")
                .write.mode("overwrite")
                .partitionBy("sig_bucket")
                .parquet(str(tmp))
            )
            gate._write_meta(tmp)
            return live, tmp

        def assert_dup_still_drops(store, doc_id):
            admitted = NearDupGate(store).admit(
                self._docs(spark, [(doc_id, self.BASE)])
            )
            assert admitted.count() == 0, "duplicate admitted after crash"

        # window A: crash after staging __tmp, before any rename —
        # recovery discards the orphan stage, old store intact
        store, gate = fresh_store("bandsA")
        staged_tmp(store, gate)
        assert_dup_still_drops(store, 10)
        assert not P(store + "__tmp").exists()

        # window B: crash after live→__old, before __tmp→live —
        # recovery restores the parked old store
        store, gate = fresh_store("bandsB")
        live, tmp = staged_tmp(store, gate)
        live.rename(P(store + "__old"))
        assert_dup_still_drops(store, 11)
        assert not P(store + "__old").exists()
        assert not P(store + "__tmp").exists()

        # window C: crash after __tmp→live, before rmtree(__old) —
        # recovery keeps the committed compacted store, drops the park
        store, gate = fresh_store("bandsC")
        live, tmp = staged_tmp(store, gate)
        live.rename(P(store + "__old"))
        tmp.rename(live)
        assert_dup_still_drops(store, 12)
        assert not P(store + "__old").exists()
        # committed store is the compacted one: one file per bucket dir
        for d in P(store).glob("sig_bucket=*"):
            assert len(list(d.glob("*.parquet"))) == 1

    def test_decide_without_record_is_retry_safe(self, spark, tmp_path):
        """foreachBatch is at-least-once: a batch whose merge failed
        before record() must get the IDENTICAL admission decision on
        retry — decide() alone never mutates the store."""
        from documents_vector_search_spark.streaming import NearDupGate

        store = str(tmp_path / "bands4")
        gate = NearDupGate(store)
        batch = self._docs(spark, [(1, self.BASE), (2, "something else new")])
        first = {r.id for r in gate.decide(batch).collect()}
        assert first == {1, 2}
        from pathlib import Path as P
        assert not P(store).exists()  # no signatures until record()
        # "retry": a fresh decide sees the unchanged store
        retry = {r.id for r in gate.decide(batch).collect()}
        assert retry == first
        gate.record()
        # post-record, the same content is refused
        again = {r.id for r in gate.decide(batch).collect()}
        assert again == set()

    def test_record_requires_decide(self, spark, tmp_path):
        from documents_vector_search_spark.streaming import NearDupGate

        gate = NearDupGate(str(tmp_path / "bands5"))
        with pytest.raises(RuntimeError, match="decide"):
            gate.record()

    def test_probe_reads_only_touched_buckets(self, spark, tmp_path):
        """Plan contract for the O(batch-buckets) store probe: a tiny
        micro-batch's semi join must read only the sig_bucket
        directories its own band values hash into, not the full store
        (r4 VERDICT #4)."""
        from pathlib import Path as P

        from documents_vector_search_spark.streaming import NearDupGate

        store = str(tmp_path / "bands_pruned")
        gate = NearDupGate(store, store_buckets=16)
        seed = self._docs(spark, [
            (i, f"seed document number {i} with distinct content "
                f"{'alpha beta gamma delta'[: 5 + i % 18]} and more "
                f"unique filler words row {i * 7} end")
            for i in range(40)
        ])
        gate.admit(seed)
        all_dirs = {p.name for p in P(store).glob("sig_bucket=*")}
        assert len(all_dirs) > 4  # 40 docs x bands spread over buckets

        tiny = self._docs(spark, [(999, "one single novel probe document "
                                        "with fresh text nobody stored")])
        gate.decide(tiny)
        touched = gate._last_probe_buckets
        assert 0 < len(touched) <= gate.bands  # ≤ one bucket per band
        # files ACTUALLY scanned by the pruned probe (input_file_name
        # reflects partition pruning; DataFrame.inputFiles() does not)
        pruned = gate._pruned_store(spark, touched)
        scanned = {
            r[0]
            for r in pruned.select(F.input_file_name()).distinct().collect()
        }
        for f in scanned:
            assert any(f"sig_bucket={b}/" in f for b in touched), f
        # and the physical plan prunes at the directory level
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert len(touched) < len(all_dirs)  # genuinely pruned

    def test_store_meta_rejects_mismatched_gate(self, spark, tmp_path):
        """Band values are only comparable under identical gate params
        and bucket pruning only sound under the written modulus — a
        mismatched gate must fail LOUDLY, not silently re-admit dups."""
        from documents_vector_search_spark.streaming import NearDupGate

        store = str(tmp_path / "bands_meta")
        NearDupGate(store).admit(self._docs(spark, [(1, self.BASE)]))
        for bad in (
            NearDupGate(store, num_hashes=8),
            NearDupGate(store, store_buckets=128),
            NearDupGate(store, shingle_words=2),
        ):
            with pytest.raises(ValueError, match="do not match"):
                bad.decide(self._docs(spark, [(2, "whatever text")]))
        # matching params still work
        ok = NearDupGate(store)
        assert {r.id for r in ok.decide(
            self._docs(spark, [(3, self.BASE)])
        ).collect()} == set()

    def test_meta_less_legacy_store_refused(self, spark, tmp_path):
        """A store without _GATE_META.json predates the bucketed layout
        and the current hash family: its signatures are incomparable,
        and appending bucketed rows beside flat files would HIDE the
        legacy rows from Spark's reader — refuse instead."""
        from documents_vector_search_spark.streaming import NearDupGate

        store = tmp_path / "bands_legacy"
        spark.createDataFrame(
            [(0, "999_888")], ["band_index", "band_value"]
        ).write.parquet(str(store))
        gate = NearDupGate(str(store))
        with pytest.raises(RuntimeError, match="incompatible gate version"):
            gate.decide(self._docs(spark, [(1, self.BASE)]))
        with pytest.raises(RuntimeError, match="incompatible gate version"):
            gate.compact_store(spark)

    def test_store_grows_only_by_admitted(self, spark, tmp_path):
        from documents_vector_search_spark.streaming import NearDupGate

        store = str(tmp_path / "bands2")
        gate = NearDupGate(store, bands=4)
        gate.admit(self._docs(spark, [(1, self.BASE)]))
        n1 = spark.read.parquet(store).count()
        assert n1 == 4  # bands rows per admitted doc
        # a dropped duplicate must append NOTHING
        gate.admit(self._docs(spark, [(2, self.BASE)]))
        assert spark.read.parquet(store).count() == n1


class TestComposedIntakePipeline:
    """run_streaming_update's curation seams: the quality gate runs as a
    stream transform, the near-dup admission gate inside foreachBatch —
    the full intake pipeline (curate -> admit -> merge) in one query."""

    SEED = (
        "the seed document explains how the collection updater stages "
        "its partition swap and why the manifest records a watermark "
        "for every incremental merge of changed documents"
    )
    NOVEL = (
        "an entirely different essay describing the broadcast hash join "
        "strategy that the optimizer prefers when one side of the join "
        "is small enough to ship to every executor in the cluster"
    )
    OTHER = (
        "a third unrelated piece of text walking through the columnar "
        "reader and the page indexes it consults to skip row groups "
        "whose statistics exclude the predicate entirely"
    )

    def test_gates_compose_with_merge(self, spark, tmp_path):
        from documents_vector_search_spark.streaming import (
            NearDupGate,
            run_streaming_update,
        )
        from documents_vector_search_spark.streaming.curation import (
            curate_stream,
        )

        coll = Collection(spark, str(tmp_path / "coll"), "gated")
        create_collection(
            coll,
            _canonical(spark, [("seed", self.SEED, "2024-01-01T00:00:00")]),
            chunk_size=100, chunk_overlap=10,
        )
        # loose r=2 profile: this test's near-dups are single-word edits
        # (Jaccard ~0.8) that the precision-first default (r=4) rightly
        # lets through sometimes; the subject here is gate/merge
        # COMPOSITION, not LSH sensitivity
        gate = NearDupGate(
            str(tmp_path / "bands"), id_col="id", num_hashes=8, bands=4
        )
        # seed the store with the existing corpus so near-dups of
        # PRE-EXISTING docs are refused too
        gate.admit(coll.read("documents").select("id", "text"))

        drop = tmp_path / "drop"
        _canonical(spark, [
            ("new-1", self.NOVEL, "2024-02-01T00:00:00"),
            # near-dup of new-1 in the SAME batch: admission drops it
            ("new-2", self.NOVEL.replace("cluster", "fleet"), "2024-02-01T00:01:00"),
            # junk: fails the quality gate before admission
            ("junk", "zz 1", "2024-02-01T00:02:00"),
        ]).write.mode("overwrite").parquet(str(drop))

        q = run_streaming_update(
            coll, str(drop), str(tmp_path / "ckpt"), available_now=True,
            stream_transform=lambda s: curate_stream(
                s, min_quality=0.3
            ).drop("quality"),
            admission_gate=gate,
        )
        q.awaitTermination(120)
        after1 = {r.id for r in coll.read("documents").collect()}
        assert after1 == {"seed", "new-1"}

        # second micro-batch: a near-dup of the STORED new-1 is refused,
        # a genuinely new doc lands
        _canonical(spark, [
            ("new-3", self.NOVEL.replace("essay", "article"), "2024-03-01T00:00:00"),
            ("new-4", self.OTHER, "2024-03-01T00:01:00"),
        ]).write.mode("append").parquet(str(drop))
        q = run_streaming_update(
            coll, str(drop), str(tmp_path / "ckpt"), available_now=True,
            stream_transform=lambda s: curate_stream(
                s, min_quality=0.3
            ).drop("quality"),
            admission_gate=gate,
        )
        q.awaitTermination(120)
        after2 = {r.id for r in coll.read("documents").collect()}
        assert after2 == {"seed", "new-1", "new-4"}


class TestStreamingUrlDedup:
    """streaming/dedup.py::url_dedup_stream — ingest-time URL-keyed
    dedup (normalize + dropDuplicatesWithinWatermark, bounded state)."""

    def test_first_arrival_wins_on_normal_form(self, spark, tmp_path):
        from datetime import datetime

        from documents_vector_search_spark.streaming.dedup import (
            url_dedup_stream,
        )

        rows = [
            (1, "HTTP://A.com/x?utm_source=f", datetime(2024, 1, 1, 10, 0)),
            (2, "http://a.com/x#frag", datetime(2024, 1, 1, 10, 1)),  # dup
            (3, "http://a.com/other", datetime(2024, 1, 1, 10, 2)),
            (4, "http://a.com:80/x", datetime(2024, 1, 1, 10, 3)),    # dup
        ]
        schema = "doc_id LONG, url STRING, last_modified_at TIMESTAMP"
        df = spark.createDataFrame(rows, schema)
        src = str(tmp_path / "url_stream")
        df.write.mode("overwrite").parquet(src)

        stream = spark.readStream.schema(schema).parquet(src)
        out = url_dedup_stream(stream, watermark_delay="10 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("url_dedup_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = spark.sql("SELECT * FROM url_dedup_out").collect()
        assert len(got) == 2
        assert {r.norm_url for r in got} == {
            "http://a.com/x", "http://a.com/other",
        }
        # batch twin agrees on the surviving key set
        from documents_vector_search_spark.operators.urls import (
            url_dedup_report,
        )

        batch = url_dedup_report(df).filter(F.col("keep"))
        assert {r.norm_url for r in batch.collect()} == {
            r.norm_url for r in got
        }

    def test_rejects_batch_dataframe(self, spark):
        from documents_vector_search_spark.streaming.dedup import (
            url_dedup_stream,
        )

        df = spark.createDataFrame([(1, "http://a.com")], "doc_id LONG, url STRING")
        with pytest.raises(ValueError, match="streaming"):
            url_dedup_stream(df)


class TestTrendingTerms:
    def test_stream_counts_match_batch_and_topk(self, spark, tmp_path):
        from datetime import datetime

        from documents_vector_search_spark.functions.text import tokenize
        from documents_vector_search_spark.streaming.trending import (
            top_terms_per_window,
            trending_terms_stream,
        )

        rows = []
        for d in (1, 2):
            for i in range(30):
                text = "spark shuffle skew" if (d == 1 or i % 3) else "join broadcast"
                rows.append((d * 100 + i, datetime(2024, 1, d, i % 24), text))
        df = spark.createDataFrame(rows, "doc_id LONG, ts TIMESTAMP, text STRING")
        src = str(tmp_path / "docs_stream")
        df.write.mode("overwrite").parquet(src)

        stream = trending_terms_stream(
            spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING")
            .parquet(src),
            window_duration="1 day",
            watermark="1 hour",
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("trending")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        emitted = spark.sql("SELECT * FROM trending")
        got = {
            (r.window.start.isoformat(), r.term): r.n
            for r in emitted.collect()
        }
        batch = {
            (r.w.isoformat(), r.term): r.n
            for r in df.select(
                F.date_trunc("day", "ts").alias("w"),
                F.explode(tokenize("text")).alias("term"),
            )
            .groupBy("w", "term")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # append mode emits only watermark-closed windows; each emitted
        # (window, term) count must match the batch derivation exactly
        assert got
        for key, n in got.items():
            assert batch[key] == n, key

        top = top_terms_per_window(emitted, k=2).collect()
        by_window = {}
        for r in top:
            by_window.setdefault(r["window_start"].isoformat(), []).append(
                (r["rank"], r["term"], r["n"])
            )
        for terms in by_window.values():
            assert [t[0] for t in sorted(terms)] == [1, 2]
            ns = [t[2] for t in sorted(terms)]
            assert ns == sorted(ns, reverse=True)


class TestTrendingParity:
    """The trending_terms registry key (batch twin) must agree with the
    ACTUAL Structured Streaming engine run over the same staged rows —
    same tokenize, same 6h tumbling window, same top_terms_per_window
    code (the registry reuses it verbatim)."""

    def test_registry_batch_twin_matches_stream(self, spark, sf_dir, tmp_path):
        from documents_vector_search_spark.registry import (
            _TREND_BASE_US,
            _t,
            q_trending_terms,
        )
        from documents_vector_search_spark.streaming.trending import (
            top_terms_per_window,
            trending_terms_stream,
        )

        batch = {
            (r.window_start_us, r.rank): (r.term, r.n)
            for r in q_trending_terms(spark, sf_dir).collect()
        }
        assert batch

        # identical staged rows through the real streaming engine
        staged = _t(spark, sf_dir, "documents").select(
            "doc_id",
            F.timestamp_micros(
                F.lit(_TREND_BASE_US)
                + (F.col("doc_id") % 72) * F.lit(3_600_000_000)
            ).alias("ts"),
            "text",
        )
        src = str(tmp_path / "trend_src")
        staged.write.mode("overwrite").parquet(src)
        stream = trending_terms_stream(
            spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING")
            .parquet(src),
            window_duration="6 hours",
            watermark="1 hour",
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("trend_parity")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = spark.sql("SELECT * FROM trend_parity")
        got = {
            (r.window_start_us, r.rank): (r.term, r.n)
            for r in top_terms_per_window(emitted, k=5)
            .select(
                F.unix_micros("window_start").alias("window_start_us"),
                "term",
                "n",
                "rank",
            )
            .collect()
        }

        # append mode emits only watermark-closed windows: the stream's
        # windows are a strict subset (the final, unclosed window is
        # withheld) and every emitted (window, rank) matches the batch
        # twin exactly
        assert got
        stream_windows = {w for w, _ in got}
        batch_windows = {w for w, _ in batch}
        assert stream_windows < batch_windows
        assert batch_windows - stream_windows == {max(batch_windows)}
        for key, val in got.items():
            assert batch[key] == val, key


class TestTransitionsStream:
    """streaming/stateful.py::transitions_stream — the batch
    event_transitions twin with per-user last-event state carried
    across micro-batches and restarts."""

    def test_counts_match_batch_across_microbatches(self, spark, tmp_path):
        from datetime import datetime, timedelta

        from documents_vector_search_spark.operators.paths import (
            event_transitions,
        )
        from documents_vector_search_spark.streaming.stateful import (
            transitions_stream,
        )

        src = tmp_path / "tr_events"
        src.mkdir()
        ckpt = str(tmp_path / "tr_ckpt")
        out = str(tmp_path / "tr_out")
        schema = "event_id long, user_id string, ts timestamp, event_type string"
        base = datetime(2024, 1, 1)

        def sink(batch_df, _batch_id):
            batch_df.write.mode("append").parquet(out)

        def run_batch(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            stream = spark.readStream.schema(schema).parquet(str(src))
            q = (
                transitions_stream(stream)
                .writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        b1 = [
            (1, "u1", base, "view"),
            (2, "u1", base + timedelta(seconds=10), "click"),
            (3, "u2", base, "view"),
        ]
        # batch 2 spans the boundary: u1 click->purchase and u2
        # view->click only exist if state carried the last events over
        b2 = [
            (4, "u1", base + timedelta(seconds=20), "purchase"),
            (5, "u2", base + timedelta(seconds=30), "click"),
        ]
        run_batch(b1)
        run_batch(b2)

        streamed = (
            spark.read.parquet(out)
            .groupBy("from_type", "to_type")
            .count()
            .collect()
        )
        got = {(r.from_type, r.to_type): r["count"] for r in streamed}

        batch_df = spark.createDataFrame(b1 + b2, schema)
        expected = {
            (r.from_type, r.to_type): r.n
            for r in event_transitions(batch_df).collect()
        }
        assert got == expected
        assert got[("click", "purchase")] == 1  # the cross-batch pair

    def test_late_event_is_dropped(self, spark, tmp_path):
        from datetime import datetime, timedelta

        from documents_vector_search_spark.streaming.stateful import (
            transitions_stream,
        )

        src = tmp_path / "tr_late"
        src.mkdir()
        ckpt = str(tmp_path / "tr_late_ckpt")
        out = str(tmp_path / "tr_late_out")
        schema = "event_id long, user_id string, ts timestamp, event_type string"
        base = datetime(2024, 1, 1)

        def sink(batch_df, _batch_id):
            batch_df.write.mode("append").parquet(out)

        def run_batch(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            stream = spark.readStream.schema(schema).parquet(str(src))
            q = (
                transitions_stream(stream)
                .writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_batch([(1, "u1", base + timedelta(seconds=60), "view")])
        # arrives in a LATER batch but is event-time EARLIER than the
        # absorbed state: dropped, no retroactive transition
        run_batch([(2, "u1", base, "click")])
        run_batch([(3, "u1", base + timedelta(seconds=120), "purchase")])

        rows = spark.read.parquet(out).collect()
        got = {(r.from_type, r.to_type) for r in rows}
        assert got == {("view", "purchase")}


class TestFunnelStream:
    """streaming/stateful.py::funnel_stream — the real-time funnel
    twin of operators/funnel.py::funnel_stage_times: stage completions
    emitted append-mode at the moment they happen, state carried
    across micro-batches and query restarts."""

    STEPS = ["view", "click", "purchase"]
    SCHEMA = "event_id long, user_id string, ts timestamp, event_type string"

    def _run_batch(self, spark, rows, src, ckpt, out):
        from documents_vector_search_spark.streaming.stateful import (
            funnel_stream,
        )

        spark.createDataFrame(rows, self.SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        stream = spark.readStream.schema(self.SCHEMA).parquet(str(src))

        def sink(batch_df, _batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            funnel_stream(stream, self.STEPS)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def test_matches_batch_funnel_across_microbatches(self, spark, tmp_path):
        """Stage completions spanning a micro-batch boundary (and a
        query restart — each run_batch is a fresh query on the same
        checkpoint) must match the batch fold exactly, including the
        out-of-order step that must NOT fire and the each-stage-
        fires-once rule."""
        from datetime import datetime, timedelta

        from documents_vector_search_spark.operators.funnel import (
            funnel_stage_times,
        )

        src = tmp_path / "fn_events"
        src.mkdir()
        ckpt = str(tmp_path / "fn_ckpt")
        out = str(tmp_path / "fn_out")
        base = datetime(2024, 1, 1)

        def at(s):
            return base + timedelta(seconds=s)

        # u1 completes across the boundary; u2 clicks BEFORE viewing
        # (click must not fire), then converts properly; u3 stalls
        b1 = [
            (1, "u1", at(0), "view"),
            (2, "u1", at(10), "click"),
            (3, "u2", at(0), "click"),
            (4, "u2", at(20), "view"),
            (5, "u3", at(0), "view"),
        ]
        b2 = [
            (6, "u1", at(30), "purchase"),
            (7, "u2", at(40), "click"),
            (8, "u1", at(50), "view"),  # repeat after completion: no-op
            (9, "u3", at(60), "view"),  # repeat of stage 1: no re-fire
        ]
        self._run_batch(spark, b1, src, ckpt, out)
        self._run_batch(spark, b2, src, ckpt, out)

        streamed = spark.read.parquet(out).collect()
        got = {}
        for r in streamed:
            key = (r.user_id, r.stage)
            assert key not in got, f"stage fired twice: {key}"
            got[key] = r.stage_ts

        batch = funnel_stage_times(
            spark.createDataFrame(b1 + b2, self.SCHEMA), self.STEPS
        ).collect()
        expected = {
            (r.user, i + 1): ts
            for r in batch
            for i, ts in enumerate(r.stage_ts)
            if ts is not None
        }
        assert got == expected
        assert ("u2", 2) in got  # the cross-batch stage-2 fill
        assert ("u3", 2) not in got

    def test_late_event_does_not_rewrite_history(self, spark, tmp_path):
        """An event arriving a batch late but event-time-earlier than
        absorbed state is dropped — no retroactive stage fill."""
        from datetime import datetime, timedelta

        src = tmp_path / "fn_late"
        src.mkdir()
        ckpt = str(tmp_path / "fn_late_ckpt")
        out = str(tmp_path / "fn_late_out")
        base = datetime(2024, 1, 1)

        self._run_batch(
            spark, [(1, "u1", base + timedelta(seconds=60), "click")],
            src, ckpt, out,
        )
        # the view that WOULD have enabled the click, arriving late
        self._run_batch(spark, [(2, "u1", base, "view")], src, ckpt, out)
        self._run_batch(
            spark,
            [(3, "u1", base + timedelta(seconds=120), "view")],
            src, ckpt, out,
        )

        rows = spark.read.parquet(out).collect()
        got = {(r.user_id, r.stage) for r in rows}
        # the late view dropped; the on-time view fires stage 1; the
        # click preceded it so stage 2 never fires
        assert got == {("u1", 1)}


class TestDauStream:
    """Streaming KMV DAU (stateful.py::dau_stream): bounded O(k) state
    per day, refined per micro-batch, and the FINAL per-day estimate
    equals the batch dau_kmv sketch bit-exactly — across micro-batches
    and a query restart (each _run_batch is a fresh query on the same
    checkpoint)."""

    SCHEMA = (
        "event_id long, ts timestamp, user_id string,"
        " event_type string, value double"
    )

    def _run_batch(self, spark, rows, src, ckpt, out, k=256):
        from pyspark.sql import functions as F

        from documents_vector_search_spark.streaming.stateful import (
            dau_stream,
        )

        spark.createDataFrame(rows, self.SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        stream = spark.readStream.schema(self.SCHEMA).parquet(str(src))

        def sink(batch_df, batch_id):
            batch_df.withColumn("_b", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out)

        q = (
            dau_stream(stream, k=k)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def test_final_estimates_match_batch_kmv(self, spark, tmp_path):
        from datetime import datetime

        from pyspark.sql import functions as F

        from documents_vector_search_spark.operators.timeseries import (
            dau_kmv,
        )

        src = tmp_path / "dau_events"
        src.mkdir()
        ckpt = str(tmp_path / "dau_ckpt")
        out = str(tmp_path / "dau_out")

        def at(d, h, u):
            return datetime(2024, 1, d, h)

        # day 1 users split ACROSS batches (sketch must merge), day 2
        # only in batch 2; repeats must not change the sketch
        b1 = [
            (i, datetime(2024, 1, 1, i % 24), f"u{i % 4}", "a", 1.0)
            for i in range(8)
        ]
        b2 = [
            (100 + i, datetime(2024, 1, 1, i % 24), f"u{i % 7}", "a", 1.0)
            for i in range(14)
        ] + [
            (200 + i, datetime(2024, 1, 2, i % 24), f"u{i % 3}", "a", 1.0)
            for i in range(6)
        ]
        self._run_batch(spark, b1, src, ckpt, out, k=5)
        self._run_batch(spark, b2, src, ckpt, out, k=5)

        streamed = spark.read.parquet(out)
        # the contract: downstream upserts on day — take the LAST
        # emitted row per day
        last = {
            r.day: (r.k_used, r.est_dau)
            for r in streamed.withColumn(
                "_rn",
                F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("day")
                    .orderBy(F.col("_b").desc())
                ),
            )
            .filter(F.col("_rn") == 1)
            .collect()
        }
        batch = {
            r.day: (r.k_used, r.est_dau)
            for r in dau_kmv(
                spark.createDataFrame(b1 + b2, self.SCHEMA), k=5
            ).collect()
        }
        assert last == batch
        # day 1 has 7 distinct users but k=5 caps the sketch
        day1 = [d for d in last if d.day == 1][0]
        assert last[day1][0] == 5
        # refinement really happened: batch 1's day-1 row differs from
        # the final (4 users then 7 through a k=5 sketch)
        day1_rows = streamed.filter(F.col("day") == F.lit(day1)).collect()
        assert len(day1_rows) == 2
