"""operators/export.py: deterministic training-shard export."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.hashing import md5_hash64_py
from documents_vector_search_spark.operators.export import (
    assign_shards,
    write_training_shards,
)


@pytest.fixture()
def corpus(spark):
    return spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


class TestAssignShards:
    def test_deterministic_and_uniform(self, corpus):
        a = {r.doc_id: r.shard for r in assign_shards(corpus, "doc_id", 8, seed=1).collect()}
        b = {r.doc_id: r.shard for r in assign_shards(corpus, "doc_id", 8, seed=1).collect()}
        assert a == b
        sizes = [list(a.values()).count(s) for s in range(8)]
        assert min(sizes) > 0 and max(sizes) < 3 * (500 // 8)

    def test_matches_python_twin(self, corpus):
        """Shard/position must be the shared md5 hash family — the
        engine-portability contract that makes the layout reproducible."""
        rows = assign_shards(corpus, "doc_id", 8, seed=1).collect()
        for r in rows[:50]:
            assert r.shard == md5_hash64_py(str(r.doc_id), salt=1) % 8
            assert r._pos == md5_hash64_py(str(r.doc_id), salt=2)

    def test_validation(self, corpus):
        with pytest.raises(ValueError, match="n_shards"):
            assign_shards(corpus, "doc_id", 0)


class TestWriteShards:
    def test_layout_roundtrip_and_file_caps(self, spark, corpus, tmp_path):
        out = str(tmp_path / "shards")
        write_training_shards(
            corpus, out, n_shards=4, id_col="doc_id", seed=3,
            max_records_per_file=50,
        )
        # one directory per shard; every row survives exactly once
        dirs = sorted(p.name for p in Path(out).iterdir() if p.is_dir())
        assert dirs == [f"shard={i}" for i in range(4)]
        back = spark.read.parquet(out)
        assert back.count() == 500
        assert sorted(r.doc_id for r in back.collect()) == list(range(500))
        # file-size cap honored per parquet piece
        for f in Path(out).rglob("*.parquet"):
            assert spark.read.parquet(str(f)).count() <= 50

    def test_within_file_order_is_shuffled_position_order(
        self, spark, corpus, tmp_path
    ):
        """A single parquet piece read alone preserves row order — and
        that order must be the salted-hash permutation, not input order
        (consecutive doc ids would correlate training batches)."""
        out = str(tmp_path / "shards2")
        write_training_shards(corpus, out, n_shards=2, id_col="doc_id", seed=3)
        a_file = next(Path(out).rglob("*.parquet"))
        ids = [r.doc_id for r in spark.read.parquet(str(a_file)).collect()]
        poss = [md5_hash64_py(str(i), salt=4) for i in ids]
        assert poss == sorted(poss)
        assert ids != sorted(ids)  # genuinely permuted


class TestJsonlShards:
    def test_jsonl_format_roundtrip_same_assignment(
        self, spark, corpus, tmp_path
    ):
        """fmt='jsonl' writes gzip NDJSON shard dirs (the trainer-loader
        format) with the IDENTICAL deterministic shard assignment as
        parquet — only the sink changes."""
        outp = str(tmp_path / "shards_pq")
        outj = str(tmp_path / "shards_jl")
        write_training_shards(corpus, outp, n_shards=4, id_col="doc_id", seed=3)
        write_training_shards(
            corpus, outj, n_shards=4, id_col="doc_id", seed=3, fmt="jsonl"
        )
        dirs = sorted(p.name for p in Path(outj).iterdir() if p.is_dir())
        assert dirs == [f"shard={i}" for i in range(4)]
        assert list(Path(outj).rglob("*.json.gz"))  # gzip NDJSON pieces
        back = spark.read.json(outj)
        assert back.count() == 500
        pq_assign = {
            r.doc_id: r.shard
            for r in spark.read.parquet(outp).select("doc_id", "shard").collect()
        }
        jl_assign = {
            int(r.doc_id): int(r.shard)
            for r in back.select("doc_id", "shard").collect()
        }
        assert pq_assign == jl_assign

    def test_unknown_format_rejected(self, corpus, tmp_path):
        with pytest.raises(ValueError, match="unknown shard format"):
            write_training_shards(
                corpus, str(tmp_path / "x"), 2, "doc_id", fmt="csvish"
            )
