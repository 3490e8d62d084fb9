"""Bucket-scoped compaction (collection/compactor.py): fragmented
update buckets collapse to one file per partition directory; untouched
buckets stay bit-identical; results are unchanged."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.collection import (
    Collection,
    CollectionSearcher,
    compact_collection,
    create_collection,
    update_collection,
)
from documents_vector_search_spark.collection.compactor import (
    bucket_file_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (
            f"doc-{i}",
            f"file:///corpus/doc-{i}.txt",
            {"lang": "en"},
            f"document {i} about broadcast hash join tuning " * 5,
            "2024-03-01 00:00:00",
            "files",
        )
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows,
        "id STRING, url STRING, metadata MAP<STRING,STRING>, text STRING, "
        "last_modified_at STRING, source_type STRING",
    ).withColumn("last_modified_at", F.col("last_modified_at").cast("timestamp"))


@pytest.fixture(scope="module")
def fragmented(spark, docs, tmp_path_factory):
    """Create, then update the SAME doc three times: its bucket's dirs
    accumulate one extra file per update."""
    base = str(tmp_path_factory.mktemp("compact"))
    coll = Collection(spark, base, "frag")
    create_collection(coll, docs, chunk_size=120, chunk_overlap=20)
    one = docs.filter(F.col("id") == "doc-3")
    for i in range(3):
        update_collection(
            coll, one.withColumn("text", F.concat(F.lit(f"v{i} "), "text"))
        )
    return coll


def _inventory(root: Path) -> dict[str, tuple[int, float]]:
    return {
        str(p.relative_to(root)): (p.stat().st_size, p.stat().st_mtime)
        for p in root.rglob("*.parquet")
        if p.is_file()
    }


class TestCompaction:
    def test_compact_restores_one_file_per_dir(self, fragmented):
        chunks_root = Path(fragmented.table_path("chunks"))
        before = bucket_file_counts(chunks_root)
        assert any(c["max_per_dir"] > 1 for c in before.values()), (
            "fixture should be fragmented"
        )
        counts_before = fragmented.counts()
        untouched_before = {
            t: {
                k: v
                for k, v in _inventory(Path(fragmented.table_path(t))).items()
                if not any(
                    f"_pb={pb}/" in k or k.startswith(f"_pb={pb}")
                    for pb, c in bucket_file_counts(
                        Path(fragmented.table_path(t))
                    ).items()
                    if c["max_per_dir"] > 1
                )
            }
            for t in ("chunks", "documents")
        }

        report = compact_collection(fragmented)
        assert "chunks" in report
        assert report["chunks"]["files_after"] < report["chunks"]["files_before"]

        after = bucket_file_counts(Path(fragmented.table_path("chunks")))
        assert all(c["max_per_dir"] == 1 for c in after.values())
        # row counts unchanged in every table
        assert fragmented.counts() == counts_before
        # files in non-fragmented buckets are bit-untouched
        for t, inv in untouched_before.items():
            now = _inventory(Path(fragmented.table_path(t)))
            for k, v in inv.items():
                assert now.get(k) == v, f"{t}/{k} was rewritten"

    def test_search_unchanged_after_compact(self, fragmented):
        s = CollectionSearcher(fragmented)
        got = s.search("broadcast hash join", max_documents=5).collect()
        assert len(got) > 0
        # doc-3 carries its LAST update's text (delete-then-reinsert)
        from documents_vector_search_spark.collection import (
            fetch_document_lines,
        )

        row = fetch_document_lines(fragmented, "doc-3", 1, 2)
        assert "v2 " in row["text_slice"]

    def test_second_compact_is_noop(self, fragmented):
        assert compact_collection(fragmented) == {}

    def test_multi_writer_output(self, spark, docs, tmp_path):
        """output_files_per_dir spreads a rewritten directory across
        several writers — the production knob for ~100 GB buckets."""
        coll = Collection(spark, str(tmp_path), "multi")
        create_collection(coll, docs, chunk_size=120, chunk_overlap=20,
                          update_buckets=2)
        one = docs.filter(F.col("id") == "doc-1")
        for i in range(4):
            update_collection(
                coll, one.withColumn("text", F.concat(F.lit(f"m{i} "), "text"))
            )
        n_before = coll.read("chunks").count()
        report = compact_collection(
            coll, max_files_per_dir=2, output_files_per_dir=2
        )
        assert "chunks" in report
        counts = bucket_file_counts(Path(coll.table_path("chunks")))
        assert all(c["max_per_dir"] <= 2 for c in counts.values())
        assert coll.read("chunks").count() == n_before

    def test_compacts_layout_tables_preserving_pruning(
        self, spark, docs, tmp_path
    ):
        """ANN-layout embeddings carry bucket=*/_pb=* sibling levels:
        compaction must rewrite fragmented buckets one-file-per-dir
        while query-side partition pruning keeps working."""
        coll = Collection(spark, str(tmp_path), "annfrag")
        create_collection(
            coll, docs, chunk_size=120, chunk_overlap=20, ann_planes=2
        )
        one = docs.filter(F.col("id") == "doc-5")
        for i in range(2):
            update_collection(
                coll, one.withColumn("text", F.concat(F.lit(f"a{i} "), "text"))
            )
        emb_root = Path(coll.table_path("embeddings"))
        assert any(
            c["max_per_dir"] > 1 for c in bucket_file_counts(emb_root).values()
        )
        report = compact_collection(coll)
        assert "embeddings" in report
        assert all(
            c["max_per_dir"] == 1
            for c in bucket_file_counts(emb_root).values()
        )
        s = CollectionSearcher(coll)
        hits = s._vector_hits("broadcast join", 10, None)
        plan = hits._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "bucket" in plan
        assert len(hits.collect()) > 0

    def test_cli_compact_reports(self, fragmented, capsys):
        import json

        from documents_vector_search_spark import cli

        rc = cli.main(
            [
                "compact", "frag", "--base-path",
                str(Path(fragmented.root).parent), "--format", "json",
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out == {"compacted": "nothing to do"}  # already compacted
