"""Record-dataset source (sources/datasets.py): JSONL/CSV/Parquet rows
→ canonical documents, plus the create-dataset CLI end-to-end."""

from __future__ import annotations

import json

import pytest

from documents_vector_search_spark.sources.datasets import (
    read_dataset_documents,
)

ROWS = [
    {"rec_id": "a1", "body": "broadcast hash join beats shuffle join",
     "lang": "en", "stars": 5},
    {"rec_id": "b2", "body": "la jointure distribuée", "lang": "fr", "stars": 3},
]


@pytest.fixture(scope="module")
def jsonl_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    p = d / "corpus.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in ROWS))
    return str(p)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds_csv")
    p = d / "corpus.csv"
    p.write_text(
        "rec_id,body,lang,stars\n"
        + "\n".join(f"{r['rec_id']},{r['body']},{r['lang']},{r['stars']}" for r in ROWS)
    )
    return str(p)


class TestProjection:
    def test_jsonl_to_canonical(self, spark, jsonl_path):
        docs = read_dataset_documents(
            spark, jsonl_path, fmt="jsonl", id_col="rec_id", text_col="body",
            metadata_cols=["lang", "stars"],
        ).collect()
        by_id = {r.id: r for r in docs}
        assert set(by_id) == {"a1", "b2"}
        assert by_id["a1"].url == "dataset://a1"
        assert by_id["a1"].metadata == {"lang": "en", "stars": "5"}
        assert by_id["a1"].last_modified_at is None
        assert by_id["a1"].source_type == "dataset"
        # schema matches the canonical document contract
        from documents_vector_search_spark.collection.catalog import (
            DOCUMENT_SCHEMA,
        )

        expected = spark.createDataFrame([], DOCUMENT_SCHEMA).schema
        got = read_dataset_documents(
            spark, jsonl_path, fmt="jsonl", id_col="rec_id", text_col="body"
        ).schema
        assert [f.name for f in got.fields] == [f.name for f in expected.fields]
        assert [f.dataType for f in got.fields] == [
            f.dataType for f in expected.fields
        ]

    def test_csv_with_explicit_schema(self, spark, csv_path):
        docs = read_dataset_documents(
            spark, csv_path, fmt="csv", id_col="rec_id", text_col="body",
            schema="rec_id STRING, body STRING, lang STRING, stars INT",
        ).collect()
        assert {r.id for r in docs} == {"a1", "b2"}

    def test_missing_required_column_raises(self, spark, jsonl_path):
        with pytest.raises(ValueError, match="lacks required column"):
            read_dataset_documents(spark, jsonl_path, fmt="jsonl", id_col="nope")

    def test_unknown_format_rejected(self, spark, jsonl_path):
        with pytest.raises(ValueError, match="unsupported dataset format"):
            read_dataset_documents(spark, jsonl_path, fmt="xml")


class TestCLI:
    def test_create_dataset_and_search(self, spark, jsonl_path, tmp_path, capsys):
        from documents_vector_search_spark import cli

        rc = cli.main(
            [
                "create-dataset", "ds", "--base-path", str(tmp_path),
                "--path", jsonl_path, "--dataset-format", "jsonl",
                "--id-col", "rec_id", "--text-col", "body",
                "--metadata-cols", "lang", "--chunk-size", "100",
                "--chunk-overlap", "10", "--format", "json",
            ]
        )
        assert rc == 0
        manifest = json.loads(capsys.readouterr().out)
        assert manifest["numberOfDocuments"] == 2
        assert manifest["reader"]["name"] == "dataset"
        rc = cli.main(
            [
                "search", "ds", "--base-path", str(tmp_path),
                "broadcast join", "--filter", 'lang = "en"', "--format", "json",
            ]
        )
        assert rc == 0
        hits = json.loads(capsys.readouterr().out)
        assert len(hits) >= 1 and hits[0]["document_id"] == "a1"

        # manifest-driven `update` re-merges the (unchanged-signal-less)
        # dataset idempotently: counts stay identical
        rc = cli.main(
            ["update", "ds", "--base-path", str(tmp_path), "--format", "json"]
        )
        assert rc == 0
        updated = json.loads(capsys.readouterr().out)
        assert updated["numberOfDocuments"] == 2
