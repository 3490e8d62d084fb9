"""Round-2 seams: TOON output, rich-format parser (per-page grouping),
real-embedder UDF path with an injected fake loader, and the
no-persist-leak property of the serving path."""

from __future__ import annotations

import json
from types import SimpleNamespace

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.formatting import format_object, to_toon
from documents_vector_search_spark.sources.files import (
    group_elements_by_page,
    make_unstructured_parser,
    read_files_documents,
)


class TestToon:
    def test_flat_object(self):
        assert to_toon({"a": 1, "b": "x y", "ok": True}) == "a: 1\nb: x y\nok: true"

    def test_uniform_rows_tabular(self):
        rows = [
            {"id": 1, "name": "alpha"},
            {"id": 2, "name": "beta"},
        ]
        got = to_toon({"results": rows})
        assert got.splitlines()[0] == "results[2]{id,name}:"
        assert got.splitlines()[1] == "  1,alpha"

    def test_primitive_array_inline(self):
        assert to_toon({"xs": [1, 2, 3]}) == "xs[3]: 1,2,3"

    def test_quoting_ambiguous_strings(self):
        got = to_toon({"v": "123", "w": "a,b", "t": "true"})
        assert '"123"' in got and '"a,b"' in got and '"true"' in got

    def test_nested_object(self):
        got = to_toon({"outer": {"inner": "v"}})
        assert got == "outer:\n  inner: v"

    def test_format_object_dispatch(self):
        obj = {"k": [1, 2]}
        assert json.loads(format_object(obj, "json")) == obj
        assert json.loads(format_object(obj, "json_with_indent")) == obj
        assert format_object(obj, "toon") == "k[2]: 1,2"
        with pytest.raises(ValueError, match="Unsupported"):
            format_object(obj, "yaml")


def _el(text, page=None):
    return SimpleNamespace(text=text, metadata=SimpleNamespace(page_number=page))


class TestRichParserSeam:
    def test_group_elements_no_pages(self):
        parts = group_elements_by_page([_el("first"), _el("second")])
        assert parts == [{"text": "first\n\nsecond"}]

    def test_group_elements_by_page(self):
        # mirror of reference files_document_reader.py:239-258
        parts = group_elements_by_page(
            [_el("p1a", 1), _el("p1b", 1), _el("p2", 2)]
        )
        assert parts == [
            {"metadata": {"pageNumber": 1}, "text": "p1a\n\np1b"},
            {"metadata": {"pageNumber": 2}, "text": "p2"},
        ]

    def test_group_elements_empty(self):
        assert group_elements_by_page([]) == []

    def test_unstructured_parser_factory_with_fake_partition(self):
        def fake_partition(file):
            data = file.read()
            assert data.startswith(b"%PDF")
            return [_el("page one", 1), _el("page two", 2)]

        parser = make_unstructured_parser(partition=fake_partition)
        parts = parser(b"%PDF-1.4 fake", "a/b.pdf")
        assert [p["metadata"]["pageNumber"] for p in parts] == [1, 2]

    def test_read_files_routes_rich_formats_through_parser(self, spark, tmp_path):
        (tmp_path / "doc.pdf").write_bytes(b"%PDF binary \xff\xfe junk")
        (tmp_path / "note.txt").write_text("plain note")

        # self-contained parser: executors can't import the test module
        def fake_parser(content, rel):
            return [
                {"metadata": {"pageNumber": 1}, "text": "PARSED"},
                {"metadata": {"pageNumber": 2}, "text": "CONTENT"},
            ]

        docs = read_files_documents(
            spark,
            str(tmp_path),
            blacklist=["png"],  # keep .pdf past the binary blacklist
            parser=fake_parser,
        )
        rows = {r.id: r for r in docs.collect()}
        # reference files_document_converter.py:29-34: parsed parts are
        # joined with "" then prefixed "<rel_path>\n\n"
        assert rows["doc.pdf"].text == "doc.pdf\n\nPARSEDCONTENT"
        assert rows["note.txt"].text == "note.txt\n\nplain note"

    def test_parser_failure_degrades_to_title_only_text(self, spark, tmp_path):
        (tmp_path / "bad.pdf").write_bytes(b"%PDF broken")

        def exploding(content, rel):
            raise RuntimeError("corrupt file")

        docs = read_files_documents(
            spark, str(tmp_path), blacklist=["png"], parser=exploding
        )
        rows = docs.collect()
        # empty content is falsy-filtered by the reference's
        # convert_to_text, leaving only the path line
        assert len(rows) == 1 and rows[0].text == "bad.pdf"


class TestEmbedderUdfSeam:
    """The production embedding path (reference
    main/indexes/embeddings/sentence_embeder.py:10-14 + the
    indexer_factory model cache) exercised end-to-end with an injected
    fake loader — build a collection through the UDF and search it."""

    def test_collection_build_and_search_via_udf(self, spark, tmp_path):
        from documents_vector_search_spark.collection import (
            Collection,
            CollectionSearcher,
            create_collection,
        )
        from documents_vector_search_spark.operators import embedding as emb_mod
        from documents_vector_search_spark.operators.embedding import (
            make_embedder_udf,
        )

        class FakeModel:
            dim = 16

            def encode(self, texts):
                # deterministic, content-sensitive vectors
                return [
                    [float((len(t) + i) % 7) for i in range(self.dim)]
                    for t in texts
                ]

        loads = []

        def loader(name):
            loads.append(name)
            return FakeModel()

        emb_mod._MODEL_CACHE.clear()
        udf = make_embedder_udf("fake-model", loader=loader)

        docs = spark.createDataFrame(
            [
                ("d1", "u1", {"k": "v"}, "alpha beta gamma", None, "t"),
                ("d2", "u2", {"k": "v"}, "delta epsilon", None, "t"),
            ],
            "id string, url string, metadata map<string,string>, text string, "
            "last_modified_at timestamp, source_type string",
        )
        coll = Collection(spark, str(tmp_path), "udfc")
        create_collection(coll, docs, chunk_size=50, chunk_overlap=5,
                          embedder=lambda c: udf(c))
        emb = coll.read("embeddings")
        assert emb.count() == coll.read("chunks").count()
        assert len(emb.first().vector) == 16

        s = CollectionSearcher(coll, embedding_dim=16)
        got = s.search("alpha beta", indexes=("bm25",)).collect()
        assert len(got) > 0

    def test_model_cache_is_per_process(self):
        from documents_vector_search_spark.operators import embedding as emb_mod

        emb_mod._MODEL_CACHE.clear()
        calls = []

        def loader(name):
            calls.append(name)
            return SimpleNamespace(encode=lambda ts: [[0.0] for _ in ts])

        import pandas as pd

        udf = emb_mod.make_embedder_udf("m1", loader=loader)
        fn = udf.func
        fn(pd.Series(["a"]))
        fn(pd.Series(["b"]))
        assert calls == ["m1"]  # loaded once, cached thereafter


class TestNoPersistLeak:
    def test_repeated_searches_leave_no_cached_rdds(self, spark, tmp_path):
        from documents_vector_search_spark.collection import (
            Collection,
            CollectionSearcher,
            create_collection,
        )

        docs = spark.createDataFrame(
            [
                ("d%d" % i, "u", {"k": "v"}, f"hash join text {i}", None, "t")
                for i in range(20)
            ],
            "id string, url string, metadata map<string,string>, text string, "
            "last_modified_at timestamp, source_type string",
        )
        coll = Collection(spark, str(tmp_path), "leak")
        create_collection(coll, docs, chunk_size=50, chunk_overlap=5)

        # compare RDD-id SETS, not sizes: the ContextCleaner may
        # asynchronously unpersist OTHER tests' dead cached frames
        # between the two probes (a size comparison flakes); what this
        # test pins is that search ADDS nothing
        def persistent_ids() -> set:
            m = spark.sparkContext._jsc.sc().getPersistentRDDs()
            it = m.keysIterator()
            ids = set()
            while it.hasNext():
                ids.add(it.next())
            return ids

        before = persistent_ids()
        s = CollectionSearcher(coll)  # cache_tables OFF: one-shot mode
        for _ in range(3):
            s.search("hash join", max_chunks=5).collect()
        assert persistent_ids() - before == set()
