"""Real-library integration tests for the optional-dependency seams.

Every optional integration (sentence-transformers, unstructured, mcp —
pyproject.toml extras) is an injectable seam with fake-backed unit
tests elsewhere in the suite. These tests exercise the REAL libraries
through the exact same seams, and `importorskip` out cleanly where the
extra isn't installed — so `pip install .[all]` environments get true
end-to-end coverage while the base container stays green.

Reference capabilities being integration-checked: real model embedding
(main/indexes/embeddings/sentence_embeder.py:10-14), rich-format
parsing via unstructured (main/sources/files/files_document_reader.py:
227-231), and the MCP tool surface
(collection_search_unified_mcp_adapter.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestSentenceTransformersIntegration:
    def test_default_loader_embeds_real_model(self, spark):
        pytest.importorskip("sentence_transformers")
        from documents_vector_search_spark.operators.embedding import (
            make_embedder_udf,
        )

        embed = make_embedder_udf("sentence-transformers/all-MiniLM-L6-v2")
        df = spark.createDataFrame(
            [("a", "spark is a distributed engine"),
             ("b", "minhash finds near duplicates")],
            ["id", "text"],
        ).withColumn("vec", embed(F.col("text")))
        rows = {r.id: r.vec for r in df.collect()}
        # MiniLM-L6-v2 is 384-dim; distinct texts embed to distinct vectors
        assert len(rows["a"]) == 384 and len(rows["b"]) == 384
        assert rows["a"] != rows["b"]
        assert all(isinstance(x, float) for x in rows["a"])

    def test_real_model_collection_roundtrip(self, spark, tmp_path):
        """create → search with a real embedder: the manifest records the
        model identity and the searcher reuses the same vector space."""
        pytest.importorskip("sentence_transformers")
        from documents_vector_search_spark.collection.catalog import Collection
        from documents_vector_search_spark.collection.creator import (
            create_collection,
        )
        from documents_vector_search_spark.collection.searcher import (
            CollectionSearcher,
        )
        from documents_vector_search_spark.operators.embedding import (
            make_embedder_udf,
        )

        docs = spark.createDataFrame(
            [
                ("d1", None, {}, "the cat sat on the warm windowsill",
                 None, "files"),
                ("d2", None, {}, "distributed query engines shuffle data",
                 None, "files"),
            ],
            "id string, url string, metadata map<string,string>, "
            "text string, last_modified_at timestamp, source_type string",
        )
        coll = Collection(spark, str(tmp_path), "real-model")
        embed = make_embedder_udf("sentence-transformers/all-MiniLM-L6-v2")
        create_collection(
            coll, docs, embedder=lambda c: embed(c), embedding_dim=384,
            embedder_tag="sentence-transformers/all-MiniLM-L6-v2",
        )
        s = CollectionSearcher(coll)
        hits = s.search("feline by the window", indexes=("vector",)).collect()
        assert hits and hits[0].document_id == "d1"


class TestUnstructuredIntegration:
    def test_real_partition_parses_text_bytes(self):
        pytest.importorskip("unstructured")
        from documents_vector_search_spark.sources.files import (
            make_unstructured_parser,
        )

        parser = make_unstructured_parser()
        parts = parser(b"Hello world.\n\nSecond paragraph.", "note.txt")
        assert parts and all("text" in p for p in parts)
        joined = "\n".join(p["text"] for p in parts)
        assert "Hello world" in joined

    def test_real_partition_through_files_source(self, spark, tmp_path):
        pytest.importorskip("unstructured")
        from documents_vector_search_spark.sources.files import (
            make_unstructured_parser,
            read_files_documents,
        )

        (tmp_path / "doc.txt").write_text("Plain text body.")
        docs = read_files_documents(
            spark,
            str(tmp_path),
            parser=make_unstructured_parser(),
            parser_extensions={".txt"},
        ).collect()
        assert len(docs) == 1
        assert "Plain text body" in docs[0].text


class TestMcpIntegration:
    def test_real_fastmcp_registers_tools(self, spark, tmp_path):
        """build_mcp_app against the real FastMCP class: both tools
        (search, fetch) must register with their full signatures."""
        pytest.importorskip("mcp")
        import anyio
        from mcp.server.fastmcp import FastMCP

        from documents_vector_search_spark.serving import (
            CollectionRegistry,
            build_mcp_app,
        )

        registry = CollectionRegistry(spark, str(tmp_path))
        app = build_mcp_app(registry, FastMCP)
        tools = anyio.run(app.list_tools)
        names = {t.name for t in tools}
        assert names == {"search", "fetch"}
