"""MCP serving layer: search/fetch tools over a shared SparkSession.

Spark-first re-expression of the reference's unified MCP adapter
(collection_search_unified_mcp_adapter.py): discover collections by
scanning manifests (lines 52-76), cache a searcher per collection
behind a lock (176-189), expose ``search_in_collection`` (193-213,
validation: collection exists, query-or-filter required, chunk cap 100)
and ``fetch_from_collection`` (215-227).

The ``mcp`` package is not installed in this container, so the tool
functions are plain Python (fully tested) and ``serve_mcp`` wires them
into FastMCP only when the import succeeds — a thin driver process
owning one long-lived SparkSession (SURVEY §3.4).
"""

from __future__ import annotations

import threading
from pathlib import Path

from pyspark.sql import SparkSession

from documents_vector_search_spark.collection import (
    Collection,
    CollectionSearcher,
    fetch_document_lines,
)

DEFAULT_MAX_CHUNKS = 50
MAX_CHUNKS_CAP = 100
DEFAULT_FETCH_END_LINE = 250


class CollectionRegistry:
    """Manifest discovery + per-collection searcher cache.

    ``cache_tables=True`` (default): searchers persist their index
    tables in executor memory — right for a long-lived serving process
    (measured at sf0.01, local[32]: steady-state hybrid search 1.0-1.6s
    cached vs 1.8-2.4s re-reading parquet per query). After an external
    update/delete/compact of a served collection, call
    :meth:`refresh` — cached frames otherwise keep serving the
    pre-mutation rows (see CollectionSearcher.refresh).

    :meth:`warm` pays the first-query cost at STARTUP: the very first
    search in a fresh JVM costs ~9-11s at sf0.01 regardless of layout
    (whole-stage-codegen compilation + JVM JIT + parquet listing — NOT
    quantization-specific; flat measures the same), while every later
    query with a fresh query string costs ~1-1.6s (literals recompile
    per query, but the JIT'd compiler and listed files are hot). A
    serving process that warms at startup serves its first user query
    in ~1.5s instead of ~10s.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        cache_tables: bool = True,
    ):
        self.spark = spark
        self.base_path = base_path
        self.cache_tables = cache_tables
        self._searchers: dict[str, CollectionSearcher] = {}
        self._lock = threading.Lock()

    def list_collections(self) -> list[dict]:
        found = []
        base = Path(self.base_path)
        if not base.exists():
            return found
        for manifest_path in sorted(base.glob("*/manifest.json")):
            coll = Collection(self.spark, self.base_path, manifest_path.parent.name)
            m = coll.manifest()
            found.append(
                {
                    "name": m.collectionName,
                    "numberOfDocuments": m.numberOfDocuments,
                    "numberOfChunks": m.numberOfChunks,
                    "updatedTime": m.updatedTime,
                }
            )
        return found

    def searcher(self, name: str) -> CollectionSearcher:
        with self._lock:
            if name not in self._searchers:
                coll = Collection(self.spark, self.base_path, name)
                if not coll.exists():
                    raise KeyError(f"collection does not exist: {name}")
                self._searchers[name] = CollectionSearcher(
                    coll, cache_tables=self.cache_tables
                )
            return self._searchers[name]

    def refresh(self, name: str | None = None) -> None:
        """Drop cached tables/configs so the next search sees the
        collection's CURRENT on-disk state — call after an external
        update / delete / refit / compact. ``name=None`` refreshes
        every cached searcher."""
        with self._lock:
            targets = (
                [self._searchers[name]]
                if name is not None and name in self._searchers
                else list(self._searchers.values())
                if name is None
                else []
            )
        for s in targets:
            s.refresh()

    def warm(self, names: list[str] | None = None) -> dict[str, float]:
        """Run one representative hybrid search per collection so the
        FIRST user query doesn't pay JVM/codegen/listing cold-start
        (class docstring has the measurements). Returns per-collection
        warmup seconds. Failures are swallowed per collection — a
        corrupt collection must not stop the server from starting."""
        import time

        if names is None:
            names = [c["name"] for c in self.list_collections()]
        took: dict[str, float] = {}
        for name in names:
            t0 = time.time()
            try:
                self.searcher(name).search(
                    "warmup probe query", max_chunks=1
                ).collect()
                took[name] = round(time.time() - t0, 3)
            except Exception:  # noqa: BLE001 — warmup is best-effort
                took[name] = float("nan")
        return took

    def collection(self, name: str) -> Collection:
        coll = Collection(self.spark, self.base_path, name)
        if not coll.exists():
            raise KeyError(f"collection does not exist: {name}")
        return coll


def search_in_collection(
    registry: CollectionRegistry,
    collection: str,
    query: str = "",
    metadata_filter: str | None = None,
    max_chunks: int = DEFAULT_MAX_CHUNKS,
    max_documents: int | None = None,
    diversify_lambda: float | None = None,
    include_snippets: bool = False,
    expand_query: bool = False,
    indexes: tuple[str, ...] | list[str] | None = None,
    fuzzy: bool = False,
    ranker: str = "bm25",
) -> list[dict]:
    """Tool: hybrid search. Mirrors the reference's validation
    (collection_search_unified_mcp_adapter.py:202-212): query or filter
    required; chunk count capped. ``diversify_lambda`` (None = off)
    routes through the MMR-diversified ranking; ``include_snippets``
    adds each hit's best matching line; ``expand_query`` turns on
    relevance feedback in both branches (RM3 for BM25, Rocchio for
    the vector index). ``indexes`` selects branches — ("vector",
    "bm25") default, plus "phrase" on positional collections; a
    filter-only call (empty query) ignores it. ``fuzzy``
    spell-corrects the query against the collection vocabulary
    first."""
    if not query and not metadata_filter:
        raise ValueError("either query or metadata_filter is required")
    max_chunks = min(max_chunks, MAX_CHUNKS_CAP)
    searcher = registry.searcher(collection)
    kwargs = {}
    if indexes:
        kwargs["indexes"] = tuple(indexes)
    result = searcher.search(
        query,
        max_chunks=max_chunks,
        max_documents=max_documents,
        metadata_filter=metadata_filter,
        diversify_lambda=diversify_lambda,
        include_snippets=include_snippets,
        expand_query=expand_query,
        fuzzy=fuzzy,
        ranker=ranker,
        **kwargs,
    )
    return [r.asDict(recursive=True) for r in result.collect()]


def suggest_in_collection(
    registry: CollectionRegistry,
    collection: str,
    query: str,
    max_edits: int = 1,
) -> list[dict]:
    """Tool: per-term 'did you mean' suggestions against the
    collection vocabulary (CollectionSearcher.suggest)."""
    if not query:
        raise ValueError("query is required")
    searcher = registry.searcher(collection)
    rows = searcher.suggest(query, max_edits=max_edits).collect()
    return [r.asDict(recursive=True) for r in rows]


def complete_in_collection(
    registry: CollectionRegistry,
    collection: str,
    prefix: str,
    k: int = 10,
) -> list[dict]:
    """Tool: prefix autocomplete over the collection vocabulary — the
    materialized vocab table when present, postings-derived otherwise
    (same resolution as the CLI `complete` command)."""
    if not prefix:
        raise ValueError("prefix is required")
    from documents_vector_search_spark.operators.fuzzy import (
        build_term_dictionary,
        suggest_prefix,
    )

    coll = registry.collection(collection)
    try:
        has_vocab = bool(coll.manifest().converter.get("fuzzy"))
    except FileNotFoundError:
        has_vocab = False
    if has_vocab:
        from documents_vector_search_spark.collection.fuzzy_artifacts import (
            read_vocab,
        )

        vocab = read_vocab(coll)  # base + delta-log fold
    else:
        vocab = build_term_dictionary(
            coll.read("postings").select("chunk_id", "term", "tf")
        )
    return [
        r.asDict(recursive=True) for r in suggest_prefix(vocab, prefix, k).collect()
    ]


def facets_in_collection(
    registry: CollectionRegistry,
    collection: str,
    fields: list[str],
    query: str = "",
    metadata_filter: str | None = None,
) -> list[dict]:
    """Tool: facet panel — per-field value counts over the document
    match-set (CollectionSearcher.facet_counts). ``fields`` resolve to
    direct document columns first, then metadata keys."""
    if not fields:
        raise ValueError("at least one facet field is required")
    searcher = registry.searcher(collection)
    rows = searcher.facet_counts(
        fields, query=query, metadata_filter=metadata_filter
    ).collect()
    return [r.asDict(recursive=True) for r in rows]


def search_many_in_collection(
    registry: CollectionRegistry,
    collection: str,
    queries: list[str],
    metadata_filter: str | None = None,
    max_chunks: int = DEFAULT_MAX_CHUNKS,
    max_documents: int | None = None,
    diversify_lambda: float | None = None,
) -> dict[str, list[dict]]:
    """Tool: batch hybrid search — all queries answered in ONE Spark
    job (one scan per index, CollectionSearcher.search_many); results
    keyed ``q0..qN`` in input order. ``diversify_lambda`` (None = off)
    swaps in the batched MMR rerank — Q diverse searches still pay one
    retrieval pass per index."""
    if not queries:
        raise ValueError("at least one query is required")
    max_chunks = min(max_chunks, MAX_CHUNKS_CAP)
    searcher = registry.searcher(collection)
    texts = {f"q{i}": q for i, q in enumerate(queries)}
    rows = searcher.search_many(
        texts,
        max_chunks=max_chunks,
        max_documents=max_documents,
        metadata_filter=metadata_filter,
        diversify_lambda=diversify_lambda,
    ).collect()
    out: dict[str, list[dict]] = {qid: [] for qid in texts}
    for r in rows:
        d = r.asDict(recursive=True)
        out[d.pop("qid")].append(d)
    return out


def fetch_from_collection(
    registry: CollectionRegistry,
    collection: str,
    document_id: str,
    start_line: int = 1,
    end_line: int = DEFAULT_FETCH_END_LINE,
) -> dict:
    """Tool: point fetch with line range (MCP default 1-250,
    collection_search_mcp_stdio_adapter.py:62)."""
    return fetch_document_lines(
        registry.collection(collection), document_id, start_line, end_line
    )


def search_documents_in_collection(
    registry: CollectionRegistry,
    collection: str,
    query: str,
    k: int = 10,
    title_weight: float = 2.0,
    body_weight: float = 1.0,
    metadata_filter: str | None = None,
) -> list[dict]:
    """Tool: document-level BM25F over the chunk-0-is-title topology
    (collection/searcher.py::search_documents_bm25f)."""
    if not query:
        raise ValueError("query is required")
    rows = (
        registry.searcher(collection)
        .search_documents_bm25f(
            query,
            k=k,
            weights={"title": float(title_weight), "body": float(body_weight)},
            metadata_filter=metadata_filter,
        )
        .collect()
    )
    return [r.asDict(recursive=True) for r in rows]


def similar_documents_in_collection(
    registry: CollectionRegistry,
    collection: str,
    document_id: str,
    k: int = 10,
    method: str = "vector",
    max_terms: int = 10,
    metadata_filter: str | None = None,
) -> list[dict]:
    """Tool: more-like-this — documents most similar to a stored one
    (collection/searcher.py::more_like_this; vector pooling or tf·idf
    term selection + disjunctive BM25F)."""
    rows = (
        registry.searcher(collection)
        .more_like_this(
            document_id,
            k=k,
            method=method,
            max_terms=max_terms,
            metadata_filter=metadata_filter,
        )
        .collect()
    )
    return [r.asDict(recursive=True) for r in rows]


def build_mcp_app(registry: CollectionRegistry, fastmcp_cls):
    """Wire the two tools into a FastMCP-style app class (injectable for
    tests; the real class comes from ``mcp.server.fastmcp``). Mirrors the
    reference's unified MCP adapter tool surface
    (collection_search_unified_mcp_adapter.py)."""
    app = fastmcp_cls("documents-vector-search-spark")

    @app.tool()
    def search(collection: str, query: str = "", filter: str | None = None,
               max_chunks: int = DEFAULT_MAX_CHUNKS,
               max_documents: int | None = None,
               diversify_lambda: float | None = None,
               include_snippets: bool = False,
               expand_query: bool = False,
               indexes: list[str] | None = None,
               fuzzy: bool = False,
               ranker: str = "bm25") -> list[dict]:
        return search_in_collection(
            registry, collection, query, filter, max_chunks, max_documents,
            diversify_lambda, include_snippets, expand_query, indexes, fuzzy,
            ranker,
        )

    @app.tool()
    def search_documents(collection: str, query: str, k: int = 10,
                         title_weight: float = 2.0, body_weight: float = 1.0,
                         filter: str | None = None) -> list[dict]:
        return search_documents_in_collection(
            registry, collection, query, k, title_weight, body_weight, filter
        )

    @app.tool()
    def similar_documents(collection: str, document_id: str, k: int = 10,
                          method: str = "vector",
                          max_terms: int = 10,
                          filter: str | None = None) -> list[dict]:
        return similar_documents_in_collection(
            registry, collection, document_id, k=k, method=method,
            max_terms=max_terms, metadata_filter=filter,
        )

    @app.tool()
    def suggest(collection: str, query: str, max_edits: int = 1) -> list[dict]:
        return suggest_in_collection(registry, collection, query, max_edits)

    @app.tool()
    def complete(collection: str, prefix: str, k: int = 10) -> list[dict]:
        return complete_in_collection(registry, collection, prefix, k)

    @app.tool()
    def facets(collection: str, fields: list[str], query: str = "",
               filter: str | None = None) -> list[dict]:
        return facets_in_collection(registry, collection, fields, query, filter)

    @app.tool()
    def search_many(collection: str, queries: list[str],
                    filter: str | None = None,
                    max_chunks: int = DEFAULT_MAX_CHUNKS,
                    max_documents: int | None = None,
                    diversify_lambda: float | None = None) -> dict:
        return search_many_in_collection(
            registry, collection, queries, filter, max_chunks, max_documents,
            diversify_lambda,
        )

    @app.tool()
    def fetch(collection: str, document_id: str, start_line: int = 1,
              end_line: int = DEFAULT_FETCH_END_LINE) -> dict:
        return fetch_from_collection(
            registry, collection, document_id, start_line, end_line
        )

    return app


def serve_mcp(base_path: str, transport: str = "stdio"):  # pragma: no cover
    """Start a FastMCP server exposing the two tools (requires `mcp`)."""
    try:
        from mcp.server.fastmcp import FastMCP
    except ImportError as exc:
        raise NotImplementedError(
            "the `mcp` package is not installed in this environment"
        ) from exc

    from documents_vector_search_spark.session import get_spark

    registry = CollectionRegistry(get_spark(app_name="dvss-mcp"), base_path)
    registry.warm()  # first user query ~1.5s instead of ~10s cold
    app = build_mcp_app(registry, FastMCP)
    app.run(transport=transport)
