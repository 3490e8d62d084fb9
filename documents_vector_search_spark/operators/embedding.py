"""Embedding generation: the pandas-UDF seam + a deterministic test embedder.

Spark-first re-expression of the reference's embedding stage
(SentenceTransformer.encode over a batch,
main/indexes/embeddings/sentence_embeder.py:10-14, with a process-wide
model cache, main/indexes/factories/indexer_factory.py:12-45).

Pattern: an Arrow-batched ``pandas_udf`` whose worker lazily loads the
model ONCE per executor process into a module-global cache keyed by
model name — the exact distributed analog of the reference's embedder
singleton. Never ship weights through task closures; ship the NAME and
let each executor load it (SURVEY §7.4 "Embedding model distribution").

Two embedders:
- hash_embedding_expr: deterministic hash-based embedding as a PURE
  EXPRESSION — unit-normalized, any dim. Used by tests and the
  correctness oracle (fixes the reference's random FakeEmbedder flaw,
  tests/indexes/indexers/test_chroma_indexer.py:15-25 — shapes only,
  never ranking). Also the only embedder that a SQL oracle can
  re-compute.
- sentence_embedder_udf: the production seam. sentence-transformers is
  not installed in this container, so the loader is import-gated; the
  UDF machinery (batching, schema, cache) is real and tested via an
  injected fake encoder.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from documents_vector_search_spark.functions.hashing import md5_hash64

# executor-process-wide model cache (name -> model), the distributed
# twin of the reference's indexer_factory cache.
_MODEL_CACHE: dict[str, object] = {}


def hash_embedding_expr(text: Column, dim: int = 16) -> Column:
    """Deterministic unit-normalized embedding from text content.

    component_i = (md5_hash64(text, salt=i) % 2001 - 1000) / 1000 —
    a value in [-1, 1]; the vector is then L2-normalized. Same text →
    same vector, everywhere, forever.
    """
    raw = F.array(
        *[
            ((md5_hash64(text, salt=i) % 2001) - 1000) / 1000.0
            for i in range(dim)
        ]
    )

    # Bind `raw` to a lambda variable via a one-element-array transform
    # so the dim md5 digests are computed ONCE per row. Inlining `raw`
    # into the normalize lambda would re-evaluate it (and the norm, which
    # itself contains every digest) PER ELEMENT — measured ~17x more
    # hashing per row for dim=16.
    def normalize(r: Column) -> Column:
        norm = F.sqrt(F.aggregate(r, F.lit(0.0), lambda acc, x: acc + x * x))
        return F.transform(
            r, lambda x: F.when(norm > 0, x / norm).otherwise(F.lit(0.0))
        )

    return F.transform(F.array(raw), normalize)[0]


def hash_embedding_py(text: str, dim: int = 16) -> list[float]:
    """Driver-side Python twin of :func:`hash_embedding_expr` — embeds a
    QUERY string with bit-identical output to the corpus expression, so
    query and index vectors live in the same space (the analog of using
    one SentenceTransformer for both, reference
    main/core/documents_collection_searcher.py via indexer.search)."""
    import hashlib

    raw = []
    for i in range(dim):
        digest = hashlib.md5(f"{i}:{text}".encode()).hexdigest()
        h = int(digest[:15], 16)
        raw.append(((h % 2001) - 1000) / 1000.0)
    norm = sum(x * x for x in raw) ** 0.5
    if norm == 0:
        return [0.0] * dim
    return [x / norm for x in raw]


def _default_loader(model_name: str):
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as exc:  # pragma: no cover - not in this container
        raise NotImplementedError(
            "sentence-transformers is not installed; inject a loader via "
            "make_embedder_udf(loader=...) or use hash_embedding_expr"
        ) from exc
    return SentenceTransformer(model_name)


def make_embedder_udf(
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
    loader: Callable[[str], object] | None = None,
):
    """Build an Arrow-batched embedding UDF: Series[str] → Series[list[float]].

    ``loader(model_name)`` must return an object with
    ``.encode(list[str]) -> 2D float array``. The loader runs lazily on
    each executor, result cached in _MODEL_CACHE (per-process).
    """
    import pandas as pd  # noqa: F401

    load = loader or _default_loader

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts):
        import pandas as pd

        model = _MODEL_CACHE.get(model_name)
        if model is None:
            model = load(model_name)
            _MODEL_CACHE[model_name] = model
        vectors = model.encode(texts.tolist())
        return pd.Series([[float(x) for x in v] for v in vectors])

    return embed


def mean_pool(
    embeddings,
    dim: int,
    group_col: str = "label",
    vector_col: str = "embedding",
    round_to: int | None = 6,
):
    """Per-group mean-pooled vector — the centroid/prototype step of an
    embedding pipeline (doc vectors from chunk vectors, class
    prototypes, SemDeDup cluster representatives). The reference pools
    nothing (it stores chunk vectors only); this is the standard
    aggregation every embedding corpus eventually needs.

    ONE shuffle: each of the ``dim`` components is its own ``avg``
    aggregate inside a single groupBy (fully codegen, partial
    aggregation map-side), then the rounded components re-assemble into
    an array — no posexplode (which would shuffle (row × dim) rows) and
    no UDF. Returns ``(group, centroid ARRAY<DOUBLE>, n)``.
    """
    vec = F.col(vector_col).cast("array<double>")
    aggs = [
        F.avg(F.element_at(vec, i + 1)).alias(f"_m{i}") for i in range(dim)
    ]
    g = embeddings.groupBy(group_col).agg(*aggs, F.count("*").alias("n"))
    comps = [
        F.round(F.col(f"_m{i}"), round_to) if round_to is not None
        else F.col(f"_m{i}")
        for i in range(dim)
    ]
    return g.select(group_col, F.array(*comps).alias("centroid"), "n")
