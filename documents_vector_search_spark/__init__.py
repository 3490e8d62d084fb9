"""documents_vector_search_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference system ``shnax0210/documents-vector-search`` (a local document
vector-search / hybrid-retrieval engine): document ingestion, chunking,
embedding, exact/ANN vector search, BM25 keyword search, reciprocal rank
fusion, metadata filter language, point fetch, and incremental update —
plus the LLM-training-data-pipeline operators a 100 TB corpus needs
(dedup families, similarity search, text analysis, multimodal columns).

Everything is expressed as DataFrame transformations over Parquet tables
so Catalyst plans the execution (predicate pushdown, TakeOrderedAndProject
top-k, broadcast joins, AQE): there is no bespoke execution engine.
"""

__version__ = "0.1.0"
