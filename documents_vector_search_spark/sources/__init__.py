"""Sources: ingestion into the canonical document envelope.

Each source produces a DataFrame with the canonical schema
(collection/catalog.py DOCUMENT_SCHEMA), replacing the reference's
reader+converter pairs (SURVEY §2.1 S1-S9):

- files:      ``binaryFile`` scan with glob/mtime pushdown (S1/S2/P5)
- jira:       REST pagination, offset (Server/DC) and token (Cloud)
              variants (S3/S4/P1/P2)
- confluence: REST pagination with CQL + cursor variant (S5/S6/P3/P4)
- cache:      read-through parquet checkpoint keyed by config hash (S9)
- batching:   error-resilient pagination driver (S7/S8)

REST readers fetch driver-side (the reference is fully serial too —
SURVEY §7.4) and parallelize from the converter stage on; transports
are injectable so everything is testable without live services.
"""

from documents_vector_search_spark.sources.files import read_files_documents
from documents_vector_search_spark.sources.datasets import read_dataset_documents
from documents_vector_search_spark.sources.cache import cached_read

__all__ = ["read_files_documents", "read_dataset_documents", "cached_read"]
