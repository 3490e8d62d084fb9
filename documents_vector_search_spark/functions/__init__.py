"""Column-expression function library (all JVM-side, codegen-friendly).

Everything in this package returns ``pyspark.sql.Column`` built purely
from built-in functions — no Python UDFs — so the hot path stays inside
whole-stage codegen and vectorizes on executors.
"""

from documents_vector_search_spark.functions.hashing import (
    md5_hash64,
    minhash_signature,
    simhash32,
)
from documents_vector_search_spark.functions.text import (
    tokenize,
    word_shingles,
)
from documents_vector_search_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
)

__all__ = [
    "md5_hash64",
    "minhash_signature",
    "simhash32",
    "tokenize",
    "word_shingles",
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_norm",
]
