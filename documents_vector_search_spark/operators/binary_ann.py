"""Binary (1-bit sign) embedding quantization with Hamming-distance ANN.

The most aggressive point on the repo's quantization ladder
(flat → SQ8 → PQ → binary): each float dimension compresses to its
SIGN BIT, packed into 32-bit words stored as bigints — a 64-dim float
embedding becomes two int64 words (8 bytes of payload vs 256 bytes of
floats, 32x). Retrieval is the standard two-stage binary pipeline
(as popularized by binary-embedding serving stacks): Hamming distance
on the packed signature ranks a candidate pool, then the pool is
re-ranked with exact cosine on the original floats.

Why 32-bit words in an int64 column: both Spark and an ANSI-SQL oracle
do exact integer arithmetic on non-negative values < 2^31, so the
packing expression (Σ 2^j over positive dims) is engine-portable
without signed-overflow edge cases; ``bit_count``/``xor`` then operate
per word.

Scale notes (100 TB):
- The signature build is one map-only scan; signatures are the ONLY
  column the candidate stage reads (column pruning does the 32x).
- Hamming = Σ_w bit_count(a_w ⊕ b_w) — pure integer codegen,
  no shuffle; candidate selection is TakeOrderedAndProject(n_rerank).
- The exact rerank touches n_rerank full vectors, not the corpus.
- Same convention as the SRP-LSH planes: a dimension counts as
  positive when >= 0 (functions/hashing.py bucket_of).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.vectors import (
    cosine_similarity,
    lit_double_array,
)

WORD_BITS = 32


def sign_signature(vec: Column, dim: int) -> Column:
    """``array<bigint>`` of ceil(dim/32) words; bit j of word w is set
    when ``vec[32w + j] >= 0``. Pure Column expression."""
    n_words = (dim + WORD_BITS - 1) // WORD_BITS
    words = []
    for w in range(n_words):
        bits = F.lit(0).cast("bigint")
        for j in range(min(WORD_BITS, dim - w * WORD_BITS)):
            bit = F.when(
                F.element_at(vec, w * WORD_BITS + j + 1) >= 0,
                F.lit(1 << j).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
            bits = bits + bit
        words.append(bits)
    return F.array(*words)


def sign_signature_py(vec: list[float]) -> list[int]:
    """Driver-side twin of :func:`sign_signature` for query vectors —
    same >= 0 convention, same 32-bit word packing."""
    n_words = (len(vec) + WORD_BITS - 1) // WORD_BITS
    out = []
    for w in range(n_words):
        bits = 0
        for j in range(min(WORD_BITS, len(vec) - w * WORD_BITS)):
            if vec[w * WORD_BITS + j] >= 0:
                bits |= 1 << j
        out.append(bits)
    return out


def hamming_to_literal(sig: Column, query_sig: list[int]) -> Column:
    """Σ_w bit_count(sig[w] XOR q_w) against a driver-side signature."""
    total = F.lit(0).cast("bigint")
    for w, qw in enumerate(query_sig):
        total = total + F.bit_count(
            F.element_at(sig, w + 1).bitwiseXOR(F.lit(int(qw)).cast("bigint"))
        ).cast("bigint")
    return total


def binary_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    n_rerank: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    sig_col: str | None = None,
) -> DataFrame:
    """Two-stage binary ANN: Hamming candidates → exact cosine top-k.

    Returns ``(id, similarity)`` descending, ties on id ascending.
    Candidate selection is deterministic: ORDER BY (hamming, id) LIMIT
    n_rerank, so an oracle replays it exactly. Recall is governed by
    n_rerank (the classic binary-retrieval knob); the pytest floor
    pins it against exact cosine on the test corpus.

    ``sig_col`` names a MATERIALIZED signature column (written at
    index-build time with :func:`sign_signature`) — then the candidate
    scan reads 8-16 bytes/row instead of the float vectors, which is
    where the 32x scan cut actually lands; without it the ad-hoc form
    packs signatures inline from the vectors (correct, but the scan
    still reads floats).
    """
    dim = len(query_vec)
    q_sig = sign_signature_py(query_vec)
    v = F.col(vec_col).cast("array<double>")
    sig = F.col(sig_col) if sig_col else sign_signature(v, dim)
    # candidate stage carries (id, hamming) ONLY — the full vectors do
    # not flow through the top-n_rerank sort; the rerank stage fetches
    # them by id with a broadcast semi-join of the tiny candidate set
    candidates = (
        embeddings.select(
            F.col(id_col), hamming_to_literal(sig, q_sig).alias("_hamming")
        )
        .orderBy(F.col("_hamming").asc(), F.col(id_col).asc())
        .limit(n_rerank)
    )
    pool = embeddings.join(
        F.broadcast(candidates.select(id_col)), id_col, "left_semi"
    )
    sim = F.round(cosine_similarity(v, lit_double_array(query_vec)), round_to)
    return (
        pool.select(F.col(id_col), sim.alias("similarity"))
        .orderBy(F.col("similarity").desc(), F.col(id_col).asc())
        .limit(k)
    )
