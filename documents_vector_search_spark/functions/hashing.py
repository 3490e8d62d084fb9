"""Portable deterministic hashing for dedup / fingerprinting operators.

Design constraint: every hash here must be reproducible OUTSIDE Spark by
any ANSI-SQL engine (the correctness oracle re-computes them), so we
derive integers from md5 hex digests rather than engine-specific hash
functions (Spark's xxhash64 and DuckDB's hash() disagree). Taking the
first 15 hex chars = 60 bits keeps the value positive in a signed int64
in every engine.

This replaces the reference's reliance on opaque library internals
(FAISS ids, Chroma HNSW, FTS5) with transparent, re-computable columns —
the property that makes hash-based dedup auditable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 hex chars = 60 bits — always positive as int64.
_HEX_PREFIX_LEN = 15

# Largest prime below 2^60 — modulus of the 2-universal MinHash family
# h_i(x) = (a(x) + i*b(x)) mod p, where a and b are independent 60-bit
# values cut from ONE md5 digest (Carter-Wegman). One digest per shingle
# instead of num_hashes salted digests: 8x less hashing and a far
# smaller codegen tree. a + 7b < 2^63, so the arithmetic never overflows
# a signed int64 in any engine.
MINHASH_PRIME = 1152921504606846883


def md5_hash64(col: Column, salt: int = 0) -> Column:
    """60-bit non-negative int64 from ``md5(salt ':' value)``.

    ``salt`` yields independent hash families for MinHash permutations
    (hash_i(x) = md5_hash64(x, salt=i)).
    """
    salted = F.concat(F.lit(f"{salt}:"), col)
    return F.conv(F.substring(F.md5(salted), 1, _HEX_PREFIX_LEN), 16, 10).cast("bigint")


def md5_hash64_sql(expr: str, salt: int = 0) -> str:
    """The ANSI-SQL twin of :func:`md5_hash64` (used to build oracles)."""
    return (
        f"CAST(concat('0x', substr(md5(concat('{salt}:', {expr})), 1, "
        f"{_HEX_PREFIX_LEN})) AS BIGINT)"
    )


def md5_hash64_py(value: str, salt: int = 0) -> int:
    """Driver-side twin of :func:`md5_hash64` — same salt format and hex
    prefix length, so query-time lookups (e.g. BM25 term buckets) land
    on exactly the partitions the write side produced. Any drift here
    silently empties results, hence ONE definition shared by all three
    dialects (Column / SQL / Python) and a parity test."""
    import hashlib

    hexd = hashlib.md5(f"{salt}:{value}".encode()).hexdigest()
    return int(hexd[:_HEX_PREFIX_LEN], 16)


def minhash_from_hex(hx: Column, i: int) -> Column:
    """Family member i of the 2-universal MinHash family over a shingle's
    md5 HEX digest: ``(a + i*b) mod p`` with a = hex[0:15], b = hex[15:30]
    as 60-bit ints. Operands are non-negative so ``pmod`` ≡ ``%`` in any
    engine, and a + 7b < 2^63 (no int64 overflow)."""
    a = F.conv(F.substring(hx, 1, _HEX_PREFIX_LEN), 16, 10).cast("bigint")
    b = F.conv(F.substring(hx, 16, _HEX_PREFIX_LEN), 16, 10).cast("bigint")
    return F.pmod(a + F.lit(i) * b, F.lit(MINHASH_PRIME))


def minhash_ab_array(shingles: Column) -> Column:
    """``transform(shingles, s -> struct(a, b))`` — the staged form of
    the family seed. ``conv`` (string base conversion) is the expensive
    step, so a pipeline should project THIS array once as its own column
    and derive every family with :func:`minhash_from_ab` (pure int64
    arithmetic) — measured ~4x faster than re-deriving (a, b) per
    family from the hex digests."""

    def entry(s: Column) -> Column:
        hexd = F.md5(s)
        a = F.conv(F.substring(hexd, 1, _HEX_PREFIX_LEN), 16, 10).cast("bigint")
        b = F.conv(F.substring(hexd, 16, _HEX_PREFIX_LEN), 16, 10).cast("bigint")
        return F.struct(a.alias("a"), b.alias("b"))

    return F.transform(shingles, entry)


def minhash_from_ab(entry: Column, i: int) -> Column:
    """Family member i over a staged (a, b) struct — arithmetic only.
    Identical values to :func:`minhash_from_hex`."""
    return F.pmod(entry["a"] + F.lit(i) * entry["b"], F.lit(MINHASH_PRIME))


def minhash_from_hex_sql(hx_expr: str, i: int) -> str:
    """ANSI-SQL twin of :func:`minhash_from_hex` (oracle builder)."""
    a = f"CAST(concat('0x', substr({hx_expr}, 1, {_HEX_PREFIX_LEN})) AS BIGINT)"
    b = f"CAST(concat('0x', substr({hx_expr}, 16, {_HEX_PREFIX_LEN})) AS BIGINT)"
    return f"(({a}) + {i} * ({b})) % {MINHASH_PRIME}"


def minhash_signature(shingles: Column, num_hashes: int = 8) -> Column:
    """MinHash signature: array of ``num_hashes`` int64 minima.

    For each hash family i, take min over shingles of
    ``h_i(s) = minhash_from_hex(md5(s), i)`` — ONE digest per shingle
    seeds every family (Carter-Wegman), instead of ``num_hashes`` salted
    digests. Pr[sig_a[i] == sig_b[i]] ≈ Jaccard(a, b) — the standard
    MinHash estimator (Broder 1997). Pure map, no explode, no shuffle.

    Convenience single-Column form: the md5 transform is inlined per
    family here. In a pipeline, stage the hex array as its own projected
    column once and apply :func:`minhash_from_hex` per family (see
    operators/dedup.py::minhash_lsh_pairs) so the digests are computed
    once.
    """

    def hash_family(i: int):
        # single-arg lambda: a two-arg lambda would make pyspark pass the
        # ARRAY INDEX as the second argument, silently replacing i
        return lambda s: minhash_from_hex(F.md5(s), i)

    return F.array(
        *[
            F.array_min(F.transform(shingles, hash_family(i)))
            for i in range(num_hashes)
        ]
    )


def simhash32(tokens: Column) -> Column:
    """32-bit SimHash of a token array as an int64 column.

    Charikar (2002): each token votes +1/-1 on each of 32 bit positions
    according to its own hash's bits; the fingerprint sets bit b iff the
    aggregate vote is positive. Near-duplicate docs differ in few bits.

    Pure expression: one aggregate() pass over the token array computes
    all 32 vote counters; no shuffle, no UDF.
    """
    # votes[b] = sum over tokens of (bit b of md5_hash64(token)) ? +1 : -1
    def bit_votes(t: Column) -> Column:
        h = md5_hash64(t)
        return F.array(
            *[
                F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for b in range(32)
            ]
        )

    zero = F.array(*[F.lit(0)] * 32)
    votes = F.aggregate(
        tokens, zero, lambda acc, t: F.zip_with(acc, bit_votes(t), lambda a, v: a + v)
    )
    # fingerprint = sum of 2^b for every positive vote counter
    powers = F.array(*[F.lit(2**b).cast("bigint") for b in range(32)])
    return F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
