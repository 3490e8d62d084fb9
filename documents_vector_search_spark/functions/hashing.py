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

# Mersenne prime 2^31 - 1 — modulus of the 2-universal MinHash family
# h_i(x) = (a(x) + i*b(x)) mod p, where a and b are independent 32-bit
# values cut from ONE md5 digest (Carter-Wegman; the construction every
# 32-bit MinHash library uses, e.g. datasketch). One digest per shingle
# instead of num_hashes salted digests: 8x less hashing and a far
# smaller codegen tree.
#
# Why 32-bit and not wider: the family must (1) never overflow a signed
# int64 — ANSI mode aborts the job, and a 60-bit b made a + i*b
# overflow at family index 8 — and (2) have i*b wrap the modulus MANY
# times per index step, or the perturbation is cosmetic and every
# family picks the same argmin shingle (a 52-bit b under a 2^60 prime
# produced signatures whose 16 components were ONE shingle's
# arithmetic progression — zero LSH power). With p = 2^31 - 1 and
# 32-bit operands, i*b < 2^63 for any practical i while i*b/p ≈ 2 — a
# full wrap per step. Value collisions between distinct shingles
# (~n²/2^32 per pair) only nudge the Jaccard estimate, exactly as in
# other 32-bit MinHash implementations.
MINHASH_PRIME = 2147483647

# 8 hex chars = 32 bits per coefficient, cut from disjoint digest spans
_MH_COEF_HEX_LEN = 8
_MH_B_HEX_START = 9
MINHASH_MAX_FAMILIES = 1 << 20  # (2^20) * 2^32 << 2^63


def _check_family_index(i: int) -> None:
    if not 0 <= i < MINHASH_MAX_FAMILIES:
        raise ValueError(
            f"minhash family index {i} out of range "
            f"[0, {MINHASH_MAX_FAMILIES}) — a + i*b would overflow int64"
        )


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
    md5 HEX digest: ``(a + i*b) mod p`` with a = hex[0:8] and b =
    hex[8:16] as 32-bit ints, p = 2^31 - 1. Operands are non-negative
    so ``pmod`` ≡ ``%`` in any engine, and a + i*b can never overflow a
    signed int64 (see the MINHASH_PRIME comment for why 32-bit is also
    a QUALITY constraint, not just an overflow one)."""
    _check_family_index(i)
    a = F.conv(F.substring(hx, 1, _MH_COEF_HEX_LEN), 16, 10).cast("bigint")
    b = F.conv(
        F.substring(hx, _MH_B_HEX_START, _MH_COEF_HEX_LEN), 16, 10
    ).cast("bigint")
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
        a = F.conv(
            F.substring(hexd, 1, _MH_COEF_HEX_LEN), 16, 10
        ).cast("bigint")
        b = F.conv(
            F.substring(hexd, _MH_B_HEX_START, _MH_COEF_HEX_LEN), 16, 10
        ).cast("bigint")
        return F.struct(a.alias("a"), b.alias("b"))

    return F.transform(shingles, entry)


def minhash_from_ab(entry: Column, i: int) -> Column:
    """Family member i over a staged (a, b) struct — arithmetic only.
    Identical values to :func:`minhash_from_hex`."""
    _check_family_index(i)
    return F.pmod(entry["a"] + F.lit(i) * entry["b"], F.lit(MINHASH_PRIME))


def minhash_from_hex_sql(hx_expr: str, i: int) -> str:
    """ANSI-SQL twin of :func:`minhash_from_hex` (oracle builder)."""
    _check_family_index(i)
    a = (
        f"CAST(concat('0x', substr({hx_expr}, 1, {_MH_COEF_HEX_LEN})) "
        f"AS BIGINT)"
    )
    b = (
        f"CAST(concat('0x', substr({hx_expr}, {_MH_B_HEX_START}, "
        f"{_MH_COEF_HEX_LEN})) AS BIGINT)"
    )
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
