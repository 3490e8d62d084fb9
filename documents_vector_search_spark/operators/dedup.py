"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its unit of identity is the document id);
these are the north-star additions (BASELINE.json) every 100 TB corpus
pipeline needs. All are pure DataFrame transformations:

- exact_dedup:            content-hash groupBy (one shuffle on the hash)
- minhash_lsh_pairs:      MinHash + banded LSH candidate generation +
                          exact Jaccard verification (Broder 1997 /
                          Leskovec-Rajaraman-Ullman ch.3)
- simhash_fingerprints:   Charikar SimHash fingerprint per doc
- ngram_jaccard_pairs:    exact shingle-Jaccard for candidate pairs
- embedding_neardup_pairs: cosine near-dup via random-hyperplane LSH
                          bucketing + in-bucket exact cosine

Scale notes (100 TB):
- exact: shuffle keyed on a 60-bit content hash — uniform by
  construction, no skew.
- MinHash LSH: cost is (bands × corpus) bucket rows; the self-join is
  per-bucket. Popular buckets (boilerplate) are the skew risk — AQE
  skew-join splitting handles moderate skew; pathological buckets can be
  capped (cap parameter) exactly like production dedup pipelines do.
- Pairs are emitted with a < b once (no duplicate mirror pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.hashing import md5_hash64
from documents_vector_search_spark.functions.text import tokenize, word_shingles
from documents_vector_search_spark.functions.vectors import cosine_similarity


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups by 60-bit content hash.

    Returns ``(content_hash, canonical_id, dup_count)`` — canonical_id is
    the smallest member id (the row a keep-one-per-group pipeline keeps).
    """
    hashed = docs.select(
        md5_hash64(F.col(text_col)).alias("content_hash"), F.col(id_col)
    )
    return hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("canonical_id"),
        F.count("*").alias("dup_count"),
    )


def with_shingles(
    docs: DataFrame,
    shingle_words: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, shingles ARRAY<STRING>)`` — distinct word n-gram shingles."""
    return docs.select(
        F.col(id_col),
        F.array_distinct(
            word_shingles(tokenize(text_col), shingle_words)
        ).alias("shingles"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_words: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH + exact verification.

    1. signature: ``num_hashes`` MinHash values per doc (map-only).
    2. banding: split the signature into ``bands`` bands of r rows; docs
       sharing ANY band value become candidates (one shuffle keyed by
       (band_index, band_value)).
    3. verify: exact Jaccard on the candidates' shingle sets; keep
       pairs with ``jaccard >= threshold``.

    ``max_bucket_size`` caps pathological bands (site boilerplate can
    put 1% of a 100 TB corpus in ONE bucket → a quadratic self-join):
    oversized buckets are dropped before pairing, trading recall inside
    mega-clusters for a bounded plan — the standard production-dedup
    guard. The cap is a window count over the band shuffle (no extra
    join); None disables it.

    Plan shape (no ``.persist()`` anywhere — safe in long-lived
    sessions):
    1. signatures: one pass (shingle rows → md5 columns → min-agg; the
       min ignores duplicate shingles, so the shingle stream is NOT
       de-duplicated first — saves a full shuffle).
    2. candidates: band self-join → pair dedup (one shuffle on the pair
       key).
    3. verification: RE-SCAN only the candidate documents (semi-join on
       the broadcast candidate-id set — at corpus scale candidates are
       ≪ corpus) and compare their exact shingle SETS with
       array_intersect. The candidate subtree above feeds both the
       broadcast and the final join through the same exchange, which
       Spark executes once (ReusedExchange).

    Returns ``(id_a, id_b, jaccard)`` with id_a < id_b.
    """
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands

    # fully codegen'd pipeline: shingle ROWS (operators/shingles.py — no
    # interpreted array HOFs) → num_hashes md5 columns → vectorized
    # min-aggregate = the signature
    from documents_vector_search_spark.operators.shingles import shingle_rows

    sh = shingle_rows(docs, shingle_words, id_col, text_col, distinct=False)
    hash_cols = [
        md5_hash64(F.col("shingle"), salt=i).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    sig = sh.select("id", *hash_cols).groupBy("id").agg(
        *[F.min(f"m{i}").alias(f"m{i}") for i in range(num_hashes)]
    )

    banded = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_", *[F.col(f"m{b * r + j}") for j in range(r)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_index", "band_value"),
    )

    if max_bucket_size is not None:
        # window count over the same (band_index, band_value) hash
        # partitioning the self-join needs — the cap rides the shuffle
        # the join pays anyway instead of adding a sizes join
        bw = Window.partitionBy("band_index", "band_value")
        banded = (
            banded.withColumn("_bs", F.count("*").over(bw))
            .filter(F.col("_bs") <= max_bucket_size)
            .drop("_bs")
        )

    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band_index") == F.col("r.band_index"))
            & (F.col("l.band_value") == F.col("r.band_value"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )

    # verification: exact Jaccard over the candidate documents only —
    # re-shingle the (small) candidate sub-corpus instead of joining the
    # full inverted shingle index twice
    cand_ids = (
        candidates.select(F.col("id_a").alias("_cid"))
        .unionByName(candidates.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    sub = docs.join(
        F.broadcast(cand_ids), F.col(id_col) == F.col("_cid"), "left_semi"
    )
    cs = with_shingles(sub, shingle_words, id_col, text_col)
    a = cs.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("_sa"))
    b = cs.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("_sb"))
    verified = (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "_inter", F.size(F.array_intersect("_sa", "_sb")).cast("bigint")
        )
        .withColumn("n_a", F.size("_sa").cast("bigint"))
        .withColumn("n_b", F.size("_sb").cast("bigint"))
        .withColumn("_union", F.col("n_a") + F.col("n_b") - F.col("_inter"))
        .withColumn(
            "jaccard",
            F.when(F.col("_union") > 0, F.col("_inter") / F.col("_union")).otherwise(
                F.lit(0.0)
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    jac = (
        F.round(F.col("jaccard"), round_to) if round_to is not None else F.col("jaccard")
    )
    return verified.select("id_a", "id_b", jac.alias("jaccard"))


def dedup_filter(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply near-dup pairs to a corpus: drop every doc that has a
    smaller-id near-duplicate (greedy canonicalization).

    A doc is removed iff it appears as ``id_b`` of some pair (pairs are
    emitted with id_a < id_b). Each duplicate component keeps at least
    its minimum id; a full connected-components pass (iterative, see
    GraphFrames) only matters for sparse chains where an intermediate
    doc's only links point at larger ids. One broadcast anti-join.
    """
    victims = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(victims, id_col, "left_anti")


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, simhash)`` — 32-bit SimHash fingerprint per document.

    Equal fingerprints (or small Hamming distance — pair search via
    banding the fingerprint, same pattern as minhash_lsh_pairs) mark
    near-duplicates.

    Plan: explode tokens → one md5 hash per token → hash-aggregate with
    32 conditional-sum vote counters → recombine bits. The explode +
    groupBy(id) shuffle keys on the document id (uniform), and the
    32-way SUM runs in Spark's vectorized hash aggregate — measured ~5×
    faster than folding a 32-wide array per row inside a single
    aggregate() expression (functions/hashing.py::simhash32, kept for
    array-column inputs).
    """
    tokens = docs.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("term")
    )
    hashed = tokens.select(F.col(id_col), md5_hash64(F.col("term")).alias("h"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(32)
        ]
    )
    bits = None
    for b in range(32):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        bits = term if bits is None else bits + term
    fp = votes.select(F.col(id_col), bits.alias("simhash"))
    # zero-token docs produce no posting rows: restore them with simhash 0
    return (
        docs.select(id_col)
        .join(fp, id_col, "left")
        .select(F.col(id_col), F.coalesce("simhash", F.lit(0).cast("bigint")).alias("simhash"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_words: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold, via an inverted
    shingle index (explode + self-join on shingle + pair aggregation).

    Exact but quadratic in the worst case — intended for bounded inputs
    (a single dedup bucket, a blocking partition); at corpus scale use
    minhash_lsh_pairs which verifies only LSH candidates.
    Returns ``(id_a, id_b, jaccard)`` with id_a < id_b.
    """
    shingled = with_shingles(docs, shingle_words, id_col, text_col)
    sizes = shingled.select(
        F.col(id_col).alias("id"), F.size("shingles").alias("n_sh")
    )
    inv = shingled.select(
        F.col(id_col).alias("id"), F.explode("shingles").alias("shingle")
    )
    pairs = (
        inv.alias("l")
        .join(inv.alias("r"), (F.col("l.shingle") == F.col("r.shingle")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count("*").alias("_inter"))
    )
    verified = (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn("_union", F.col("n_a") + F.col("n_b") - F.col("_inter"))
        .withColumn("jaccard", F.col("_inter") / F.col("_union"))
        .filter(F.col("jaccard") >= threshold)
    )
    jac = (
        F.round(F.col("jaccard"), round_to) if round_to is not None else F.col("jaccard")
    )
    return verified.select("id_a", "id_b", jac.alias("jaccard"))


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (stdlib RNG, fixed
    seed) — embedded as literals so any engine reproduces the buckets."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = sum(x * x for x in v) ** 0.5
        planes.append([round(x / norm, 6) for x in v])
    return planes


def hyperplane_bucket(vector_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit j = sign(dot(v, plane_j)).

    Charikar's SRP-LSH: collision probability = 1 - angle/π, so vectors
    with high cosine similarity land in the same bucket with high
    probability. Bucket count = 2^n_planes; at 100 TB, n_planes tunes
    bucket size to executor memory.
    """
    bucket = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vector_col,
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(2**j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Cosine near-duplicate pairs via SRP-LSH buckets + exact cosine.

    One shuffle keyed by bucket; the quadratic verification runs only
    within buckets (corpus/2^n_planes expected rows each). Recall can be
    raised by multi-probe or repeating with a different seed and
    unioning. Returns ``(id_a, id_b, cosine)`` with id_a < id_b.
    """
    dim = len(embeddings.select(vector_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    vec = F.col(vector_col).cast("array<double>")
    bucketed = embeddings.select(
        F.col(id_col).alias("id"),
        vec.alias("v"),
        hyperplane_bucket(vec, planes).alias("bucket"),
    )
    pairs = (
        bucketed.alias("l")
        .join(
            bucketed.alias("r"),
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            cosine_similarity(F.col("l.v"), F.col("r.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    cos = (
        F.round(F.col("cosine"), round_to) if round_to is not None else F.col("cosine")
    )
    return pairs.select("id_a", "id_b", cos.alias("cosine"))
