"""Benchmark decontamination: flag training docs overlapping an eval set.

A standard large-scale training-data stage (the n-gram overlap
decontamination described in public LLM corpus reports — e.g. the
13-gram procedure in the GPT-3 paper and Llama's eval-overlap checks):
any training document sharing enough distinct word n-grams with a
benchmark/evaluation corpus is flagged (and usually dropped) so eval
scores measure generalization, not memorization. The reference has no
analog (search-only pipeline); this completes the curation family
(operators/curation.py) with the one check that guards the EVAL side.

Spark shape — the benchmark corpus is small (eval sets are thousands of
documents, not billions), the training corpus is the 100 TB side:
- benchmark n-grams: one tiny distinct list, BROADCAST to every
  executor — the training-side scan never shuffles its n-grams.
- training side: tokenize → n-gram shingles → explode → broadcast-hash
  semi-match, then ONE aggregation shuffle keyed by doc id (uniform).
  Nothing materializes per-(doc, gram) beyond the streamed join.
- report is a left join back onto doc ids, so clean documents appear
  with a zero count (auditable coverage, not just a hit list).

Tokenization/shingling reuse the engine-wide expressions
(functions/text.py) so the DuckDB oracle (registry.py) agrees exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.text import tokenize, word_shingles

# Auto-cutover budget for shipping the benchmark gram set to every
# executor — the same idiom as spark.sql.autoBroadcastJoinThreshold,
# but sized for a deliberate dimension-table broadcast (Spark's 10 MB
# default guards against ACCIDENTAL huge broadcasts; an eval-suite gram
# list is the intended-broadcast case). The budget is compared against
# an IN-MEMORY estimate, not raw payload — see the overhead constant.
AUTO_BROADCAST_GRAM_BYTES = 64 << 20

# A BroadcastHashJoin's build side inflates far beyond its payload:
# the hashed relation stores each key with entry/pointer overhead plus
# object headers, and every executor deserializes its own copy —
# Spark's conservative 10 MB default exists because of this ~5-10x
# factor. Budget ~48 bytes of relation overhead per gram on top of the
# payload so the 64 MB budget means ~64 MB of actual executor memory
# (cutover ≈1.1M hashed grams), not a few hundred MB.
_HASHED_RELATION_OVERHEAD = 48


def estimate_gram_bytes(
    benchmark: DataFrame,
    n: int = 5,
    bench_text_col: str = "text",
    hash_grams: bool = False,
) -> int:
    """Rough IN-MEMORY broadcast-size estimate for the benchmark gram
    set: ONE cheap single-column aggregate over the BENCHMARK side only
    (never the training corpus). Distinct word n-grams are bounded by
    token count ≈ chars/6; each gram costs ~8 bytes hashed or ~n·7
    bytes as a string, PLUS the hashed-relation overhead
    (_HASHED_RELATION_OVERHEAD). Deliberately coarse — it only has to
    land on the right side of the cutover, exactly like Spark's own
    size-based broadcast planning on table statistics."""
    row = benchmark.agg(
        F.coalesce(F.sum(F.length(bench_text_col)), F.lit(0)).alias("chars")
    ).first()
    est_grams = int(row["chars"]) // 6
    per_gram = (8 if hash_grams else n * 7) + _HASHED_RELATION_OVERHEAD
    return est_grams * per_gram


def _shingle_rows(
    df: DataFrame, carry: list, text_col: str, n: int
) -> DataFrame:
    """``(*carry, gram)`` — one row per distinct-in-document n-gram
    shingle, with the token array staged as a GENERATOR output so
    tokenize runs once per row: Generate nodes get no codegen
    subexpression elimination, and ``word_shingles`` references its
    token argument three times (short-doc CASE + two array_joins), so
    the inline form re-tokenized every row ~3× inside the explode
    (same fix as classify._gram_array_from_tokens)."""
    staged = df.select(
        *carry, F.explode_outer(F.array(tokenize(text_col))).alias("_stoks")
    )
    # explode_outer + isNotNull instead of plain explode: explode
    # triggers InferFiltersFromGenerate, whose inferred size(...)>0
    # pre-filter re-evaluates the whole word_shingles regex tree once
    # more per row below the Generate (same dodge as build_postings).
    # Shingle elements are never NULL (array_join/regexp_extract_all
    # outputs), so the filtered result is row-identical.
    return staged.select(
        *carry,
        F.explode_outer(
            F.array_distinct(word_shingles(F.col("_stoks"), n))
        ).alias("gram"),
    ).filter(F.col("gram").isNotNull())


def benchmark_ngrams(
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """Distinct word n-grams of the benchmark corpus — the broadcast
    side. One column ``gram``.

    ``hash_grams`` replaces each gram string with its md5-derived int64
    (functions/hashing.py — engine-portable): a large eval suite's
    13-gram set broadcasts as 8 bytes/gram instead of the raw strings
    (~4-8× smaller), at a ~n²/2⁶⁴ false-collision risk — the standard
    trade at scale. Both sides must use the same setting."""
    out = _shingle_rows(benchmark, [], text_col, n)
    if hash_grams:
        from documents_vector_search_spark.functions.hashing import (
            md5_hash64,
        )

        out = out.select(md5_hash64(F.col("gram")).alias("gram"))
    return out.distinct()


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    hash_grams: bool = False,
    broadcast: bool | None = None,
    tokens_col: str | None = None,
    auto_broadcast_bytes: int = AUTO_BROADCAST_GRAM_BYTES,
) -> DataFrame:
    """Per-document ``(id, contaminated_ngrams, contaminated)`` for
    EVERY training document: the count of distinct ``n``-gram shingles
    shared with the benchmark corpus, and a flag at ``min_hits``.

    ``word_shingles`` gives short documents (< n tokens) one shingle of
    all their tokens, so they participate instead of silently passing.
    ``hash_grams`` matches on md5-int64 gram hashes instead of strings
    (see :func:`benchmark_ngrams`) — smaller broadcast at scale.

    ``broadcast=None`` (default) picks the join strategy AUTOMATICALLY,
    mirroring Spark's size-based broadcast planning: a cheap
    benchmark-side size estimate (:func:`estimate_gram_bytes`) chooses
    broadcast when the gram set fits ``auto_broadcast_bytes``, else the
    shuffle path — so a pipeline that suddenly points at a full
    eval-harness union does not OOM its executors on a manual default.
    NOTE: the estimate is an EAGER single-column aggregate over
    ``benchmark`` at plan-construction time, so the benchmark plan is
    evaluated twice (once for the estimate, once in the gram join). A
    benchmark that is itself an expensive derived plan should be
    ``.cache()``-ed by the caller before being passed in, or force the
    strategy with ``broadcast=True``/``False`` — both forced sides skip
    the estimate entirely. The chars/6 token heuristic also ignores any
    ``tokens_col`` precomputation; it only has to land on the right
    side of the 64 MB cutover.

    The shuffle path is the scale fallback for an eval suite too large
    to ship to every executor (a full eval-harness union can reach
    hundreds of millions of distinct 13-grams): the gram match becomes
    a SHUFFLE hash join keyed on the gram. The bench side is distinct
    (each gram once), so the join output stays bounded by the
    training-side gram rows and a hot boilerplate gram cannot explode
    the build side; pair it with ``hash_grams`` so the shuffle carries
    8-byte keys instead of strings. Results are identical either way
    (parity-pinned by test) — only the physical join strategy moves.

    ``tokens_col`` names an ALREADY-TOKENIZED column to shingle
    instead of re-tokenizing ``text_col`` — a composed pipeline whose
    upstream stage tokenized the corpus (e.g. a quality gate) must not
    pay the regex tokenize a second time over 100 TB. The column must
    hold exactly ``functions/text.tokenize`` output, or the gram match
    drifts from the oracle.
    """
    grams = benchmark_ngrams(benchmark, n, bench_text_col, hash_grams)
    if tokens_col:
        # upstream already tokenized: word_shingles references the
        # materialized column (O(1) per reference), no staging needed
        doc_grams = docs.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles(F.col(tokens_col), n))
            ).alias("gram"),
        )
    else:
        doc_grams = _shingle_rows(docs, [F.col(id_col)], text_col, n)
    if hash_grams:
        from documents_vector_search_spark.functions.hashing import (
            md5_hash64,
        )

        doc_grams = doc_grams.select(
            F.col(id_col), md5_hash64(F.col("gram")).alias("gram")
        )
    if broadcast is None:
        broadcast = (
            estimate_gram_bytes(benchmark, n, bench_text_col, hash_grams)
            <= auto_broadcast_bytes
        )
    # per-doc grams are distinct (array_distinct before the explode), so
    # count(*) after the gram match IS the distinct-hit count
    bench_side = (
        F.broadcast(grams) if broadcast else grams.hint("shuffle_hash")
    )
    hits = (
        doc_grams.join(bench_side, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("contaminated_ngrams"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("contaminated_ngrams"), F.lit(0)).alias(
            "contaminated_ngrams"
        ),
        (
            F.coalesce(F.col("contaminated_ngrams"), F.lit(0))
            >= F.lit(min_hits)
        ).alias("contaminated"),
    )


def benchmark_hit_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    bench_id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    suite_col: str | None = None,
    hash_grams: bool = False,
) -> DataFrame:
    """The BENCHMARK-side view of contamination — per benchmark
    document ``(bench_id[, suite], shared_ngrams, compromised)``: how
    many of ITS distinct ``n``-grams appear anywhere in the training
    corpus. :func:`contamination_report` answers "which training docs
    to drop"; this answers the signoff question "which eval examples
    are compromised" — the two reports count the SAME gram matches
    from opposite sides.

    Scale shape (training side is the 100 TB side, benchmark is tiny):
    1. benchmark grams (with their doc ids) — small by definition;
    2. the DISTINCT benchmark gram set BROADCASTS into a semi-join
       that filters the training corpus's gram stream scan-side — the
       training side never shuffles grams the benchmark doesn't have;
    3. the surviving training grams distinct into a set BOUNDED by
       |benchmark grams| (the semi-join guarantees it), which
       broadcasts back onto the per-benchmark-doc gram list;
    4. one aggregation keyed by benchmark doc id.
    No step shuffles anything proportional to the training corpus
    except the semi-join's bounded survivors."""
    bench_cols = [F.col(bench_id_col)] + (
        [F.col(suite_col)] if suite_col else []
    )
    bd_grams = _shingle_rows(benchmark, bench_cols, bench_text_col, n)
    train_grams = _shingle_rows(docs, [], text_col, n)
    if hash_grams:
        from documents_vector_search_spark.functions.hashing import (
            md5_hash64,
        )

        bd_grams = bd_grams.select(
            *bench_cols, md5_hash64(F.col("gram")).alias("gram")
        )
        train_grams = train_grams.select(
            md5_hash64(F.col("gram")).alias("gram")
        )
    bench_gram_set = bd_grams.select("gram").distinct()
    hot = (
        train_grams.join(F.broadcast(bench_gram_set), "gram", "left_semi")
        .distinct()
    )
    hits = (
        bd_grams.join(F.broadcast(hot), "gram")
        .groupBy(*[c for c in ([bench_id_col] + ([suite_col] if suite_col else []))])
        .agg(F.count("*").cast("bigint").alias("shared_ngrams"))
    )
    base = benchmark.select(*bench_cols)
    join_keys = [bench_id_col] + ([suite_col] if suite_col else [])
    return base.join(hits, join_keys, "left").select(
        *bench_cols,
        F.coalesce(F.col("shared_ngrams"), F.lit(0)).alias("shared_ngrams"),
        (
            F.coalesce(F.col("shared_ngrams"), F.lit(0)) >= F.lit(min_hits)
        ).alias("compromised"),
    )


def benchmark_contamination_rate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    bench_id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    suite_col: str = "suite",
    hash_grams: bool = False,
) -> DataFrame:
    """Per-benchmark-SUITE contamination rollup — ``(suite,
    n_bench_docs, n_compromised, contamination_rate)`` ordered by
    suite: the one number a decontamination signoff quotes ("3.2% of
    suite X's examples share a 13-gram with training data"). One keyed
    aggregate over :func:`benchmark_hit_report`; the rate is the
    engine's deterministic micro-floored ratio (exact int64 division,
    bit-identical in any engine)."""
    rep = benchmark_hit_report(
        docs,
        benchmark,
        n,
        min_hits,
        bench_id_col,
        text_col,
        bench_text_col,
        suite_col=suite_col,
        hash_grams=hash_grams,
    )
    agg = rep.groupBy(suite_col).agg(
        F.count("*").cast("bigint").alias("n_bench_docs"),
        F.sum(F.col("compromised").cast("bigint"))
        .cast("bigint")
        .alias("n_compromised"),
    )
    return agg.select(
        F.col(suite_col).alias("suite"),
        "n_bench_docs",
        "n_compromised",
        (
            F.expr("n_compromised * 1000000 DIV n_bench_docs") / F.lit(1e6)
        ).alias("contamination_rate"),
    ).orderBy("suite")


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    tokens_col: str | None = None,
    hash_grams: bool = False,
    broadcast: bool | None = None,
) -> DataFrame:
    """Training docs with the contaminated ones REMOVED — the apply
    step. One extra broadcast-able semi-join over the flagged ids.
    ``hash_grams``/``broadcast`` forward to
    :func:`contamination_report` (the huge-eval-suite scale knobs must
    be reachable from the step a pipeline actually runs; ``None`` =
    size-based auto cutover)."""
    flagged = contamination_report(
        docs, benchmark, n, min_hits, id_col, text_col, bench_text_col,
        hash_grams=hash_grams, broadcast=broadcast, tokens_col=tokens_col,
    ).filter(F.col("contaminated"))
    return docs.join(flagged.select(id_col), id_col, "left_anti")
