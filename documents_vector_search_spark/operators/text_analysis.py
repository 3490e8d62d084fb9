"""Text-analysis operators for training-data curation.

North-star additions (BASELINE.json): language ID, quality scoring,
token counting, document fingerprinting — each a pure Column expression
pipeline over the ``documents`` table, so a 100 TB curation sweep is a
single scan with zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documents_vector_search_spark.functions.hashing import md5_hash64
from documents_vector_search_spark.functions.text import WS_RUN_RE, tokenize

# Tiny per-language stopword marker lists for the n-gram/stopword-ratio
# language heuristic. Deliberately small and literal: the heuristic must
# be auditable and oracle-reproducible.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"],
}


def _marker_ratio(tokens: Column, markers: list[str]) -> Column:
    hits = F.size(
        F.filter(tokens, lambda t: t.isin(markers))
    )
    return F.when(F.size(tokens) > 0, hits / F.size(tokens)).otherwise(F.lit(0.0))


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID by stopword-marker ratio.

    ``(id, lang_guess, lang_score)`` — argmax over LANG_MARKERS with a
    deterministic tie-break on language code; 'und' (undetermined) when
    no marker hits at all.
    """
    # staged projections: `tokenize` and the sorted score array are each
    # materialized ONCE per row. Inlining them would re-evaluate the
    # tokenizer per marker-list reference and the sort per output column
    # (CollapseProject keeps stages whose outputs are non-cheap and
    # multiply referenced).
    toks = docs.select(F.col(id_col), tokenize(text_col).alias("_toks"))
    scores = F.array(
        *[
            F.struct(
                F.round(_marker_ratio(F.col("_toks"), m), 6).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, m in sorted(LANG_MARKERS.items())
        ]
    )
    # sort by (score desc, lang asc) deterministically via sort + head —
    # a reproducible argmax
    best = toks.select(
        F.col(id_col), F.sort_array(scores, asc=False)[0].alias("_best")
    )
    return best.select(
        F.col(id_col),
        F.when(F.col("_best.score") > 0, F.col("_best.lang"))
        .otherwise(F.lit("und"))
        .alias("lang_guess"),
        F.col("_best.score").alias("lang_score"),
    )


def _alpha_ratio(text_col: str):
    n_chars = F.length(F.col(text_col))
    alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", ""))
    return F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))


def quality_expr(tokens, text_col: str = "text"):
    """ROUNDED composite quality in [0, 1] from a STAGED token array —
    the single definition shared by the batch profile (quality_score)
    and the streaming intake gate (streaming/curation.py), so the two
    can never drift. Mean of three bounded sub-scores: length, alpha
    ratio, stopword naturalness."""
    n_tokens = F.size(tokens)
    length_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(_marker_ratio(tokens, LANG_MARKERS["en"]) * 5, F.lit(1.0))
    return F.round((length_score + _alpha_ratio(text_col) + stop_score) / 3, 6)


def quality_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality features + composite score.

    Features (all standard curation signals):
    - n_chars, n_tokens, avg token length
    - alpha_ratio: fraction of characters that are a-z (post-lower)
    - stopword_ratio: english-marker ratio (proxy for naturalness)
    Composite ``quality``: mean of three bounded sub-scores (length,
    alpha, stopword) in [0, 1] — transparent and easily re-weighted.
    """
    # stage the token array once (see language_id for why)
    toks = docs.select(
        F.col(id_col), F.col(text_col), tokenize(text_col).alias("_toks")
    )
    tokens = F.col("_toks")
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(tokens)
    avg_tok = F.when(
        n_tokens > 0,
        F.aggregate(
            tokens, F.lit(0), lambda acc, t: acc + F.length(t)
        )
        / n_tokens,
    ).otherwise(F.lit(0.0))
    alpha_ratio = _alpha_ratio(text_col)
    stop_ratio = _marker_ratio(tokens, LANG_MARKERS["en"])
    quality = quality_expr(tokens, text_col)

    return toks.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),  # quality_expr rounds
    )


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace tokens vs BPE-ish subword count estimate.

    ``bpe_estimate`` counts word pieces after splitting words longer
    than 4 chars into 4-char pieces — the cheap scan-time proxy for a
    real tokenizer (a real BPE runs as a pandas UDF at the embedding
    seam; counting must not cost a Python roundtrip at 100 TB).
    """
    ws_tokens = F.size(F.filter(F.split(F.col(text_col), WS_RUN_RE), lambda t: t != ""))
    words = tokenize(text_col)
    bpe = F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("bigint"),
    )
    return docs.select(
        F.col(id_col),
        ws_tokens.cast("bigint").alias("ws_tokens"),
        bpe.alias("bpe_estimate"),
    )


def fingerprint(
    docs: DataFrame,
    shingle_words: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-style min-hash).

    ``fp = min over shingles of hash(shingle)`` — robust to small edits
    anywhere except around the minimal shingle; equal fingerprints are
    strong near-dup evidence. One map-side pass, no shuffle: shingle
    ARRAY (operators/shingles.py shingle_array) → array_min(transform).
    """
    from documents_vector_search_spark.operators.shingles import shingle_array

    sa = shingle_array(docs, shingle_words, id_col, text_col, distinct=False)
    return sa.select(
        F.col("id").alias(id_col),
        F.array_min(
            F.transform("shingles", lambda s: md5_hash64(s))
        ).alias("fingerprint"),
    )


def tfidf_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — ``(id, term, tfidf,
    rank)``, rank 1..k by (score desc, term asc): the classic
    extractive summary/labeling signal a corpus browser or
    weak-supervision pipeline reads per document.

    Convention: sklearn's smooth idf (public), ``idf = ln((1 + N) /
    (1 + df)) + 1`` with raw tf — every constant explicit so the SQL
    oracle reproduces the doubles bit-for-bit; scores round to
    ``round_to`` BEFORE ranking (the engine-wide tie discipline).

    Scale shape (100 TB): tokenize+tf is one (id, term) shuffle
    (map-side combinable), df one term-keyed aggregate; the df join is
    term-keyed (vocabularies are broadcast-able when bounded); the
    final top-k is a per-document window rank — no global sort, no
    UDFs, no driver loops."""
    from pyspark.sql import Window

    base = docs.select(F.col(id_col), tokenize(text_col).alias("_toks"))
    tf = (
        base.select(F.col(id_col), F.explode_outer("_toks").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    n_docs = docs.select(F.count("*").alias("_n"))
    df_per_term = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df")
    )
    idf = F.log((1.0 + F.col("_n")) / (1.0 + F.col("df"))) + 1.0
    scored = (
        tf.join(df_per_term, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            F.round(F.col("tf") * idf, round_to).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
    round_to: int = 6,
) -> DataFrame:
    """Corpus-wide collocation extraction: the ``top_k`` adjacent token
    pairs by pointwise mutual information — ``(w1, w2, n, pmi,
    rank)``, PMI in bits = (ln p(ab) − ln p(a) − ln p(b)) / ln 2 with
    p(ab) over the bigram total and p(·) over the unigram total
    (Church & Hanks 1990). The "which word pairs are a unit" signal
    tokenizer and phrase-mining pipelines start from.

    Determinism: every count is an exact int64; the three ln() calls
    run on the same int/int doubles in both engines (the tfidf ln
    precedent) and the ln 2 divisor is a literal, so the rounded score
    ranks identically; ties break (pmi desc, w1, w2). ``min_count``
    filters noise pairs BEFORE the joins.

    Scale shape: one (w1, w2)-keyed aggregate over exploded bigrams
    (map-side combinable; the bigram structs come from ONE
    slice+transform per document — no self-join), two term-keyed
    joins onto the unigram table, two one-row broadcast totals, and a
    TakeOrdered — no global sort, no UDFs.
    """
    from pyspark.sql import Window

    # explode_outer + isNotNull on both generates: plain explode lets
    # InferFiltersFromGenerate push a size(...) > 0 predicate into the
    # scan that re-inlines the tokenizer per filter (the ngram_novelty
    # lesson, operators/dedup.py) — the outer NULL rows are filtered
    # right after, same row set
    base = docs.select(tokenize(text_col).alias("_toks"))
    uni = (
        base.select(F.explode_outer("_toks").alias("t"))
        .filter(F.col("t").isNotNull())
        .groupBy("t")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    pairs = (
        base.select(
            F.explode_outer(
                F.expr(
                    "transform(slice(_toks, 1, greatest(size(_toks) - 1, 0)), "
                    "(x, i) -> struct(x AS w1, _toks[i + 1] AS w2))"
                )
            ).alias("p")
        )
        .filter(F.col("p").isNotNull())
        .select("p.w1", "p.w2")
    )
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    n_uni = uni.agg(F.sum("c").alias("_nu"))
    n_big = pairs.agg(F.count("*").cast("bigint").alias("_nb"))
    ua = uni.select(F.col("t").alias("w1"), F.col("c").alias("_ca"))
    ub = uni.select(F.col("t").alias("w2"), F.col("c").alias("_cb"))
    ln2 = 0.6931471805599453
    scored = (
        big.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .select(
            "w1",
            "w2",
            "n",
            F.round(
                (
                    F.log(F.col("n") / F.col("_nb"))
                    - F.log(F.col("_ca") / F.col("_nu"))
                    - F.log(F.col("_cb") / F.col("_nu"))
                )
                / F.lit(ln2),
                round_to,
            ).alias("pmi"),
        )
    )
    # two-phase top-k (the spend_gini r11 discipline): orderBy+limit is
    # a TakeOrdered — per-partition partial top-k, never a
    # single-partition sort of the full bigram table — and the rank
    # window then runs over ONLY the top_k survivors (bounded by the
    # parameter, not the vocabulary)
    order = [F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()]
    topk = scored.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))
