"""Fuzzy term matching, spell correction, and prefix suggestions.

The lexical-robustness layer every production search engine carries
(Lucene FuzzyQuery / Elasticsearch `fuzziness` / "did you mean")
re-expressed for Spark at corpus scale.

The scale problem: matching a query term against a vocabulary within
edit distance d must NOT be a levenshtein scan of the whole vocabulary
(10^7-10^8 distinct terms at 100 TB). We use the SymSpell reduction
(Garbe's symmetric-deletion spelling correction, public algorithm):

    lev(a, b) <= d  =>  deletions_d(a) ∩ deletions_d(b) != ∅

where deletions_d(x) is x plus every string obtainable by deleting up
to d characters. So the engine precomputes a DELETION INDEX of the
vocabulary — explode each term's deletion variants, one row per
(variant, term) — and a query term probes it with an IN-list of its
own (few) deletion variants: an equi-join / pushed filter, never a
distance scan. The deletion condition is a SUPERSET of the true
matches, so survivors are verified with an exact ``levenshtein``
(both Spark and ANSI-SQL engines implement the same classic DP, which
is what makes the DuckDB oracles exact).

Index sizing: d=1 multiplies vocabulary rows by ~(avg_len + 1); d=2 by
~(avg_len^2 / 2). Both are vocabulary-sized artifacts (millions-to-
billions of tiny rows), written once beside the postings and bucketed
by a hash of the variant so a probe prunes to its variants' buckets.

Cited reference scope: the reference has no fuzzy matching (its FTS
path is exact conjunctive terms, main/indexes/indexers/
sqllite_indexer.py:145-150) — this module is part of the
beyond-reference search surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletions_of(col) -> "F.Column":
    """array<string> of every single-character deletion of ``col``.
    Pure Column algebra (whole-stage codegen, no UDF); guarded for the
    empty string (sequence(1, 0) is DESCENDING in Spark, not empty).
    Single-parameter lambdas only — F.transform feeds the element
    index to a second lambda parameter."""
    return F.when(F.length(col) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                col.substr(F.lit(1), i - 1), col.substr(i + 1, F.length(col))
            ),
        )
    )


def deletions_py(term: str, max_edits: int = 1) -> list[str]:
    """Driver-side twin of the deletion expansion, up to ``max_edits``
    deletions (query terms are few — this is the probe side)."""
    out = {term}
    frontier = {term}
    for _ in range(max_edits):
        frontier = {
            s[:i] + s[i + 1 :] for s in frontier for i in range(len(s))
        }
        out |= frontier
    return sorted(out)


def build_term_dictionary(
    postings: DataFrame, term_col: str = "term", tf_col: str = "tf"
) -> DataFrame:
    """``(term, ctf, df)`` vocabulary from a postings table — one
    map-side-combinable aggregation."""
    return postings.groupBy(term_col).agg(
        F.sum(tf_col).cast("bigint").alias("ctf"),
        F.count("*").cast("bigint").alias("df"),
    )


def build_deletion_index(
    vocab: DataFrame, term_col: str = "term", max_edits: int = 1
) -> DataFrame:
    """``(variant, term, ctf)`` symmetric-deletion index of the
    vocabulary. ``max_edits=2`` nests the expansion (distinct-ed per
    term). Write it partitioned/bucketed by a hash of ``variant`` for
    probe-side pruning."""
    term = F.col(term_col)
    dels = F.array_union(F.array(term), _deletions_of(term))
    if max_edits >= 2:
        dels = F.array_distinct(
            F.flatten(
                F.transform(
                    dels, lambda t: F.array_union(F.array(t), _deletions_of(t))
                )
            )
        )
    cols = [c for c in ("ctf", "df") if c in vocab.columns]
    return vocab.select(
        term_col, *cols, F.explode(F.array_distinct(dels)).alias("variant")
    )


def fuzzy_candidates(
    deletion_index: DataFrame,
    query_term: str,
    max_edits: int = 1,
    term_col: str = "term",
) -> DataFrame:
    """Vocabulary terms within ``max_edits`` of ``query_term`` —
    ``(term, ctf, lev)``. Probe = pushed IN-list of the query's
    deletion variants, then exact levenshtein verification (the
    SymSpell superset made exact)."""
    probes = deletions_py(query_term.lower(), max_edits)
    cols = [c for c in ("ctf", "df") if c in deletion_index.columns]
    return (
        deletion_index.filter(F.col("variant").isin(probes))
        .select(term_col, *cols)
        .distinct()
        .withColumn("lev", F.levenshtein(F.col(term_col), F.lit(query_term.lower())))
        .filter(F.col("lev") <= max_edits)
    )


def spell_corrections(
    vocab: DataFrame | None,
    query_terms: list[str],
    max_edits: int = 1,
    term_col: str = "term",
    prefer_exact: bool = False,
    deletion_index: DataFrame | None = None,
) -> DataFrame:
    """Best dictionary suggestion per query term — ``(qraw,
    suggestion, ctf)``, suggestion = the most frequent in-vocabulary
    term within ``max_edits`` (ties: smallest edit distance, then
    lexicographic — fully deterministic). Terms with no candidate get
    a NULL suggestion. ``prefer_exact`` keeps a term that IS in the
    vocabulary as its own suggestion regardless of neighbors'
    frequencies — the search-time convention (don't "correct" a word
    the corpus actually contains).

    One deletion-index probe for ALL query terms (the probe lists
    union into one pushed filter; each candidate then verifies against
    its own query term).

    ``deletion_index`` supplies a PREBUILT index (a collection's
    ``deletion_index`` table, collection/fuzzy_artifacts.py) instead
    of deriving one from ``vocab``; a ``variant_bucket`` column, if
    present, prunes the scan to the probe variants' partitions."""
    from pyspark.sql import Window

    lowered = list(dict.fromkeys(q.lower() for q in query_terms))
    qrows = [(q, v) for q in lowered for v in deletions_py(q, max_edits)]
    if deletion_index is not None:
        didx = deletion_index
        if "variant_bucket" in didx.columns:
            from documents_vector_search_spark.operators.bm25 import (
                term_bucket_py,
            )

            buckets = sorted({term_bucket_py(v) for _, v in qrows})
            didx = didx.filter(F.col("variant_bucket").isin(buckets))
        didx = didx.filter(F.col("variant").isin([v for _, v in qrows]))
    else:
        # implied predicate of the variant equi-join: a term of length
        # L only produces variants of lengths [L-max_edits, L], so it
        # can only match some query term q when
        # L ∈ [len(q)-max_edits, len(q)+max_edits]. Filtering the
        # vocabulary to that length set BEFORE the deletion explode
        # prunes the vocabulary-sized variant expansion to a sliver,
        # and (length(term) being a function of the grouping key) the
        # predicate pushes below the vocab aggregate into the token
        # stream. Value-identical: excluded terms could never join.
        lengths = sorted(
            {
                len(q) + d
                for q in lowered
                for d in range(-max_edits, max_edits + 1)
                if len(q) + d > 0
            }
        )
        pruned = vocab.filter(F.length(F.col(term_col)).isin(lengths))
        didx = build_deletion_index(
            pruned, term_col=term_col, max_edits=max_edits
        )
    spark = (vocab if vocab is not None else deletion_index).sparkSession
    probes = spark.createDataFrame(qrows, "qraw string, variant string")
    cand = (
        didx.join(F.broadcast(probes), "variant")
        .select("qraw", term_col, "ctf")
        .distinct()
        .withColumn("lev", F.levenshtein(F.col(term_col), F.col("qraw")))
        .filter(F.col("lev") <= max_edits)
    )
    order = [F.col("ctf").desc(), F.col("lev").asc(), F.col(term_col).asc()]
    if prefer_exact:
        order = [(F.col("lev") == 0).desc()] + order
    w = Window.partitionBy("qraw").orderBy(*order)
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("qraw", F.col(term_col).alias("suggestion"), "ctf")
    )
    all_q = spark.createDataFrame([(q,) for q in lowered], "qraw string")
    return all_q.join(best, "qraw", "left")


def suggest_prefix(
    vocab: DataFrame, prefix: str, k: int = 10, term_col: str = "term"
) -> DataFrame:
    """Autocomplete: top-k vocabulary terms with ``prefix``, most
    frequent first, ties lexicographic. The StartsWith predicate pushes
    into the scan of a prefix-sorted vocabulary table (range pruning on
    parquet min/max stats)."""
    return (
        vocab.filter(F.col(term_col).startswith(prefix.lower()))
        .orderBy(F.col("ctf").desc(), F.col(term_col).asc())
        .limit(k)
    )


def fuzzy_bm25_topk(
    docs: DataFrame,
    query: str,
    k: int,
    max_edits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = 6,
) -> DataFrame:
    """Typo-tolerant search: spell-correct the query against the
    corpus vocabulary (prefer_exact semantics), then conjunctive BM25
    over the corrected terms — ``(id, score)`` descending.

    Uncorrectable terms (no vocabulary candidate within ``max_edits``)
    are DROPPED from the query — the lenient convention (the strict
    alternative would empty every result). Two raw terms correcting to
    the same word collapse into one conjunct.

    The correction round-trip collects |query terms| rows (bounded,
    like RM3's feedback terms); scoring reuses the postings already
    built for the dictionary, so the corpus is tokenized once. A
    serving deployment keeps the dictionary/deletion index as
    collection artifacts instead of deriving them per query.
    """
    from documents_vector_search_spark.operators.bm25 import (
        _query_terms,
        bm25_topk,
        build_doc_stats,
        build_postings,
    )

    terms = _query_terms(query)
    if not terms:
        return docs.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)
    postings = build_postings(docs, id_col=id_col, text_col=text_col)
    vocab = build_term_dictionary(postings)
    corr = spell_corrections(
        vocab, terms, max_edits=max_edits, prefer_exact=True
    )
    corrected = list(
        dict.fromkeys(
            r["suggestion"] for r in corr.collect() if r["suggestion"]
        )
    )
    if not corrected:
        return docs.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)
    return bm25_topk(
        docs,
        " ".join(corrected),
        k,
        id_col=id_col,
        text_col=text_col,
        round_to=round_to,
        postings=postings,
        doc_stats=build_doc_stats(docs, id_col=id_col, text_col=text_col),
    )
