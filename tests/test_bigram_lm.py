"""Interpolated bigram LM: hand-checked math, fallback on unseen
bigrams, and empty-document conventions."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from documents_vector_search_spark.operators.curation import (
    fit_bigram_lm,
    fit_unigram_lm,
    perplexity_bigram_score,
)

ALPHA, LAM = 0.5, 0.7


def _py_lm(corpus_texts):
    """Python reference of fit_unigram_lm + fit_bigram_lm."""
    toks = [t.lower().split() for t in corpus_texts]
    c, c2, c1 = {}, {}, {}
    for ts in toks:
        for w in ts:
            c[w] = c.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    n, v = sum(c.values()), len(c)
    p_uni = {w: (cc + ALPHA) / (n + ALPHA * v) for w, cc in c.items()}
    lp_u = {w: math.floor(-math.log2(p) * 1e6 + 0.5) for w, p in p_uni.items()}
    lp2 = {
        (a, b): math.floor(
            -math.log2(
                LAM * ((cc + ALPHA) / (c1[a] + ALPHA * v))
                + (1.0 - LAM) * p_uni[b]
            )
            * 1e6
            + 0.5
        )
        for (a, b), cc in c2.items()
    }
    lp_fb = {
        w: math.floor(-math.log2((1.0 - LAM) * p) * 1e6 + 0.5)
        for w, p in p_uni.items()
    }
    return lp_u, lp2, lp_fb


def _py_ppl(text, lp_u, lp2, lp_fb):
    ts = text.lower().split()
    if not ts:
        return 0, 0.0
    s = lp_u[ts[0]]
    for a, b in zip(ts, ts[1:]):
        s += lp2.get((a, b), lp_fb.get(b))
    return len(ts), round(2.0 ** ((s / 1e6) / len(ts)), 6)


class TestBigramPerplexity:
    def test_matches_python_reference_including_fallback(self, spark):
        """LM fit on one corpus, scored on another containing bigrams
        the LM never saw — the fallback branch must fire and match the
        reference computation exactly."""
        fit_rows = [
            ("f1", "the cat sat on the mat"),
            ("f2", "the cat ran fast"),
            ("f3", "a dog ran home"),
        ]
        score_rows = [
            ("s1", "the cat ran home"),   # 'ran home' seen, 'cat ran' seen
            ("s2", "the dog sat"),        # 'the dog' and 'dog sat' UNSEEN
            ("s3", ""),                    # empty
        ]
        fit_df = spark.createDataFrame(fit_rows, "doc_id string, text string")
        score_df = spark.createDataFrame(
            score_rows, "doc_id string, text string"
        )
        uni = fit_unigram_lm(fit_df, alpha=ALPHA)
        bi, fb = fit_bigram_lm(fit_df, alpha=ALPHA, lam=LAM)
        got = {
            r.doc_id: (r.n_tokens, r.ppl)
            for r in perplexity_bigram_score(
                score_df, uni, bi, fb, id_col="doc_id"
            ).collect()
        }
        lp_u, lp2, lp_fb = _py_lm([t for _, t in fit_rows])
        for rid, text in score_rows:
            assert got[rid] == _py_ppl(text, lp_u, lp2, lp_fb), rid
        # the unseen-bigram doc really exercised the fallback
        assert ("the", "dog") not in lp2 and ("dog", "sat") not in lp2

    def test_oov_tokens_take_the_explicit_penalty(self, spark):
        """Scoring text OUTSIDE the training vocabulary: with the
        default (documented shared-vocabulary contract) OOV tokens drop
        from both the sum and n_tokens; with an explicit oov_lp_micro
        every token scores — unknown firsts and unknown fallback words
        take the penalty, so n_tokens equals the real token count."""
        fit_df = spark.createDataFrame(
            [("f1", "the cat sat"), ("f2", "the cat ran")],
            "doc_id string, text string",
        )
        uni = fit_unigram_lm(fit_df, alpha=ALPHA)
        bi, fb = fit_bigram_lm(fit_df, alpha=ALPHA, lam=LAM)
        score_df = spark.createDataFrame(
            [("s1", "zebra the cat qux")],  # zebra + qux are OOV
            "doc_id string, text string",
        )
        dropped = perplexity_bigram_score(
            score_df, uni, bi, fb, id_col="doc_id"
        ).collect()[0]
        # default: OOV first token and OOV pair-target vanish
        assert dropped.n_tokens < 4

        oov_lp = 25_000_000  # ~2^-25 per token, a harsh penalty
        scored = perplexity_bigram_score(
            score_df, uni, bi, fb, id_col="doc_id", oov_lp_micro=oov_lp
        ).collect()[0]
        assert scored.n_tokens == 4
        # reference: zebra(first, OOV) + (zebra,the)->fallback(the)
        # + (the,cat) seen + (cat,qux)->OOV
        lp_u, lp2, lp_fb = _py_lm(["the cat sat", "the cat ran"])
        s = oov_lp + lp_fb["the"] + lp2[("the", "cat")] + oov_lp
        assert scored.ppl == round(2.0 ** ((s / 1e6) / 4), 6)

    def test_repetition_scores_lower_than_scrambled(self, spark):
        """The signal the bigram model adds over unigram: a scrambled
        permutation has the SAME unigram distribution but much higher
        bigram perplexity than the natural text it permutes."""
        corpus = spark.createDataFrame(
            [(f"d{i}", "the quick brown fox jumps over the lazy dog") for i in range(5)]
            + [("dx", "dog lazy the over jumps fox brown quick the")],
            "doc_id string, text string",
        )
        uni = fit_unigram_lm(corpus, alpha=ALPHA)
        bi, fb = fit_bigram_lm(corpus, alpha=ALPHA, lam=LAM)
        got = {
            r.doc_id: r.ppl
            for r in perplexity_bigram_score(corpus, uni, bi, fb, id_col="doc_id").collect()
        }
        assert got["dx"] > got["d0"] * 2
