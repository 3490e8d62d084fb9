"""Curation operators: repetition signals, PII redaction, line dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.curation import (
    line_dedup,
    pii_redact,
    repetition_signals,
)


@pytest.fixture(scope="module")
def rep_docs(spark):
    return spark.createDataFrame(
        [
            # 'a' appears 3/6 tokens; 'a b' twice of five 2-grams
            (1, "a b a b a c"),
            # all-distinct tokens, no repetition at all
            (2, "one two three four five six seven"),
            # heavy 5-gram repetition: the same 5-gram run repeated
            (3, "x y z w v " * 4),
            (4, ""),  # empty doc: all ratios 0
            (5, "solo"),  # 1 token: no 2-grams, no 5-grams
        ],
        ["doc_id", "text"],
    )


class TestRepetitionSignals:
    def test_values(self, rep_docs):
        rows = {
            r.doc_id: r for r in repetition_signals(rep_docs).collect()
        }
        r1 = rows[1]
        assert r1.n_tokens == 6
        assert r1.top_token_fraction == pytest.approx(3 / 6, abs=1e-6)
        assert r1.distinct_token_ratio == pytest.approx(3 / 6, abs=1e-6)
        assert r1.top_2gram_fraction == pytest.approx(2 / 5, abs=1e-6)

        r2 = rows[2]
        assert r2.distinct_token_ratio == 1.0
        assert r2.top_token_fraction == pytest.approx(1 / 7, abs=1e-6)
        assert r2.dup_5gram_fraction == 0.0

        r3 = rows[3]
        # 20 tokens -> 16 5-grams, only 5 distinct (cyclic text)
        assert r3.dup_5gram_fraction == pytest.approx(1 - 5 / 16, abs=1e-6)

        r4, r5 = rows[4], rows[5]
        for r in (r4, r5):
            assert r.top_2gram_fraction == 0.0
            assert r.dup_5gram_fraction == 0.0
        assert r4.n_tokens == 0 and r4.top_token_fraction == 0.0
        assert r5.n_tokens == 1 and r5.top_token_fraction == 1.0

    def test_map_only_plan(self, rep_docs):
        plan = (
            repetition_signals(rep_docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # zero shuffles


class TestGopherRules:
    """operators/curation.py::gopher_rules — the Gopher document-format
    gates (word stats / symbol / bullet / ellipsis / alpha / stop
    words)."""

    def _run(self, spark, text, **kw):
        from documents_vector_search_spark.operators.curation import (
            gopher_rules,
        )

        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        return gopher_rules(df, **kw).first()

    def test_word_and_format_signals(self, spark):
        text = "• first bullet line\n- second one here\nplain line ends...\nno marks at all"
        r = self._run(spark, text)
        assert r.n_words == 15
        assert r.bullet_line_frac == pytest.approx(2 / 4, abs=1e-6)
        assert r.ellipsis_line_frac == pytest.approx(1 / 4, abs=1e-6)
        # "•" and "-" carry no alphabetic char; "ends..." does
        assert r.alpha_word_frac == pytest.approx(13 / 15, abs=1e-6)

    def test_symbol_ratio_counts_hashes_and_ellipses(self, spark):
        r = self._run(spark, "alpha # beta ## gamma ... delta")
        # 3 '#' + 1 '...' over 7 whitespace words ('#'/'##'/'...' count
        # as words too, as Gopher's whitespace split does)
        assert r.n_words == 7
        assert r.symbol_ratio == pytest.approx(4 / 7, abs=1e-6)

    def test_stop_hits_use_engine_tokenizer(self, spark):
        # punctuation-attached forms still hit: "the," tokenizes to "the"
        r = self._run(spark, "the, cat sat with. a hat to be sure")
        assert r.n_stop_hits == 4  # the, with, to, be

    def test_keep_conjunction_and_thresholds(self, spark):
        good = " ".join(
            ["the quick brown fox jumps with energy over lazy dogs"] * 6
        )
        r = self._run(spark, good, min_words=50)
        assert r.n_words == 60 and bool(r.keep) is True
        r2 = self._run(spark, good, min_words=100)
        assert bool(r2.keep) is False  # word-count gate only
        r3 = self._run(spark, good, min_stop_hits=3)
        assert r3.n_stop_hits == 2 and bool(r3.keep) is False

    def test_empty_and_whitespace_docs(self, spark):
        for text in ["", "   "]:
            r = self._run(spark, text)
            assert r.n_words == 0
            assert r.mean_word_len == 0.0
            assert r.alpha_word_frac == 0.0
            assert bool(r.keep) is False

    def test_map_only_plan(self, spark):
        from documents_vector_search_spark.operators.curation import (
            gopher_rules,
        )

        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        plan = (
            gopher_rules(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


class TestC4Rules:
    """operators/curation.py::c4_rules — the C4 page-cleaning
    heuristics (terminal-punctuation line retention, min words per
    line, javascript boilerplate, lorem-ipsum / brace / min-sentence
    page gates)."""

    def _run(self, spark, text, **kw):
        from documents_vector_search_spark.operators.curation import c4_rules

        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        return c4_rules(df, **kw).first()

    def test_line_retention_rules(self, spark):
        text = (
            "This line ends with terminal punctuation properly.\n"
            "short line.\n"                       # < 5 words -> dropped
            "this one has no terminal punctuation at all\n"
            "Please enable javascript to view this page.\n"  # js -> drop
            'He said "quoted line with five words here."'    # quote ok
        )
        r = self._run(spark, text)
        assert r.n_lines == 5
        assert r.n_kept_lines == 2
        assert "short line." not in r.clean_text
        assert "javascript" not in r.clean_text
        assert r.clean_text.startswith("This line ends")

    def test_page_gates(self, spark):
        good = "\n".join(
            ["A full sentence with enough words here."] * 3
        )
        r = self._run(spark, good)
        assert r.n_sentences == 3 and bool(r.keep) is True
        # below min sentences
        r2 = self._run(spark, "A full sentence with enough words here.")
        assert bool(r2.keep) is False
        # lorem ipsum and brace gates hit the ORIGINAL text
        r3 = self._run(spark, good + "\nLorem Ipsum dolor sit amet?")
        assert bool(r3.has_lorem) and bool(r3.keep) is False
        r4 = self._run(spark, good + "\nfunction() { return 1; }")
        assert bool(r4.has_brace) and bool(r4.keep) is False

    def test_empty_doc(self, spark):
        r = self._run(spark, "")
        assert r.n_kept_lines == 0
        assert r.clean_text == ""
        assert bool(r.keep) is False

    def test_map_only_plan(self, spark):
        from documents_vector_search_spark.operators.curation import c4_rules

        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        plan = c4_rules(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


class TestPiiRedact:
    def test_masks_and_counts(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "mail bob.smith+x@corp.example.org now"),
                (2, "host 192.168.0.1 and 10.0.0.255 up"),
                (3, "ssn 123-45-6789 leaked"),
                (4, "clean text only"),
                (5, "a@b.io from 1.2.3.4 ssn 000-11-2222"),
            ],
            ["doc_id", "text"],
        )
        rows = {r.doc_id: r for r in pii_redact(docs).collect()}
        assert rows[1].clean_text == "mail <EMAIL> now"
        assert rows[1].n_email == 1 and rows[1].n_ipv4 == 0
        assert rows[2].clean_text == "host <IP> and <IP> up"
        assert rows[2].n_ipv4 == 2
        assert rows[3].clean_text == "ssn <SSN> leaked"
        assert rows[3].n_ssn == 1
        assert rows[4].clean_text == "clean text only"
        assert (rows[4].n_email, rows[4].n_ipv4, rows[4].n_ssn) == (0, 0, 0)
        assert rows[5].clean_text == "<EMAIL> from <IP> ssn <SSN>"

    def test_email_not_recounted_as_ip(self, spark):
        # an IP quad inside an email host is consumed by the email
        # replacement first and must not leak into the IP count
        docs = spark.createDataFrame(
            [(1, "x v1@10.2.3.44.example.com y")], ["doc_id", "text"]
        )
        r = pii_redact(docs).collect()[0]
        assert r.n_email == 1 and r.n_ipv4 == 0
        assert r.clean_text == "x <EMAIL> y"


class TestLineDedup:
    def test_corpus_first_occurrence_wins(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "alpha line\nshared line\nbeta line"),
                (2, "shared line\ngamma line"),  # 'shared line' dropped
                (3, "shared line"),  # everything dropped -> empty
            ],
            ["doc_id", "text"],
        )
        rows = {r.doc_id: r for r in line_dedup(docs).collect()}
        assert rows[1].text == "alpha line\nshared line\nbeta line"
        assert rows[1].n_lines_kept == 3 and rows[1].n_lines_removed == 0
        assert rows[2].text == "gamma line"
        assert rows[2].n_lines_kept == 1 and rows[2].n_lines_removed == 1
        assert rows[3].text == "" and rows[3].n_lines_kept == 0
        assert rows[3].n_lines_removed == 1

    def test_short_lines_exempt(self, spark):
        docs = spark.createDataFrame(
            [(1, "a\n\nb"), (2, "\nc\n")],
            ["doc_id", "text"],
        )
        rows = {r.doc_id: r for r in line_dedup(docs).collect()}
        # blank lines are exempt from dedup: kept everywhere
        assert rows[1].text == "a\n\nb"
        assert rows[2].text == "\nc\n"
        assert rows[2].n_lines_removed == 0

    def test_crlf_and_within_doc_dupes(self, spark):
        docs = spark.createDataFrame(
            [(1, "same\r\nsame\rsame\nlast")], ["doc_id", "text"]
        )
        r = line_dedup(docs).collect()[0]
        assert r.text == "same\nlast"
        assert r.n_lines_kept == 2 and r.n_lines_removed == 2


class TestPerplexity:
    def test_same_corpus_fit_orders_quality(self, spark):
        from documents_vector_search_spark.operators.curation import (
            fit_unigram_lm,
            perplexity_score,
        )

        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, "the the the the"),          # most common term only
                (3, "zyx qwv jkl"),              # all-rare terms
                (4, ""),                         # empty
            ],
            ["doc_id", "text"],
        )
        lm = fit_unigram_lm(docs)
        rows = {r.doc_id: r for r in perplexity_score(docs, lm).collect()}
        # common-token doc scores lower ppl than the all-rare doc
        assert rows[2].ppl < rows[1].ppl < rows[3].ppl
        assert rows[4].ppl == 0.0 and rows[4].n_tokens == 0
        assert rows[1].n_tokens == 6

    def test_oov_handling(self, spark):
        from documents_vector_search_spark.operators.curation import (
            fit_unigram_lm,
            perplexity_score,
        )

        train = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        test = spark.createDataFrame([(9, "a b unseen")], ["doc_id", "text"])
        lm = fit_unigram_lm(train)
        # inner-join semantics: OOV dropped from the mean
        r = perplexity_score(test, lm).collect()[0]
        assert r.n_tokens == 2
        # explicit OOV logprob: all three tokens count
        r2 = perplexity_score(test, lm, oov_lp_u=10_000_000).collect()[0]
        assert r2.n_tokens == 3
        assert r2.ppl > r.ppl


class TestCurationSweep:
    def test_single_scan_no_exchange(self, rep_docs):
        from documents_vector_search_spark.operators.curation import (
            curation_sweep,
        )

        plan = (
            curation_sweep(rep_docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # the whole sweep is one map stage

    def test_matches_individual_operators(self, rep_docs):
        from documents_vector_search_spark.operators.curation import (
            curation_sweep,
        )
        from documents_vector_search_spark.operators.text_analysis import (
            fingerprint,
            language_id,
            quality_score,
            token_counts,
        )

        sweep = {r.doc_id: r for r in curation_sweep(rep_docs).collect()}
        for r in language_id(rep_docs).collect():
            assert sweep[r.doc_id].lang_guess == r.lang_guess
            assert sweep[r.doc_id].lang_score == r.lang_score
        for r in quality_score(rep_docs).collect():
            assert sweep[r.doc_id].quality == r.quality
            assert sweep[r.doc_id].alpha_ratio == r.alpha_ratio
        for r in token_counts(rep_docs).collect():
            assert sweep[r.doc_id].ws_tokens == r.ws_tokens
            assert sweep[r.doc_id].bpe_estimate == r.bpe_estimate
        for r in fingerprint(rep_docs).collect():
            assert sweep[r.doc_id].fingerprint == r.fingerprint
        for r in repetition_signals(rep_docs).collect():
            assert sweep[r.doc_id].top_2gram_fraction == r.top_2gram_fraction
            assert sweep[r.doc_id].dup_5gram_fraction == r.dup_5gram_fraction


class TestVocabStats:
    def test_counts_and_order(self, spark):
        from documents_vector_search_spark.operators.curation import vocab_stats

        docs = spark.createDataFrame(
            [(1, "b a b a b"), (2, "b c"), (3, "a")], ["doc_id", "text"]
        )
        uni = vocab_stats(docs, top_k=10, ngram=1).collect()
        assert [(r.term, r.n, r.doc_freq) for r in uni] == [
            ("b", 4, 2), ("a", 3, 2), ("c", 1, 1),
        ]
        top2 = vocab_stats(docs, top_k=2, ngram=1).collect()
        assert [r.term for r in top2] == ["b", "a"]
        bi = vocab_stats(docs, top_k=10, ngram=2).collect()
        assert bi[0].term in ("a b", "b a")  # both occur twice in doc 1
        assert bi[0].n == 2

    def test_topk_is_take_ordered(self, spark):
        from documents_vector_search_spark.operators.curation import vocab_stats

        docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        plan = (
            vocab_stats(docs, top_k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan  # never a global sort


class TestCurationOnStream:
    def test_sweep_is_stream_compatible(self, spark, tmp_path):
        """Map-only curation ops run UNCHANGED on a streaming source —
        the batch/stream unification Spark gives a one-scan plan."""
        from documents_vector_search_spark.operators.curation import (
            curation_sweep,
        )

        docs = spark.createDataFrame(
            [(1, "the cat and the hat"), (2, "el gato y la casa")],
            ["doc_id", "text"],
        )
        src = str(tmp_path / "stream_src")
        docs.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
        out = curation_sweep(stream)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("sweep_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r.doc_id: r for r in spark.sql("SELECT * FROM sweep_stream").collect()}
        batch = {r.doc_id: r for r in curation_sweep(docs).collect()}
        assert got.keys() == batch.keys()
        for k in got:
            assert got[k] == batch[k]


class TestPackSequences:
    def test_packing_invariants(self, spark):
        from documents_vector_search_spark.operators.curation import (
            pack_sequences,
        )

        docs = spark.createDataFrame(
            [(i, "tok " * (i + 1)) for i in range(20)], ["doc_id", "text"]
        )
        out = pack_sequences(docs, token_budget=10, n_shards=4).collect()
        assert len(out) == 20
        by_shard: dict[int, list] = {}
        for r in out:
            assert 0 <= r.shard < 4
            assert r.pack_offset < 10  # offset always inside the budget
            by_shard.setdefault(r.shard, []).append(r)
        for shard_rows in by_shard.values():
            shard_rows.sort(key=lambda r: r.doc_id)
            cum = 0
            for r in shard_rows:
                assert r.pack_id == cum // 10  # pack = budget window of cumsum
                assert r.pack_offset == cum % 10
                cum += r.n_tokens

    def test_deterministic_across_runs(self, spark):
        from documents_vector_search_spark.operators.curation import (
            pack_sequences,
        )

        docs = spark.createDataFrame(
            [(i, "a b c") for i in range(50)], ["doc_id", "text"]
        )
        a = sorted(map(tuple, pack_sequences(docs, 7, 8).collect()))
        b = sorted(map(tuple, pack_sequences(docs, 7, 8).collect()))
        assert a == b
        c = sorted(map(tuple, pack_sequences(docs, 7, 8, seed=1).collect()))
        assert a != c  # seed changes the shard assignment

    def test_validation(self, spark):
        from documents_vector_search_spark.operators.curation import (
            pack_sequences,
        )
        import pytest as _pytest

        docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with _pytest.raises(ValueError):
            pack_sequences(docs, token_budget=0)


class TestUrlOps:
    """operators/urls.py — URL normalization, domain extraction, and
    URL-keyed first-wins dedup (the zero-content-comparison tier)."""

    def _norm(self, spark, urls):
        from documents_vector_search_spark.operators.urls import url_normalize

        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], ["doc_id", "url"]
        )
        rows = df.select(
            "doc_id", url_normalize(F.col("url")).alias("n")
        ).collect()
        return [r.n for r in sorted(rows, key=lambda r: r.doc_id)]

    def test_normalization_rules(self, spark):
        got = self._norm(spark, [
            "HTTP://Example.COM/Path/File?q=1#frag",   # case + fragment
            "http://example.com:80/a",                  # default port
            "https://example.com:443/a",
            "http://example.com:8080/a",                # non-default kept
            "https://example.com/p?utm_source=x&id=1&utm_campaign=y",
            "https://example.com/p?utm_source=x",       # only tracking
            "http://example.com/p?id=1&fbclid=abc",
        ])
        assert got == [
            "http://example.com/Path/File?q=1",
            "http://example.com/a",
            "https://example.com/a",
            "http://example.com:8080/a",
            "https://example.com/p?id=1",
            "https://example.com/p",
            "http://example.com/p?id=1",
        ]

    def test_schemeless_passthrough(self, spark):
        got = self._norm(spark, ["example.com/Path?utm_source=x#f"])
        assert got == ["example.com/Path"]

    def test_tracking_strip_is_separator_anchored(self, spark):
        # a param whose NAME merely contains a tracking name, or a path
        # segment containing 'ref=', must survive untouched — without
        # the [?&] anchor these used to collapse distinct URLs onto one
        # corrupted norm_url and url_dedup silently dropped documents
        got = self._norm(spark, [
            "http://a.com/p?href=x",            # 'ref' inside 'href'
            "http://a.com/p?noutm_a=1",         # 'utm_' inside 'noutm_'
            "http://a.com/path/ref=sr_1",       # path segment, no query
            "http://a.com/p?ref=x",             # the real param IS cut
            "http://a.com/p?utm_a=1&utm_b=2",   # consecutive tracking
            "http://a.com/p?a=1&ref=x&b=2",     # mid-query tracking
        ])
        assert got == [
            "http://a.com/p?href=x",
            "http://a.com/p?noutm_a=1",
            "http://a.com/path/ref=sr_1",
            "http://a.com/p",
            "http://a.com/p",
            "http://a.com/p?a=1&b=2",
        ]

    def test_host_and_domain(self, spark):
        from documents_vector_search_spark.operators.urls import url_report

        df = spark.createDataFrame(
            [(1, "https://Sub.News.Example.CO/a"), (2, "no-scheme/x"),
             (3, "http://localhost/y")],
            ["doc_id", "url"],
        )
        rows = {r.doc_id: r for r in url_report(df).collect()}
        assert rows[1].host == "sub.news.example.co"
        assert rows[1].domain == "example.co"
        assert rows[2].host == "" and rows[2].domain == ""
        # single-label host: no dot pair to extract, so the host itself
        # is the domain (a blocklist entry 'localhost' must match)
        assert rows[3].host == "localhost" and rows[3].domain == "localhost"

    def test_public_suffix_registered_domains(self, spark):
        """co.uk/com.au-class hosts group on the PSL-listed suffix plus
        one label, 3-label private suffixes (s3.amazonaws.com,
        github.io) keep the subdomain as the registrant, a host that IS
        a public suffix returns itself, and unlisted TLDs keep the
        last-two-labels fallback."""
        from documents_vector_search_spark.operators.urls import url_report

        cases = [
            (1, "https://Shop.Example.CO.UK/a", "example.co.uk"),
            (2, "http://www.news.example.com.au/b", "example.com.au"),
            (3, "https://bucket.s3.amazonaws.com/key", "bucket.s3.amazonaws.com"),
            (4, "https://user.github.io/repo", "user.github.io"),
            (5, "http://co.uk/", "co.uk"),  # host IS a public suffix
            (6, "http://deep.sub.example.org/x", "example.org"),  # fallback
            (7, "http://school.act.edu.au/x", "school.act.edu.au"),
        ]
        df = spark.createDataFrame(
            [(i, u) for i, u, _ in cases], ["doc_id", "url"]
        )
        rows = {r.doc_id: r.domain for r in url_report(df).collect()}
        assert rows == {i: d for i, _, d in cases}

    def test_wildcard_and_exception_rules(self, spark):
        """*.ck-class wildcards: every second-level label under the
        parent is a public suffix, so registrables have 3 labels —
        except the published !www.ck exception, which IS registrable;
        exceptions beat wildcards (the PSL prevailing-rule order)."""
        from documents_vector_search_spark.operators.urls import url_report

        cases = [
            (1, "http://shop.foo.ck/a", "shop.foo.ck"),   # *.ck
            (2, "http://deep.shop.foo.ck/a", "shop.foo.ck"),
            (3, "http://foo.ck/a", "foo.ck"),  # IS a public suffix
            (4, "http://www.ck/a", "www.ck"),  # !www.ck exception
            (5, "http://sub.www.ck/a", "www.ck"),
            (6, "http://x.example.bd/a", "x.example.bd"),  # *.bd
        ]
        df = spark.createDataFrame(
            [(i, u) for i, u, _ in cases], ["doc_id", "url"]
        )
        rows = {r.doc_id: r.domain for r in url_report(df).collect()}
        assert rows == {i: d for i, _, d in cases}

    def test_custom_suffix_table_overrides_snapshot(self, spark):
        from documents_vector_search_spark.operators.urls import (
            with_registered_domain,
        )

        df = spark.createDataFrame(
            [(1, "a.b.custom.tld"), (2, "x.example.co.uk")],
            ["doc_id", "host"],
        )
        suffixes = spark.createDataFrame([("custom.tld",)], ["suffix"])
        rows = {
            r.doc_id: r.domain
            for r in with_registered_domain(df, suffixes=suffixes).collect()
        }
        # custom table wins; co.uk is NOT in it, so fallback applies
        assert rows == {1: "b.custom.tld", 2: "co.uk"}

    def test_dedup_keeps_min_id_per_norm_url(self, spark):
        from documents_vector_search_spark.operators.urls import (
            url_dedup_report,
        )

        df = spark.createDataFrame(
            [
                (5, "http://a.com/x?utm_source=1"),
                (2, "HTTP://A.com/x"),
                (9, "http://a.com/x#frag"),
                (1, "http://a.com/other"),
            ],
            ["doc_id", "url"],
        )
        rows = {r.doc_id: bool(r.keep) for r in url_dedup_report(df).collect()}
        # 2, 5, 9 all normalize to http://a.com/x -> min id 2 survives
        assert rows == {1: True, 2: True, 5: False, 9: False}

    def test_normalize_is_map_only(self, spark):
        from documents_vector_search_spark.operators.urls import url_report

        df = spark.createDataFrame([(1, "http://a.com/x")], ["doc_id", "url"])
        plan = url_report(df)._jdf.queryExecution().executedPlan().toString()
        # the PSL probes are BROADCAST exchanges (map-side); the corpus
        # itself must never shuffle
        assert "Exchange hashpartitioning" not in plan
        assert "BatchEvalPython" not in plan


class TestDomainGate:
    def test_blocks_listed_domains_via_broadcast_anti_join(self, spark):
        from documents_vector_search_spark.operators.urls import domain_gate

        docs = spark.createDataFrame(
            [
                (1, "http://Ads.Spam.COM/x"),
                (2, "https://good.example.org/y"),
                (3, "http://tracker.spam.com:80/z"),
                (4, "https://news.example.net/a"),
            ],
            ["doc_id", "url"],
        )
        bl = spark.createDataFrame([("spam.com",)], ["domain"])
        out = domain_gate(docs, bl)
        rows = {r.doc_id: r for r in out.collect()}
        assert set(rows) == {2, 4}
        assert rows[2].domain == "example.org"
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
