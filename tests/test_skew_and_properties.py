"""Salted aggregation + hypothesis property tests for core invariants."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.skew import salted_aggregate
from documents_vector_search_spark.operators.recursive_split import (
    split_text_recursive,
)
from documents_vector_search_spark.plans.filter_compiler import filter_to_sql
from documents_vector_search_spark.plans.filter_language import (
    FilterCondition,
    FilterGroup,
    parse_filter,
)


class TestSaltedAggregate:
    def test_matches_plain_groupby(self, spark):
        df = spark.createDataFrame(
            [("hot", float(i % 7)) for i in range(500)]
            + [("cold", float(i)) for i in range(20)],
            ["key", "value"],
        )
        salted = {
            r.key: r
            for r in salted_aggregate(
                df,
                ["key"],
                {
                    "n": ("count", "*"),
                    "total": ("sum", "value"),
                    "lo": ("min", "value"),
                    "hi": ("max", "value"),
                },
                num_salts=8,
            ).collect()
        }
        plain = {
            r.key: r
            for r in df.groupBy("key")
            .agg(
                F.count("*").alias("n"),
                F.sum("value").alias("total"),
                F.min("value").alias("lo"),
                F.max("value").alias("hi"),
            )
            .collect()
        }
        for key in plain:
            assert salted[key].n == plain[key].n
            assert salted[key].total == pytest.approx(plain[key].total)
            assert salted[key].lo == plain[key].lo
            assert salted[key].hi == plain[key].hi

    def test_rejects_non_decomposable(self, spark):
        df = spark.createDataFrame([("a", 1.0)], ["key", "value"])
        with pytest.raises(ValueError, match="unsupported"):
            salted_aggregate(df, ["key"], {"m": ("median", "value")})


# ---------------------------------------------------------------------------
# property tests (pure-Python fast paths — no Spark in the loop)
# ---------------------------------------------------------------------------

_words = st.text(alphabet="abcde", min_size=1, max_size=6)


@st.composite
def filter_asts(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        field = draw(st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True))
        op = draw(st.sampled_from(["=", "!=", ">", ">=", "<", "<="]))
        value = draw(st.text(min_size=0, max_size=10).filter(lambda s: "\\" not in s))
        return FilterCondition(field, op, value)
    bool_op = draw(st.sampled_from(["and", "or"]))
    n = draw(st.integers(2, 3))
    children = [draw(filter_asts(depth=depth + 1)) for _ in range(n)]
    # parser flattens same-op nesting; avoid generating a child group
    # with the same op so ASTs round-trip structurally
    children = [
        c
        for c in children
        if not (isinstance(c, FilterGroup) and c.op == bool_op)
    ] or [FilterCondition("x", "=", "1")]
    if len(children) == 1:
        return children[0]
    return FilterGroup(bool_op, children)


def render(node) -> str:
    if isinstance(node, FilterCondition):
        escaped = node.value.replace('"', '\\"')
        return f'{node.field} {node.op} "{escaped}"'
    parts = []
    for c in node.children:
        rendered = render(c)
        if isinstance(c, FilterGroup):
            rendered = f"({rendered})"
        parts.append(rendered)
    return f" {node.op} ".join(parts)


class TestFilterLanguageProperties:
    @given(filter_asts())
    @settings(max_examples=200, deadline=None)
    def test_render_parse_roundtrip(self, ast):
        assert parse_filter(render(ast)) == ast

    @given(filter_asts())
    @settings(max_examples=100, deadline=None)
    def test_sql_rendering_always_parenthesized(self, ast):
        sql = filter_to_sql(ast)
        assert sql.startswith("(") and sql.endswith(")")


class TestSplitterProperties:
    @given(
        st.text(alphabet="ab \n", max_size=600),
        st.integers(10, 120),
    )
    @settings(max_examples=150, deadline=None)
    def test_chunks_bounded_and_lossless_core(self, text, chunk_size):
        overlap = chunk_size // 5
        chunks = split_text_recursive(text, chunk_size, overlap)
        assert all(len(c) <= chunk_size for c in chunks)
        # every chunk is a substring of the original text
        for c in chunks:
            assert c in text
        # non-whitespace content is preserved (overlap only duplicates)
        joined = "".join(chunks)
        for ch in set(text):
            if not ch.isspace():
                assert joined.count(ch) >= text.count(ch)


PY_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def py_tokenize(text: str) -> list[str]:
    return [t for t in PY_TOKEN_RE.split(text.lower()) if t]


class TestTokenizerProperty:
    @given(st.lists(_words, max_size=30))
    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_spark_tokenizer_matches_python_twin(self, spark, words):
        from documents_vector_search_spark.functions.text import tokenize

        text = " ".join(words)
        got = (
            spark.range(1)
            .select(tokenize(F.lit(text)).alias("t"))
            .first()
            .t
        )
        assert got == py_tokenize(text)


class TestFixedHistogram:
    def test_bins_and_overflow(self, spark):
        from documents_vector_search_spark.operators.sketches import (
            fixed_histogram,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(-5.0,), (0.0,), (4.9,), (5.0,), (99.9,), (100.0,), (250.0,)],
            ["v"],
        )
        rows = {r.bin: r for r in fixed_histogram(df, F.col("v"), 0.0, 100.0, 20).collect()}
        assert rows[-1].n == 1          # below range
        assert rows[0].n == 2           # [0, 5): 0.0 and 4.9
        assert rows[1].n == 1           # [5, 10): 5.0
        assert rows[19].n == 1          # [95, 100): 99.9
        assert rows[20].n == 2          # >= hi overflow
        assert (rows[0].lo, rows[0].hi) == (0.0, 5.0)

    def test_validation(self, spark):
        from documents_vector_search_spark.operators.sketches import (
            fixed_histogram,
        )
        from pyspark.sql import functions as F
        import pytest as _pytest

        df = spark.createDataFrame([(1.0,)], ["v"])
        with _pytest.raises(ValueError):
            fixed_histogram(df, F.col("v"), 5.0, 5.0, 10)
        with _pytest.raises(ValueError):
            fixed_histogram(df, F.col("v"), 0.0, 1.0, 0)


class TestIntervalJoinProperty:
    """Property: the binned interval join equals the brute-force
    containment check for ANY event/interval configuration — binning is
    purely a physical strategy."""

    @given(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
                 max_size=40),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),
                st.integers(min_value=0, max_value=3_000),
            ),
            min_size=1,
            max_size=8,
        ),
        st.sampled_from([60, 3600, 86400]),
    )
    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_matches_brute_force(self, spark, ev_offsets, iv_specs, bin_s):
        from datetime import datetime, timedelta

        from documents_vector_search_spark.operators.interval_join import (
            interval_join,
        )

        base = datetime(2024, 1, 1)
        ev_rows = [
            (i, base + timedelta(seconds=off))
            for i, off in enumerate(ev_offsets)
        ]
        iv_rows = [
            (j, base + timedelta(seconds=s), base + timedelta(seconds=s + d))
            for j, (s, d) in enumerate(iv_specs)
        ]
        ev = spark.createDataFrame(ev_rows, ["event_id", "ts"])
        iv = spark.createDataFrame(iv_rows, ["iv_id", "start", "end"])
        got = {
            (r.event_id, r.iv_id)
            for r in interval_join(ev, iv, bin_seconds=bin_s).collect()
        }
        expect = {
            (i, j)
            for i, ts in ev_rows
            for j, s, e in iv_rows
            if s <= ts < e
        }
        assert got == expect


class TestRepeatedSpanDifferential:
    """repeated_span_report vs a brute-force pure-Python twin — a
    second oracle (beyond the DuckDB one) for the newest operator."""

    K = 3
    _span_doc = st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=12
    )

    @staticmethod
    def _py_report(texts, k, min_docs):
        spans = {}
        for d, t in texts.items():
            toks = py_tokenize(t)
            if not toks:
                spans[d] = []
                continue
            n = max(len(toks) - k + 1, 1)
            spans[d] = [" ".join(toks[i : i + k]) for i in range(n)]
        docs_per_span: dict = {}
        for d, ss in spans.items():
            for s in set(ss):
                docs_per_span.setdefault(s, set()).add(d)
        rep = {s for s, ds in docs_per_span.items() if len(ds) >= min_docs}
        out = {}
        for d, ss in spans.items():
            n_spans = len(ss)
            dup = sum(1 for s in ss if s in rep)
            out[d] = (n_spans, dup, (dup / n_spans) if n_spans else 0.0)
        return out

    @given(st.lists(_span_doc, min_size=2, max_size=4))
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_matches_python_brute_force(self, spark, docs_words):
        from documents_vector_search_spark.operators.dedup import (
            repeated_span_report,
        )

        texts = {i: " ".join(w) for i, w in enumerate(docs_words)}
        df = spark.createDataFrame(
            list(texts.items()), ["doc_id", "text"]
        )
        got = {
            r.doc_id: (r.n_spans, r.dup_spans, r.dup_ratio)
            for r in repeated_span_report(
                df, span_tokens=self.K, min_docs=2, materialize=False
            ).collect()
        }
        expected = self._py_report(texts, self.K, 2)
        assert set(got) == set(expected)
        for d in expected:
            en, ed, er = expected[d]
            gn, gd, gr = got[d]
            assert (gn, gd) == (en, ed), f"doc {d}"
            assert abs(gr - er) < 1e-6, f"doc {d} ratio"


class TestUrlNormalizeProperties:
    """operators/urls.py::url_normalize — idempotence is the property a
    dedup KEY must have: normalizing an already-normal URL must be a
    no-op, or the same page could land in two dedup groups."""

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.builds(
                lambda scheme, host, port, path, params, frag: (
                    scheme + host + port + "/" + path
                    + ("?" + "&".join(params) if params else "")
                    + frag
                ),
                st.sampled_from(
                    ["http://", "https://", "HTTP://", "HTTPS://", "ftp://", ""]
                ),
                st.from_regex(r"[A-Za-z][A-Za-z0-9.]{0,12}", fullmatch=True),
                st.sampled_from(["", ":80", ":443", ":8080"]),
                # '=' allowed so path segments like 'ref=sr_1' occur
                st.from_regex(r"[A-Za-z0-9/._=-]{0,12}", fullmatch=True),
                st.lists(
                    st.sampled_from(
                        ["id=1", "utm_source=x", "q=Spark", "ref=abc",
                         "fbclid=zz", "a=b",
                         # names that merely CONTAIN a tracking name —
                         # the [?&] anchor must leave these alone
                         "href=x", "noutm_a=1", "prefs=dark"]
                    ),
                    max_size=4,
                ),
                st.sampled_from(["", "#frag", "#a#b"]),
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_normalize_is_idempotent(self, spark, urls):
        from documents_vector_search_spark.operators.urls import url_normalize

        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], ["doc_id", "url"]
        )
        once = url_normalize(F.col("url"))
        rows = df.select(
            "doc_id",
            once.alias("n1"),
            url_normalize(once).alias("n2"),
        ).collect()
        for r in rows:
            assert r.n1 == r.n2, (r.n1, r.n2)


class TestSaltedJoin:
    """operators/skew.py::salted_join — result-identical skew-spread
    equi-join (the manual fix skew_report's salt_factor points at)."""

    def _tables(self, spark):
        from pyspark.sql import functions as F

        left = spark.range(0, 1000).select(
            F.when(F.col("id") % 2 == 0, F.lit("whale"))
            .otherwise(F.concat(F.lit("u"), F.col("id")))
            .alias("k"),
            (F.col("id") % 13).alias("v"),
        )
        # duplicate keys on the right: whale matches 2 rows, u7 matches 1
        right = spark.createDataFrame(
            [("whale", 100), ("whale", 200), ("u7", 7), ("ghost", -1)],
            "rk string, w int",
        )
        return left, right

    def test_inner_matches_plain_join(self, spark):
        from documents_vector_search_spark.operators.skew import salted_join

        left, right = self._tables(spark)
        got = sorted(
            (r["k"], r["v"], r["w"])
            for r in salted_join(left, right, "k", "rk", 8).collect()
        )
        want = sorted(
            (r["k"], r["v"], r["w"])
            for r in left.join(
                right, left["k"] == right["rk"], "inner"
            ).collect()
        )
        assert got == want and len(got) == 1001  # 500*2 whale + u7

    def test_left_matches_plain_join(self, spark):
        from documents_vector_search_spark.operators.skew import salted_join

        left, right = self._tables(spark)
        got = sorted(
            (r["k"], r["v"], r["w"])
            for r in salted_join(left, right, "k", "rk", 8, how="left")
            .collect()
        )
        want = sorted(
            (r["k"], r["v"], r["w"])
            for r in left.join(
                right, left["k"] == right["rk"], "left"
            ).collect()
        )
        assert got == want
        # unmatched left rows appear exactly once despite 8 replicas
        assert sum(1 for k, _, w in got if w is None) == 499

    def test_rejects_semantics_breaking_how(self, spark):
        from documents_vector_search_spark.operators.skew import salted_join

        left, right = self._tables(spark)
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(left, right, "k", "rk", 8, how="right")

    def test_join_key_carries_the_salt(self, spark):
        """The physical join keys must include _salt — otherwise the
        whole point (splitting the hot key's hash bucket) is lost."""
        from documents_vector_search_spark.operators.skew import salted_join

        left, right = self._tables(spark)
        plan = salted_join(left, right, "k", "rk", 8)._jdf \
            .queryExecution().executedPlan().toString()
        assert "_salt" in plan
        assert "Generate explode" in plan or "Generate" in plan


class TestHostProfileSaltHatch:
    """host_profile (operators/profiling.py) — the skew_report →
    salted_aggregate consumer the r9 verdict asked for: the salted
    form must be result-identical to the unsalted groupBy, and its
    plan must show the two-phase shape (a partial aggregate keyed by
    (host, _salt) before the host-keyed finish)."""

    @staticmethod
    def _staged(spark):
        # one mega-host (the wikipedia.org problem) + a long tail,
        # multiple langs per host so n_langs exercises the distinct-
        # pair reduction
        rows = []
        for i in range(400):
            rows.append(("big.example.org", f"l{i % 5}", 100 + i, i * 1000))
        for h in range(30):
            for j in range(3):
                rows.append((f"tail{h}.net", f"l{j % 2}", 50 + j, j * 500))
        return spark.createDataFrame(
            rows, "host string, lang string, n_chars long, q_micro long"
        )

    def test_salted_matches_unsalted(self, spark):
        from documents_vector_search_spark.operators.profiling import (
            host_profile,
        )

        staged = self._staged(spark)
        plain = {r["host"]: tuple(r) for r in host_profile(staged).collect()}
        salted = {
            r["host"]: tuple(r)
            for r in host_profile(staged, salt_hosts=8).collect()
        }
        assert plain == salted
        assert plain["big.example.org"][1] == 400  # n_docs
        assert plain["big.example.org"][2] == 5  # n_langs

    def test_salted_plan_is_two_phase(self, spark):
        from documents_vector_search_spark.operators.profiling import (
            host_profile,
            skew_report,
        )

        staged = self._staged(spark)
        plan = (
            host_profile(staged, salt_hosts=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "_salt" in plan  # partials keyed by (host, _salt)
        # and skew_report is the sizing tool: the mega-host's
        # salt_factor is the k you'd pass
        rep = {r["key"]: r for r in skew_report(staged, "host").collect()}
        assert rep["big.example.org"]["salt_factor"] > 1


class TestTableProfile:
    """table_profile (operators/profiling.py): per-column stats vs a
    hand computation, exact-distinct toggle, non-orderable columns
    render NULL min/max, and the whole profile is ONE aggregation
    pass (plan contract: a single Aggregate pair, no join)."""

    @staticmethod
    def _df(spark):
        return spark.createDataFrame(
            [
                (1, "alpha", 1.5, ["x"]),
                (2, None, 2.5, ["y", "z"]),
                (3, "beta", None, []),
                (3, "gamma", 4.5, None),
            ],
            "id bigint, name string, score double, tags array<string>",
        )

    def test_stats_match_hand_computation(self, spark):
        from documents_vector_search_spark.operators.profiling import (
            table_profile,
        )

        prof = {
            r["column"]: r
            for r in table_profile(self._df(spark), exact_distinct=True).collect()
        }
        assert set(prof) == {"id", "name", "score", "tags"}
        assert all(r["n_rows"] == 4 for r in prof.values())
        assert prof["id"]["n_nulls"] == 0 and prof["id"]["n_distinct"] == 3
        assert prof["id"]["min"] == "1" and prof["id"]["max"] == "3"
        assert prof["name"]["n_nulls"] == 1
        assert prof["name"]["null_frac"] == 0.25
        assert prof["name"]["avg_len"] == "4.666667"  # alpha/beta/gamma
        assert prof["score"]["min"] == "1.5" and prof["score"]["max"] == "4.5"
        assert prof["tags"]["min"] is None and prof["tags"]["max"] is None
        assert prof["tags"]["n_nulls"] == 1

    def test_single_pass_plan(self, spark):
        from documents_vector_search_spark.operators.profiling import (
            table_profile,
        )

        plan = (
            table_profile(self._df(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan  # one scan, no per-column jobs

    def test_hostile_column_names(self, spark):
        # names carrying a quote, a backtick, and a backslash must not
        # break the interpolated stack() SQL (r10 ADVICE)
        from documents_vector_search_spark.operators.profiling import (
            table_profile,
        )

        df = spark.createDataFrame([(1, "x")], ["id", "plain"])
        for hostile in ("it's", "tick`mark", "back\\slash"):
            renamed = df.withColumnRenamed("plain", hostile)
            prof = {r["column"]: r for r in table_profile(renamed).collect()}
            assert hostile in prof, hostile
            assert prof[hostile]["n_nulls"] == 0


class TestFkCheck:
    def test_orphans_found_and_sampled(self, spark):
        from documents_vector_search_spark.operators.profiling import (
            fk_check,
        )

        child = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 99), (4, None)], "id bigint, fk bigint"
        )
        parent = spark.createDataFrame(
            [(10,), (20,), (30,)], "pk bigint"
        )
        out = fk_check(child, parent, [("fk", "pk")])
        assert out["child_rows"] == 4 and out["orphan_rows"] == 2
        assert out["orphan_frac"] == 0.5
        assert sorted(s[0] for s in out["sample"] if s[0] is not None) == [99]
        # NULL fk counts as orphan (plain equality: NULL matches nothing)
        assert any(s[0] is None for s in out["sample"])

    def test_null_parent_key_does_not_absorb_null_fk(self, spark):
        from documents_vector_search_spark.operators.profiling import (
            fk_check,
        )

        child = spark.createDataFrame(
            [(1, 10), (2, None)], "id bigint, fk bigint"
        )
        parent = spark.createDataFrame(
            [(10,), (None,)], "pk bigint"
        )
        out = fk_check(child, parent, [("fk", "pk")])
        # a NULL parent key must NOT legitimize NULL child FKs
        assert out["orphan_rows"] == 1
        assert out["sample"] == [(None,)]

    def test_clean_child_passes(self, spark):
        from documents_vector_search_spark.operators.profiling import (
            fk_check,
        )

        child = spark.createDataFrame([(1, "a")], "id bigint, k string")
        parent = spark.createDataFrame([("a",), ("b",)], "k string")
        out = fk_check(child, parent, ["k"])
        assert out["orphan_rows"] == 0 and out["sample"] == []


class TestUnimaxAllocation:
    """unimax_allocation (operators/sampling.py): the closed-form
    water-fill must equal the sequential UniMax loop, respect caps,
    spend the budget tight (remainder < #rationed langs), and handle
    the all-full / none-full edges."""

    @staticmethod
    def _docs(spark, rows):
        return spark.createDataFrame(rows, "lang string, ws_tokens bigint")

    @staticmethod
    def _reference(sizes: dict, budget: int, max_epochs: int) -> dict:
        """Sequential water-fill: ascending caps, fund fully while the
        equal-share for the remaining langs covers the cap."""
        caps = sorted(
            ((lang, s * max_epochs) for lang, s in sizes.items()),
            key=lambda kv: (kv[1], kv[0]),
        )
        alloc, remaining = {}, budget
        k = len(caps)
        for idx, (lang, cap) in enumerate(caps):
            slots = k - idx
            if cap * slots <= remaining:
                alloc[lang] = cap
                remaining -= cap
            else:
                share = remaining // slots
                for lang2, _cap2 in caps[idx:]:
                    alloc[lang2] = share
                break
        return alloc

    def test_matches_sequential_reference_sweep(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            unimax_allocation,
        )

        sizes = {"en": 1000, "fr": 300, "de": 250, "zh": 120, "ko": 40}
        rows = [(lang, s) for lang, s in sizes.items()]
        for budget in (100, 700, 1710, 2500, 3419, 3420, 9999):
            got = {
                r["lang"]: r["alloc_tokens"]
                for r in unimax_allocation(
                    self._docs(spark, rows), budget, max_epochs=2
                ).collect()
            }
            assert got == self._reference(sizes, budget, 2), budget

    def test_caps_and_tight_fill(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            unimax_allocation,
        )

        rows = [("en", 1000), ("fr", 300), ("de", 250), ("zh", 120)]
        out = unimax_allocation(self._docs(spark, rows), 2000, max_epochs=2)
        rs = {r["lang"]: r for r in out.collect()}
        for lang, s in rows:
            assert rs[lang]["alloc_tokens"] <= rs[lang]["cap_tokens"]
            assert rs[lang]["cap_tokens"] == 2 * s
        spent = sum(r["alloc_tokens"] for r in rs.values())
        n_rationed = sum(
            1 for r in rs.values() if r["alloc_tokens"] < r["cap_tokens"]
        )
        assert spent <= 2000 and 2000 - spent < max(n_rationed, 1)

    def test_all_full_when_budget_covers_everything(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            unimax_allocation,
        )

        rows = [("en", 100), ("fr", 50)]
        rs = {
            r["lang"]: r
            for r in unimax_allocation(
                self._docs(spark, rows), 10_000, max_epochs=3
            ).collect()
        }
        assert rs["en"]["alloc_tokens"] == 300
        assert rs["fr"]["alloc_tokens"] == 150
        assert rs["en"]["epochs_used"] == 3.0

    def test_per_doc_rows_aggregate(self, spark):
        """Input is one row per DOC; the operator aggregates to langs."""
        from documents_vector_search_spark.operators.sampling import (
            unimax_allocation,
        )

        rows = [("en", 10)] * 7 + [("fr", 20)] * 2
        rs = {
            r["lang"]: r
            for r in unimax_allocation(
                self._docs(spark, rows), 1000, max_epochs=1
            ).collect()
        }
        assert rs["en"]["n_docs"] == 7 and rs["en"]["tokens_total"] == 70
        assert rs["fr"]["n_docs"] == 2 and rs["fr"]["tokens_total"] == 40
