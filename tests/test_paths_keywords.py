"""Event path transitions (operators/paths.py) and TF-IDF keywords
(operators/text_analysis.py::tfidf_keywords)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from documents_vector_search_spark.operators.paths import (
    event_transitions,
    transition_matrix,
)
from documents_vector_search_spark.operators.text_analysis import (
    tfidf_keywords,
)


def _events(spark):
    rows = [
        # u1: view -> click -> view -> purchase
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 00:01:00", "click"),
        (3, 1, "2024-01-01 00:02:00", "view"),
        (4, 1, "2024-01-01 00:03:00", "purchase"),
        # u2: view -> view (same ts: event_id breaks the tie) -> click
        (5, 2, "2024-01-01 00:00:00", "view"),
        (6, 2, "2024-01-01 00:00:00", "view"),
        (7, 2, "2024-01-01 00:01:00", "click"),
        # u3: a single event -> no transition
        (8, 3, "2024-01-01 00:00:00", "click"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestEventTransitions:
    def test_counts(self, spark):
        got = {
            (r.from_type, r.to_type): r.n
            for r in event_transitions(_events(spark)).collect()
        }
        assert got == {
            ("view", "click"): 2,    # u1 first pair, u2 second pair
            ("click", "view"): 1,    # u1
            ("view", "purchase"): 1, # u1
            ("view", "view"): 1,     # u2 same-ts pair, id-ordered
        }

    def test_row_normalized_probabilities(self, spark):
        got = {
            (r.from_type, r.to_type): r.p
            for r in transition_matrix(_events(spark)).collect()
        }
        assert got[("view", "click")] == 0.5    # 2 of 4 view-exits
        assert got[("view", "view")] == 0.25
        assert got[("view", "purchase")] == 0.25
        assert got[("click", "view")] == 1.0

    def test_single_user_keyed_shuffle_no_udf(self, spark):
        df = transition_matrix(_events(spark))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


class TestTfidfKeywords:
    def test_matches_hand_computation(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "apple apple banana"),
                (2, "banana cherry"),
                (3, "cherry cherry cherry date"),
            ],
            "doc_id long, text string",
        )
        rows = tfidf_keywords(docs, k=2).collect()
        got = {(r.doc_id, r.rank): (r.term, r.tfidf) for r in rows}

        def idf(df):
            return math.log((1 + 3) / (1 + df)) + 1

        # doc 1: apple tf=2 df=1, banana tf=1 df=2
        assert got[(1, 1)] == ("apple", round(2 * idf(1), 6))
        assert got[(1, 2)] == ("banana", round(1 * idf(2), 6))
        # doc 3: cherry tf=3 df=2 beats date tf=1 df=1
        assert got[(3, 1)] == ("cherry", round(3 * idf(2), 6))
        assert got[(3, 2)] == ("date", round(1 * idf(1), 6))

    def test_ties_break_on_term_and_k_bounds_output(self, spark):
        docs = spark.createDataFrame(
            [(1, "zeta alpha mid mid")], "doc_id long, text string"
        )
        rows = tfidf_keywords(docs, k=3).collect()
        assert [r.term for r in sorted(rows, key=lambda r: r.rank)] == [
            "mid", "alpha", "zeta"  # tf 2 first, then tf-1 ties by term
        ]
        assert all(r.rank <= 3 for r in rows)

    def test_plan_udf_free(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        plan = (
            tfidf_keywords(docs)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan


class TestSkewReport:
    def test_shares_and_salt_factors(self, spark):
        from documents_vector_search_spark.operators.profiling import (
            skew_report,
        )

        # 10 rows: key 'a' holds 6, 'b' 3, 'c' 1 -> avg 10/3
        rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
        df = spark.createDataFrame(rows, "k string")
        got = {r.key: r for r in skew_report(df, "k", top_k=3).collect()}
        assert got["a"].n == 6 and got["a"].share == 0.6
        assert got["a"].salt_factor == 2   # ceil(6 / (10/3)) = ceil(1.8)
        assert got["b"].salt_factor == 1   # below average stays 1
        assert got["c"].salt_factor == 1

    def test_top_k_bounds_output(self, spark):
        from documents_vector_search_spark.operators.profiling import (
            skew_report,
        )

        df = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
        assert skew_report(df, "k", top_k=5).count() == 5


class TestItemCooccurrence:
    def test_counts_and_lift(self, spark):
        from documents_vector_search_spark.operators.cooccurrence import (
            item_cooccurrence,
        )

        # u1: {1,2,3}; u2: {1,2}; u3: {2,3}; u4: {1}
        rows = [
            (1, 1), (1, 2), (1, 3),
            (2, 1), (2, 2),
            (3, 2), (3, 3),
            (4, 1),
        ]
        ev = spark.createDataFrame(rows, "user_id long, item_id long")
        got = {
            (r.item_a, r.item_b): (r.n_users, r.lift)
            for r in item_cooccurrence(
                ev, max_items_per_user=10, min_pair_users=2
            ).collect()
        }
        # pair (1,2): users u1,u2 -> n=2; U=4, u_1=3, u_2=3 -> lift 8/9
        assert got[(1, 2)] == (2, round(2 * 4 / (3 * 3), 6))
        # pair (2,3): users u1,u3 -> n=2; u_3=2 -> lift 8/6
        assert got[(2, 3)] == (2, round(2 * 4 / (3 * 2), 6))
        # pair (1,3): only u1 -> below min_pair_users, dropped
        assert (1, 3) not in got

    def test_cap_bounds_power_user_pairs(self, spark):
        from documents_vector_search_spark.operators.cooccurrence import (
            item_cooccurrence,
        )

        # one user interacts with 100 items; cap 5 -> pairs only among
        # the 5 most-interacted (ties by item asc -> items 0..4 kept
        # since every count is 1)
        rows = [(1, i) for i in range(100)] + [(2, i) for i in range(5)]
        ev = spark.createDataFrame(rows, "user_id long, item_id long")
        pairs = item_cooccurrence(
            ev, max_items_per_user=5, min_pair_users=2
        ).collect()
        got = {(r.item_a, r.item_b) for r in pairs}
        assert got == {(a, b) for a in range(5) for b in range(5) if a < b}


class TestTextNormalization:
    def test_clean_text_rules(self, spark):
        from documents_vector_search_spark.functions.text import clean_text

        rows = [
            (1, "“Hi” — there…"),
            (2, "a\r\nb\rc"),                 # CRLF and CR -> LF
            (3, "x\t\t y  z"),                # whitespace runs collapse
            (4, "bell\x07strip"),             # control char stripped
            (5, "  pad  \n  ded  "),          # trim + around-newline
            (6, "nb sp"),                # nbsp -> space
        ]
        df = spark.createDataFrame(rows, "i long, t string")
        got = {
            r.i: r.c
            for r in df.select("i", clean_text("t").alias("c")).collect()
        }
        assert got[1] == '"Hi" - there...'  # en/em dashes fold to '-'
        assert got[2] == "a\nb\nc"
        assert got[3] == "x y z"
        assert got[4] == "bellstrip"
        assert got[5] == "pad\nded"
        assert got[6] == "nb sp"

    def test_clean_text_idempotent(self, spark):
        from documents_vector_search_spark.functions.text import clean_text

        df = spark.createDataFrame(
            [(1, "“A” – b…\tc  d\r\n e")], "i long, t string"
        )
        once = df.select(clean_text("t").alias("c"))
        twice = once.select(clean_text("c").alias("c"))
        assert once.collect() == twice.collect()

    def test_ascii_fold(self, spark):
        from documents_vector_search_spark.functions.text import ascii_fold

        rows = [(1, "café naïve"), (2, "straße œuvre"), (3, "Ångström Ø")]
        df = spark.createDataFrame(rows, "i long, t string")
        got = {
            r.i: r.f
            for r in df.select("i", ascii_fold("t").alias("f")).collect()
        }
        assert got[1] == "cafe naive"
        assert got[2] == "strasse oeuvre"
        assert got[3] == "Angstrom O"


class TestNormalizationParity:
    """The oracle contract hinges on clean_text/ascii_fold meaning the
    SAME thing in Spark (Java) and DuckDB (RE2 + translate): drive both
    engines over one generated batch of adversarial strings — every
    mapped character, controls, mixed whitespace, random combinations —
    and require byte-identical outputs plus idempotence."""

    @staticmethod
    def _nasty_strings():
        import random

        from documents_vector_search_spark.functions.text import (
            FOLD_MULTI,
            FOLD_SRC,
            PUNCT_MULTI,
            PUNCT_SRC,
        )

        alphabet = (
            list("abc XY12.\t\n")
            + list(PUNCT_SRC)
            + [s for s, _ in PUNCT_MULTI]
            + list(FOLD_SRC)
            + [s for s, _ in FOLD_MULTI]
            + ["\x07", "\x1f", "\x7f", "\r", "\r\n", "  ", "é́"]
        )
        rng = random.Random(20260815)
        rows = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
            for _ in range(200)
        ]
        # plus every mapped char alone and at the edges
        rows += [c for c in PUNCT_SRC + FOLD_SRC]
        rows += [f" {c}x\n" for c, _ in PUNCT_MULTI + FOLD_MULTI]
        return [(i, s) for i, s in enumerate(rows)]

    def test_clean_text_matches_duckdb_and_is_idempotent(self, spark):
        import duckdb

        from documents_vector_search_spark.functions.text import (
            clean_text,
            clean_text_sql,
        )

        rows = self._nasty_strings()
        df = spark.createDataFrame(rows, "i long, t string")
        got = {
            r.i: (r.c1, r.c2)
            for r in df.select(
                "i",
                clean_text("t").alias("c1"),
                clean_text(clean_text("t")).alias("c2"),
            ).collect()
        }
        con = duckdb.connect()
        con.register(
            "src",
            __import__("pandas").DataFrame(rows, columns=["i", "t"]),
        )
        oracle = dict(
            con.execute(
                f"SELECT i, {clean_text_sql('t')} FROM src"
            ).fetchall()
        )
        for i, _ in rows:
            assert got[i][0] == got[i][1], f"not idempotent at {i}"
            assert got[i][0] == oracle[i], (
                f"dialect drift at {i}: spark={got[i][0]!r} "
                f"duck={oracle[i]!r}"
            )

    def test_ascii_fold_matches_duckdb(self, spark):
        import duckdb

        from documents_vector_search_spark.functions.text import (
            ascii_fold,
            ascii_fold_sql,
        )

        rows = self._nasty_strings()
        df = spark.createDataFrame(rows, "i long, t string")
        got = {
            r.i: r.f
            for r in df.select("i", ascii_fold("t").alias("f")).collect()
        }
        con = duckdb.connect()
        con.register(
            "src",
            __import__("pandas").DataFrame(rows, columns=["i", "t"]),
        )
        oracle = dict(
            con.execute(
                f"SELECT i, {ascii_fold_sql('t')} FROM src"
            ).fetchall()
        )
        for i, _ in rows:
            assert got[i] == oracle[i], f"dialect drift at {i}"


class TestRfmApproxScalePath:
    """rfm_segments_approx (operators/paths.py) — the billion-user
    path the r9 verdict asked for: broadcast approx-quantile cut
    points instead of three unpartitioned ntile windows. Parity with
    the exact scorer on a tie-free fixture whose bucket boundaries
    are unambiguous, and a plan contract: NO Window operator (the
    single-partition sort is exactly what this path exists to avoid)."""

    @staticmethod
    def _fixture(spark):
        # 25 users / 5 buckets: user u has u events (frequency = u,
        # distinct), per-event value u (monetary = u², distinct), and
        # last event at t0 + u minutes (recency distinct) — every
        # metric is tie-free and 25 % 5 == 0, so ntile boundaries and
        # quantile cut points coincide exactly
        rows = []
        eid = 0
        for u in range(1, 26):
            for j in range(u):
                eid += 1
                rows.append(
                    (eid, f"u{u:02d}", f"2024-01-01 00:{u:02d}:00",
                     float(u))
                )
        return spark.createDataFrame(
            rows, "event_id long, user_id string, ts_s string, value double"
        ).select(
            "event_id", "user_id",
            F.col("ts_s").cast("timestamp").alias("ts"), "value",
        )

    def test_matches_exact_ntile_on_tie_free_fixture(self, spark):
        from documents_vector_search_spark.operators.paths import (
            rfm_segments,
            rfm_segments_approx,
        )

        ev = self._fixture(spark)
        exact = {
            r["user"]: (r["r"], r["f"], r["m"], r["segment"])
            for r in rfm_segments(ev).collect()
        }
        approx = {
            r["user"]: (r["r"], r["f"], r["m"], r["segment"])
            for r in rfm_segments_approx(ev).collect()
        }
        assert exact == approx
        assert len(exact) == 25
        # each score 1..5 appears exactly 5 times per dimension
        for dim in range(3):
            from collections import Counter

            c = Counter(v[dim] for v in exact.values())
            assert c == {s: 5 for s in range(1, 6)}

    def test_plan_has_no_window(self, spark):
        from documents_vector_search_spark.operators.paths import (
            rfm_segments,
            rfm_segments_approx,
        )

        ev = self._fixture(spark)
        plan_approx = rfm_segments_approx(ev)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan_approx
        # the exact path DOES window — the contrast proves the assert bites
        plan_exact = rfm_segments(ev)._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan_exact


class TestAssociationRules:
    """association_rules (operators/cooccurrence.py): directed
    confidence/support/lift vs a pure-Python reference, the
    direction asymmetry (conf(a->b) != conf(b->a) when popularity
    differs), and the lift symmetry law."""

    @staticmethod
    def _events(spark, rows):
        return spark.createDataFrame(rows, "user_id string, item_id string")

    def test_measures_match_python(self, spark):
        from documents_vector_search_spark.operators.cooccurrence import (
            association_rules,
        )

        # 4 users: bread+milk 3x, bread alone 1x, milk+eggs 1x
        baskets = {
            "u1": {"bread", "milk"},
            "u2": {"bread", "milk"},
            "u3": {"bread", "milk", "eggs"},
            "u4": {"bread"},
        }
        rows = [(u, i) for u, items in baskets.items() for i in items]
        got = {
            (r["antecedent"], r["consequent"]): (
                r["n_both"], r["n_antecedent"], r["support"],
                r["confidence"], r["lift"],
            )
            for r in association_rules(
                self._events(spark, rows), min_pair_users=1
            ).collect()
        }
        U = len(baskets)
        items = {"bread", "milk", "eggs"}
        n = {i: sum(1 for b in baskets.values() if i in b) for i in items}
        expect = {}
        for a in items:
            for c in items:
                if a == c:
                    continue
                both = sum(1 for b in baskets.values() if a in b and c in b)
                if both < 1:
                    continue
                expect[(a, c)] = (
                    both, n[a], round(both / U, 6),
                    round(both / n[a], 6),
                    round(both * U / (n[a] * n[c]), 6),
                )
        assert got == expect
        # asymmetry: milk->bread is certain, bread->milk is 3/4
        assert got[("milk", "bread")][3] == 1.0
        assert got[("bread", "milk")][3] == 0.75
        # lift symmetric across directions
        assert got[("bread", "milk")][4] == got[("milk", "bread")][4]

    def test_min_confidence_prunes(self, spark):
        from documents_vector_search_spark.operators.cooccurrence import (
            association_rules,
        )

        rows = [("u1", "a"), ("u1", "b"), ("u2", "a"), ("u3", "a")]
        out = association_rules(
            self._events(spark, rows), min_pair_users=1, min_confidence=0.9
        ).collect()
        # only b->a survives (1/1); a->b is 1/3
        assert [(r["antecedent"], r["consequent"]) for r in out] == [("b", "a")]
