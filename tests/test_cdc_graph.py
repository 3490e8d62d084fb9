"""CDC operators (operators/cdc.py) and iterative graph algorithms
(operators/graph.py): semantic pins the registry's DuckDB oracle hash
cannot express — NULL-transition change detection, SCD2 version
chaining with no-op collapse, PageRank invariants (sink accumulation,
symmetry, damping limit) and the Spark-vs-pure-Python trajectory."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.cdc import scd2_apply, snapshot_diff
from documents_vector_search_spark.operators.graph import (
    PR_SCALE,
    pagerank,
    pagerank_unrolled_sql,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestSnapshotDiff:
    SCHEMA = "k bigint, a string, b double"

    def test_statuses(self, spark):
        old = _df(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)], self.SCHEMA)
        new = _df(spark, [(2, "y", 2.0), (3, "z", 9.0), (4, "w", 4.0)], self.SCHEMA)
        out = {
            r["k"]: r
            for r in snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
        }
        assert out[1]["status"] == "removed" and out[1]["new_a"] is None
        assert 2 not in out  # unchanged rows drop
        assert out[3]["status"] == "changed"
        assert out[3]["old_b"] == 3.0 and out[3]["new_b"] == 9.0
        assert out[4]["status"] == "added" and out[4]["old_a"] is None

    def test_null_transitions_register_as_changes(self, spark):
        """NULL→value and value→NULL must be 'changed', not swallowed
        by three-valued logic — the eqNullSafe contract."""
        old = _df(spark, [(1, None, 1.0), (2, "y", 2.0), (3, None, 3.0)], self.SCHEMA)
        new = _df(spark, [(1, "x", 1.0), (2, None, 2.0), (3, None, 3.0)], self.SCHEMA)
        out = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"], ["a"]).collect()}
        assert out == {1: "changed", 2: "changed"}  # 3: NULL==NULL unchanged

    def test_composite_key(self, spark):
        old = _df(spark, [(1, "p", 1.0), (1, "q", 2.0)], self.SCHEMA)
        new = _df(spark, [(1, "p", 5.0), (1, "q", 2.0)], self.SCHEMA)
        rows = snapshot_diff(old, new, ["k", "a"], ["b"]).collect()
        assert len(rows) == 1
        assert rows[0]["k"] == 1 and rows[0]["a"] == "p"
        assert rows[0]["status"] == "changed"


class TestScd2Apply:
    DIM = "k bigint, attr string"
    CH = "k bigint, attr string, effective_ts bigint"

    def test_version_chain(self, spark):
        cur = _df(spark, [(1, "v0")], self.DIM)
        ch = _df(spark, [(1, "v1", 100), (1, "v2", 200)], self.CH)
        rows = sorted(
            scd2_apply(cur, ch, ["k"], ["attr"]).collect(),
            key=lambda r: (r["valid_from"] is not None, r["valid_from"] or 0),
        )
        assert [r["attr"] for r in rows] == ["v0", "v1", "v2"]
        assert rows[0]["valid_from"] is None and rows[0]["valid_to"] == 100
        assert rows[1]["valid_from"] == 100 and rows[1]["valid_to"] == 200
        assert rows[2]["valid_to"] is None and rows[2]["is_current"] is True
        assert [r["is_current"] for r in rows[:2]] == [False, False]

    def test_noop_change_collapses(self, spark):
        """A change row carrying the same attribute values produces no
        version — warehouse MERGE semantics."""
        cur = _df(spark, [(1, "v0")], self.DIM)
        ch = _df(spark, [(1, "v0", 100), (1, "v1", 200)], self.CH)
        rows = scd2_apply(cur, ch, ["k"], ["attr"]).collect()
        assert len(rows) == 2
        attrs = {r["attr"]: r for r in rows}
        assert attrs["v0"]["valid_to"] == 200  # closes at the REAL change
        assert attrs["v1"]["is_current"] is True

    def test_new_key_arrives_via_changes(self, spark):
        cur = _df(spark, [(1, "a")], self.DIM)
        ch = _df(spark, [(2, "b", 50)], self.CH)
        rows = {r["k"]: r for r in scd2_apply(cur, ch, ["k"], ["attr"]).collect()}
        assert rows[2]["valid_from"] == 50 and rows[2]["is_current"] is True
        assert rows[1]["is_current"] is True  # untouched key stays open

    def test_chain_invariants_random_changes(self, spark):
        """Hypothesis sweep of the SCD2 laws on random change sets:
        per key exactly ONE open (is_current) row; versions chain
        (valid_to == next valid_from under the fold's total order); no
        two consecutive versions carry equal attributes (no-op
        collapse); every surviving version's attr appears in the
        inputs."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        changes = st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=4),  # key
                st.sampled_from(["a", "b", "c"]),  # attr
                st.integers(min_value=1, max_value=6),  # ts
            ),
            max_size=12,
            unique=True,
        )

        @given(changes)
        @settings(
            max_examples=20,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        def check(ch):
            cur = [(k, f"v{k}") for k in (1, 2)]
            out = scd2_apply(
                _df(spark, cur, self.DIM),
                _df(spark, ch, self.CH),
                ["k"],
                ["attr"],
            ).collect()
            by_key: dict[int, list] = {}
            for r in out:
                by_key.setdefault(r["k"], []).append(r)
            for k, rows in by_key.items():
                rows.sort(
                    key=lambda r: (
                        r["valid_from"] is not None,
                        r["valid_from"] or 0,
                        r["attr"],
                    )
                )
                assert sum(1 for r in rows if r["is_current"]) == 1
                assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
                for a, b in zip(rows, rows[1:]):
                    assert a["valid_to"] == b["valid_from"]
                    assert a["attr"] != b["attr"]  # no-op collapsed
                allowed = {f"v{k}"} | {a for kk, a, _ in ch if kk == k}
                assert all(r["attr"] in allowed for r in rows)

        check()


def _pure_python_pagerank(edges, iterations=10, damping_pct=85):
    """Reference trajectory: same integer arithmetic (incl. the
    NULL/≤0 weight filter and dangling-mass redistribution), no
    Spark."""
    edges = [(s, d, w) for s, d, w in edges if w is not None and w > 0]
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    base = (PR_SCALE * (100 - damping_pct)) // (100 * n)
    r = {v: PR_SCALE // n for v in nodes}
    for _ in range(iterations):
        dm = sum(r[v] for v in nodes if v not in out_w)
        share = dm * damping_pct // (100 * n)
        mass = {v: 0 for v in nodes}
        for s, d, w in edges:
            mass[d] += (r[s] * w) // out_w[s] * damping_pct // 100
        r = {v: base + mass[v] + share for v in nodes}
    return r


class TestPagerank:
    EDGES = "src string, dst string, w bigint"

    def test_matches_pure_python_trajectory(self, spark):
        edges = [
            ("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
            ("c", "a", 1), ("c", "d", 1), ("d", "a", 5),
        ]
        expect = _pure_python_pagerank(edges)
        got = {
            r["node"]: r["rank_micro"]
            for r in pagerank(
                _df(spark, edges, self.EDGES), weight="w"
            ).collect()
        }
        assert got == expect

    def test_symmetric_cycle_is_uniform(self, spark):
        """a→b→c→a with equal weights: ranks must stay exactly equal."""
        edges = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
        rows = pagerank(_df(spark, edges, self.EDGES)).collect()
        assert len({r["rank_micro"] for r in rows}) == 1

    def test_sink_outranks_sources(self, spark):
        """Two sources feeding one sink: the sink holds strictly more
        mass after any iterations."""
        edges = [("s1", "hub", 1), ("s2", "hub", 1)]
        got = {r["node"]: r["rank_micro"] for r in pagerank(_df(spark, edges, self.EDGES)).collect()}
        assert got["hub"] > got["s1"] == got["s2"]

    def test_unrolled_sql_replays_trajectory(self, spark):
        """The oracle generator and the DataFrame loop agree on DuckDB
        — the cross-engine exactness contract, tested end-to-end."""
        import duckdb

        edges = [
            ("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
            ("c", "a", 1), ("c", "d", 1), ("d", "a", 5),
        ]
        con = duckdb.connect()
        con.sql(
            "CREATE TABLE raw_edges AS SELECT * FROM (VALUES "
            + ", ".join(f"('{s}', '{d}', {w})" for s, d, w in edges)
            + ") t(src, dst, w)"
        )
        sql = pagerank_unrolled_sql("edges AS (SELECT * FROM raw_edges)")
        oracle = {n: m for n, m, _ in con.sql(sql).fetchall()}
        expect = _pure_python_pagerank(edges)
        assert oracle == expect

    def test_damping_pct_validated(self, spark):
        with pytest.raises(ValueError):
            pagerank(_df(spark, [("a", "b", 1)], self.EDGES), damping_pct=100)

    def test_invalid_weights_filtered(self, spark):
        """NULL / zero / negative weights drop before anything else —
        the engine-parity contract (Spark DIV truncates toward zero,
        DuckDB // floors; NULLs silently eat contributions). The
        trajectory must equal pure-Python on the FILTERED edge list,
        and a node reachable only via invalid edges must vanish."""
        edges = [
            ("a", "b", 3), ("b", "a", 2),
            ("a", "x", None), ("b", "x", 0), ("x", "a", -5),
        ]
        got = {
            r["node"]: r["rank_micro"]
            for r in pagerank(
                _df(spark, edges, self.EDGES), weight="w"
            ).collect()
        }
        assert "x" not in got
        assert got == _pure_python_pagerank(edges)

    def test_sink_heavy_mass_conservation(self, spark):
        """VERDICT r9 item #4: with dangling mass re-injected, Σrank
        stays ≈ PR_SCALE on a sink-heavy graph (three sources feeding
        two pure sinks). Under the old leak-only model Σrank decayed
        geometrically — this asserts the correction is live."""
        edges = [
            ("s1", "k1", 1), ("s2", "k1", 2), ("s3", "k2", 1),
            ("s1", "k2", 1),
        ]
        got = {
            r["node"]: r["rank_micro"]
            for r in pagerank(
                _df(spark, edges, self.EDGES), weight="w"
            ).collect()
        }
        total = sum(got.values())
        # floor-div rounding loses < (n_nodes + n_edges + 1) units per
        # iteration; anything above 99.9% of PR_SCALE proves no leak
        assert PR_SCALE >= total > PR_SCALE * 999 // 1000
        assert got == _pure_python_pagerank(edges)


class TestScd2DuckdbParity:
    """Inline DuckDB twin of scd2_apply: replays the same version fold
    over the same rows and must agree exactly. Since r10 the operator
    ALSO has a registry key (window position 1) against the orders
    workload; this pin survives as the NULL-heavy small-fixture check
    the registry corpus can't exercise."""

    def test_matches_duckdb_twin(self, spark):
        import duckdb

        from documents_vector_search_spark.operators.cdc import scd2_apply

        cur = [(k, f"v{k}") for k in range(1, 8)]
        ch = [
            (1, "v1b", 100), (1, "v1c", 300), (1, "v1b", 200),
            (2, "v2", 100),            # no-op vs current -> collapses
            (3, "v3b", 100), (3, "v3b", 200),   # second is a no-op
            (9, "new", 50),            # key not in the dimension
        ]
        got = sorted(
            (
                (r["k"], r["attr"], r["valid_from"], r["valid_to"],
                 r["is_current"])
                for r in scd2_apply(
                    spark.createDataFrame(cur, "k bigint, attr string"),
                    spark.createDataFrame(
                        ch, "k bigint, attr string, effective_ts bigint"
                    ),
                    ["k"],
                    ["attr"],
                ).collect()
            ),
            key=lambda t: (t[0], t[2] is not None, t[2] or 0, t[1]),
        )

        con = duckdb.connect()
        con.sql(
            "CREATE TABLE cur AS SELECT * FROM (VALUES "
            + ", ".join(f"({k}, '{a}')" for k, a in cur)
            + ") t(k, attr)"
        )
        con.sql(
            "CREATE TABLE ch AS SELECT * FROM (VALUES "
            + ", ".join(f"({k}, '{a}', {ts})" for k, a, ts in ch)
            + ") t(k, attr, effective_ts)"
        )
        rows = con.sql(
            """
WITH versions AS (
  SELECT k, attr, CAST(NULL AS BIGINT) AS valid_from FROM cur
  UNION ALL
  SELECT k, attr, effective_ts FROM ch
),
ordered AS (
  SELECT *,
         row_number() OVER w AS rn,
         lag(attr) OVER w AS prev_attr
  FROM versions
  WINDOW w AS (PARTITION BY k
               ORDER BY valid_from ASC NULLS FIRST, attr ASC NULLS FIRST)
),
kept AS (
  SELECT * FROM ordered
  WHERE rn = 1 OR attr IS DISTINCT FROM prev_attr
)
SELECT k, attr, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       lead(valid_from) OVER w2 IS NULL AS is_current
FROM kept
WINDOW w2 AS (PARTITION BY k
              ORDER BY valid_from ASC NULLS FIRST, attr ASC NULLS FIRST)
ORDER BY k, valid_from IS NOT NULL, coalesce(valid_from, 0), attr
"""
        ).fetchall()
        expect = [tuple(r) for r in rows]
        assert got == expect


class TestSnapshotDiffProperty:
    """Hypothesis sweep: snapshot_diff vs a dict-based reference on
    random snapshot pairs — statuses partition correctly, unchanged
    keys never leak, and the changeset plus the old snapshot always
    reconstructs the new one (the CDC soundness property)."""

    @staticmethod
    def _reference(old, new):
        out = {}
        for k in old.keys() | new.keys():
            if k not in new:
                out[k] = "removed"
            elif k not in old:
                out[k] = "added"
            elif old[k] != new[k]:
                out[k] = "changed"
        return out

    def test_random_snapshots(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        snap = st.dictionaries(
            st.integers(min_value=0, max_value=30),
            st.tuples(
                st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
                st.integers(min_value=-3, max_value=3),
            ),
            max_size=20,
        )

        @given(snap, snap)
        @settings(
            max_examples=25,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        def check(old, new):
            schema = "k bigint, a string, b bigint"
            old_df = spark.createDataFrame(
                [(k, v[0], v[1]) for k, v in old.items()] or [], schema
            )
            new_df = spark.createDataFrame(
                [(k, v[0], v[1]) for k, v in new.items()] or [], schema
            )
            rows = snapshot_diff(old_df, new_df, ["k"], ["a", "b"]).collect()
            got = {r["k"]: r["status"] for r in rows}
            assert got == self._reference(old, new)
            # reconstruction: old + changeset == new
            rebuilt = dict(old)
            for r in rows:
                if r["status"] == "removed":
                    rebuilt.pop(r["k"])
                else:
                    rebuilt[r["k"]] = (r["new_a"], r["new_b"])
            assert rebuilt == new

        check()


class TestPagerankRandomGraph:
    def test_larger_random_graph_trajectory(self, spark):
        """60-node / ~240-edge deterministic pseudo-random graph: the
        Spark loop must reproduce the pure-Python integer trajectory
        EXACTLY (the cross-engine contract at a size where float
        implementations would have long diverged), and total mass must
        stay bounded by PR_SCALE (leak-only dangling model)."""
        rng_state = 123456789
        edges = []
        for i in range(240):
            # xorshift-ish LCG: deterministic, no random module needed
            rng_state = (1103515245 * rng_state + 12345) % (2**31)
            s = rng_state % 60
            rng_state = (1103515245 * rng_state + 12345) % (2**31)
            d = rng_state % 60
            if s == d:
                continue
            w = 1 + (s + d) % 7
            edges.append((f"n{s}", f"n{d}", w))
        expect = _pure_python_pagerank(edges, iterations=10)
        got = {
            r["node"]: r["rank_micro"]
            for r in pagerank(
                _df(spark, edges, "src string, dst string, w bigint"),
                weight="w",
            ).collect()
        }
        assert got == expect
        assert sum(got.values()) <= PR_SCALE


class TestApplyChangeset:
    """The CDC roundtrip law: old + snapshot_diff(old, new) == new,
    now at the DataFrame level (the replica-patch path)."""

    SCHEMA = "k bigint, a string, b double"

    def test_roundtrip_reconstructs_new(self, spark):
        from documents_vector_search_spark.operators.cdc import (
            apply_changeset,
        )

        old = _df(
            spark,
            [(1, "x", 1.0), (2, "y", 2.0), (3, None, 3.0), (5, "q", 5.0)],
            self.SCHEMA,
        )
        new = _df(
            spark,
            [(2, "y", 2.0), (3, "z", 3.0), (4, "w", 4.0), (5, "q", 5.0)],
            self.SCHEMA,
        )
        changes = snapshot_diff(old, new, ["k"], ["a", "b"])
        rebuilt = apply_changeset(old, changes, ["k"], ["a", "b"])
        got = sorted(tuple(r) for r in rebuilt.collect())
        expect = sorted(tuple(r) for r in new.collect())
        assert got == expect

    def test_empty_changeset_is_identity(self, spark):
        from documents_vector_search_spark.operators.cdc import (
            apply_changeset,
        )

        old = _df(spark, [(1, "x", 1.0), (2, "y", 2.0)], self.SCHEMA)
        changes = snapshot_diff(old, old, ["k"], ["a", "b"])
        rebuilt = apply_changeset(old, changes, ["k"], ["a", "b"])
        assert sorted(tuple(r) for r in rebuilt.collect()) == sorted(
            tuple(r) for r in old.collect()
        )


class TestScd2AsOf:
    """scd2_as_of: the point-in-time law — reading the history as of
    ts equals folding only the changes with effective_ts <= ts and
    keeping each key's open row. Checked at every instant of a
    three-wave change set, plus the before-first-appearance hole."""

    def test_as_of_equals_prefix_fold(self, spark):
        from documents_vector_search_spark.operators.cdc import (
            scd2_apply,
            scd2_as_of,
        )

        cur = [(1, "v0"), (2, "w0")]
        ch = [
            (1, "v1", 100), (1, "v2", 200), (2, "w1", 150),
            (3, "new", 120),  # key born at 120
        ]
        cur_df = spark.createDataFrame(cur, "k bigint, attr string")
        ch_df = spark.createDataFrame(
            ch, "k bigint, attr string, effective_ts bigint"
        )
        history = scd2_apply(cur_df, ch_df, ["k"], ["attr"])
        for ts in (0, 99, 100, 119, 120, 150, 199, 200, 300):
            got = {
                r["k"]: r["attr"]
                for r in scd2_as_of(history, ts).collect()
            }
            # reference: replay changes up to ts over the dict
            expect = dict(cur)
            for k, a, ets in sorted(ch, key=lambda t: t[2]):
                if ets <= ts:
                    expect[k] = a
            assert got == expect, f"as-of {ts}"

    def test_current_read_matches_is_current(self, spark):
        from documents_vector_search_spark.operators.cdc import (
            scd2_apply,
            scd2_as_of,
        )

        cur_df = spark.createDataFrame([(1, "a")], "k bigint, attr string")
        ch_df = spark.createDataFrame(
            [(1, "b", 10)], "k bigint, attr string, effective_ts bigint"
        )
        history = scd2_apply(cur_df, ch_df, ["k"], ["attr"])
        far_future = 1 << 60
        as_of = {(r["k"], r["attr"]) for r in scd2_as_of(history, far_future).collect()}
        open_rows = {
            (r["k"], r["attr"])
            for r in history.filter("is_current").select("k", "attr").collect()
        }
        assert as_of == open_rows == {(1, "b")}


def _pure_python_ppr(edges, seeds, iterations=10, damping_pct=85):
    """Personalized twin of _pure_python_pagerank: teleport + dangling
    mass to the seed set only, uniform-over-seeds start."""
    edges = [(s, d, w) for s, d, w in edges if w is not None and w > 0]
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    in_graph = [v for v in nodes if v in set(seeds)]
    ns = len(in_graph)
    base = (PR_SCALE * (100 - damping_pct)) // (100 * ns)
    r = {v: (PR_SCALE // ns if v in set(seeds) else 0) for v in nodes}
    for _ in range(iterations):
        dm = sum(r[v] for v in nodes if v not in out_w)
        share = dm * damping_pct // (100 * ns)
        mass = {v: 0 for v in nodes}
        for s, d, w in edges:
            mass[d] += (r[s] * w) // out_w[s] * damping_pct // 100
        r = {
            v: (base + share if v in set(seeds) else 0) + mass[v]
            for v in nodes
        }
    return r


class TestPersonalizedPagerank:
    EDGES = "src string, dst string, w bigint"

    def test_matches_pure_python_trajectory(self, spark):
        from documents_vector_search_spark.operators.graph import (
            personalized_pagerank,
        )

        edges = [
            ("seed", "a", 2), ("a", "b", 1), ("b", "seed", 1),
            ("c", "d", 3), ("d", "c", 1),  # island unreachable from seed
            ("a", "sink", 1),              # dangling node
        ]
        got = {
            r["node"]: r["rank_micro"]
            for r in personalized_pagerank(
                _df(spark, edges, self.EDGES), seeds=["seed"], weight="w"
            ).collect()
        }
        assert got == _pure_python_ppr(edges, ["seed"])
        # the island never receives teleport or link mass: exactly 0
        assert got["c"] == 0 and got["d"] == 0
        # seed-reachable nodes hold everything
        assert got["seed"] > 0 and got["a"] > 0 and got["b"] > 0

    def test_seed_validation(self, spark):
        import pytest as _pt

        from documents_vector_search_spark.operators.graph import (
            personalized_pagerank,
        )

        df = _df(spark, [("a", "b", 1)], self.EDGES)
        with _pt.raises(ValueError):
            personalized_pagerank(df, seeds=[])
        with _pt.raises(ValueError):
            personalized_pagerank(df, seeds=["nope"])

    def test_multi_seed_mass_conservation(self, spark):
        """Teleport + dangling both target seeds: with every node
        seed-reachable, Sigma-rank stays ~PR_SCALE."""
        from documents_vector_search_spark.operators.graph import (
            personalized_pagerank,
        )

        edges = [
            ("s1", "x", 1), ("s2", "x", 1), ("x", "s1", 1), ("x", "y", 1),
        ]  # y is dangling
        got = {
            r["node"]: r["rank_micro"]
            for r in personalized_pagerank(
                _df(spark, edges, self.EDGES), seeds=["s1", "s2"], weight="w"
            ).collect()
        }
        assert got == _pure_python_ppr(edges, ["s1", "s2"])
        total = sum(got.values())
        assert PR_SCALE >= total > PR_SCALE * 999 // 1000


class TestGraphProfile:
    def test_counts_and_reciprocity(self, spark):
        from documents_vector_search_spark.operators.graph import (
            graph_profile,
        )

        edges = [
            ("a", "b", 1), ("b", "a", 1),   # reciprocal pair
            ("a", "c", 2), ("c", "d", 1),
            ("x", "d", None),               # invalid weight: ignored
            ("a", "b", 5),                  # duplicate edge: deduped
        ]
        r = graph_profile(
            spark.createDataFrame(
                edges, "src string, dst string, w bigint"
            ),
            weight="w",
        ).collect()[0]
        assert r["n_nodes"] == 4 and r["n_edges"] == 4
        assert r["n_sources"] == 0  # every node has an in-edge
        assert r["n_sinks"] == 1  # d never links out
        assert r["reciprocity"] == 0.5  # a<->b is 2 of 4 edges
        assert r["max_out_degree"] == 2 and r["max_in_degree"] == 1
        assert r["avg_degree"] == 1.0

    def test_self_loop_not_reciprocal(self, spark):
        # (a,a) matches its own transpose; it must NOT count as
        # reciprocal (r10 ADVICE — event-transition graphs commonly
        # carry self-loops and counting them inflates the link-farm
        # signal). It still counts in n_edges and the degrees.
        from documents_vector_search_spark.operators.graph import (
            graph_profile,
        )

        edges = [("a", "a"), ("a", "b"), ("b", "a"), ("c", "d")]
        r = graph_profile(
            spark.createDataFrame(edges, "src string, dst string")
        ).collect()[0]
        assert r["n_edges"] == 4
        assert r["reciprocity"] == 0.5  # only a<->b, not (a,a)
        assert r["max_out_degree"] == 2  # a -> {a, b}
