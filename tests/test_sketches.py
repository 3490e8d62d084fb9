"""Misra-Gries heavy hitters: exactness at large capacity, the
under-estimate + survival guarantees in the lossy regime, and the
bounded-rows shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.sketches import (
    _reduce_to_capacity,
    misra_gries_heavy_hitters,
)


class TestReduceToCapacity:
    def test_noop_under_capacity(self):
        c = {"a": 5, "b": 3}
        assert _reduce_to_capacity(c, 4) == 0
        assert c == {"a": 5, "b": 3}

    def test_subtracts_threshold_and_drops(self):
        c = {"a": 10, "b": 4, "c": 4, "d": 1}
        off = _reduce_to_capacity(c, 2)
        # (capacity+1)-th largest of [10,4,4,1] = 4
        assert off == 4
        assert c == {"a": 6}  # b,c,d netted to <= 0


class TestHeavyHitters:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        # frequencies: t0 appears 400x, t1 200x, t2 100x, then a long
        # tail of 300 singletons spread over several partitions
        rows = (
            ["t0"] * 400 + ["t1"] * 200 + ["t2"] * 100
            + [f"tail{i}" for i in range(300)]
        )
        return spark.createDataFrame(
            [(v,) for v in rows], "term string"
        ).repartition(8)

    def test_exact_at_large_capacity(self, spark, skewed):
        got = misra_gries_heavy_hitters(
            skewed, "term", k=3, capacity=10_000
        ).collect()
        assert [(r.term, r.est_count, r.max_underestimate) for r in got] == [
            ("t0", 400, 0),
            ("t1", 200, 0),
            ("t2", 100, 0),
        ]

    def test_lossy_regime_guarantees(self, spark, skewed):
        """capacity 16 forces decrements: heavy keys must still
        SURVIVE (freq > n/capacity = 1000/16), every estimate must be
        an under-estimate, and true <= est + max_underestimate."""
        rows = misra_gries_heavy_hitters(
            skewed, "term", k=16, capacity=16
        ).collect()
        got = {r.term: r for r in rows}
        bound = rows[0].max_underestimate
        true = {"t0": 400, "t1": 200, "t2": 100}
        for t, tc in true.items():
            assert t in got, f"heavy key {t} evicted"
            assert got[t].est_count <= tc
            assert tc <= got[t].est_count + bound
        # ranking of the three heavies is preserved
        order = [r.term for r in rows if r.term in true]
        assert order == ["t0", "t1", "t2"]

    def test_merge_state_is_bounded(self, spark, skewed):
        """The pre-merge sketch carries at most capacity(+1 offset row)
        rows per partition — never the distinct-key set."""
        capacity = 8
        n_parts = skewed.rdd.getNumPartitions()
        # replicate the internal first level to count its output rows
        import pandas as pd

        from documents_vector_search_spark.operators.sketches import (
            _reduce_to_capacity as red,
        )

        def sketch_partition(batches):
            counters = {}
            offset = 0
            for pdf in batches:
                vc = pdf["term"].value_counts()
                for term, c in vc.items():
                    counters[term] = counters.get(term, 0) + int(c)
                offset += red(counters, capacity)
            yield pd.DataFrame(
                {
                    "term": list(counters.keys()) + [None],
                    "cnt": list(counters.values()) + [0],
                    "offset": [0] * len(counters) + [offset],
                }
            )

        n = (
            skewed.select(F.col("term"))
            .mapInPandas(sketch_partition, "term string, cnt long, offset long")
            .count()
        )
        assert n <= n_parts * (capacity + 1)

    def test_no_python_row_udf_in_plan(self, spark, skewed):
        plan = (
            misra_gries_heavy_hitters(skewed, "term", k=3, capacity=100)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" in plan


class TestHeavyHittersProperty:
    def test_guarantees_hold_on_random_streams(self, spark):
        """Property sweep without a fixed fixture: for several seeded
        zipf-ish streams and capacities, every estimate is an
        under-estimate within max_underestimate, and every key with
        true frequency > n/capacity survives (the Misra-Gries
        guarantee)."""
        import random

        for seed in (7, 23, 99):
            rng = random.Random(seed)
            # zipf-ish: key k with weight ~ 1/(k+1)
            keys = [f"k{i}" for i in range(200)]
            weights = [1.0 / (i + 1) for i in range(200)]
            stream = rng.choices(keys, weights=weights, k=3000)
            true = {}
            for v in stream:
                true[v] = true.get(v, 0) + 1
            df = spark.createDataFrame(
                [(v,) for v in stream], "term string"
            ).repartition(6)
            for capacity in (8, 32):
                rows = misra_gries_heavy_hitters(
                    df, "term", k=capacity, capacity=capacity
                ).collect()
                got = {r.term: r for r in rows}
                bound = rows[0].max_underestimate if rows else 0
                n = len(stream)
                for t, r in got.items():
                    assert r.est_count <= true[t], (seed, capacity, t)
                    assert true[t] <= r.est_count + bound, (seed, capacity, t)
                for t, tc in true.items():
                    if tc > n / capacity:
                        assert t in got, (
                            f"guaranteed-heavy {t} ({tc} > {n}/{capacity}) "
                            f"evicted at seed={seed}"
                        )


class TestCountMinSketch:
    """operators/sketches.py::cms_build/cms_estimate — the CMS
    guarantees: never underestimates, exact when width >> vocabulary,
    bounded overestimate driven by collisions."""

    def _stream(self, spark, counts: dict[str, int]):
        rows = [(t,) for t, n in counts.items() for _ in range(n)]
        return spark.createDataFrame(rows, "v string")

    def test_never_underestimates_and_exact_when_wide(self, spark):
        from documents_vector_search_spark.operators.sketches import (
            cms_build,
            cms_estimate,
        )

        truth = {f"t{i}": (i % 7) + 1 for i in range(40)}
        df = self._stream(spark, truth)
        items = spark.createDataFrame(
            [(t,) for t in truth], "item string"
        )
        # narrow sketch: collisions guaranteed (40 keys, width 8) but
        # estimates must never fall below the true count
        narrow = cms_build(df, F.col("v"), depth=4, width=8)
        est = {
            r.item: r.est
            for r in cms_estimate(narrow, items, depth=4, width=8).collect()
        }
        assert all(est[t] >= n for t, n in truth.items())
        # wide sketch: effectively collision-free -> exact
        wide = cms_build(df, F.col("v"), depth=4, width=4096)
        est_w = {
            r.item: r.est
            for r in cms_estimate(wide, items, depth=4, width=4096).collect()
        }
        assert est_w == truth

    def test_weighted_build_equals_occurrence_build(self, spark):
        """The r12 weighted form (pre-aggregated (value, count) rows,
        hash per DISTINCT value) must produce counter-for-counter the
        same sketch as the per-occurrence stream — the linearity
        property the cms_counts registry key now relies on."""
        from documents_vector_search_spark.operators.sketches import (
            cms_build,
        )

        truth = {f"t{i}": (i * 13) % 9 + 1 for i in range(50)}
        occ = self._stream(spark, truth)
        pre = spark.createDataFrame(
            list(truth.items()), "v string, n long"
        )
        for width in (8, 256):
            a = {
                (r.d, r.bucket): r.cnt
                for r in cms_build(
                    occ, F.col("v"), depth=4, width=width
                ).collect()
            }
            b = {
                (r.d, r.bucket): r.cnt
                for r in cms_build(
                    pre, F.col("v"), depth=4, width=width,
                    weight=F.col("n"),
                ).collect()
            }
            assert a == b

    def test_unseen_item_estimates_from_empty_buckets(self, spark):
        from documents_vector_search_spark.operators.sketches import (
            cms_build,
            cms_estimate,
        )

        df = self._stream(spark, {"a": 3})
        cms = cms_build(df, F.col("v"), depth=4, width=4096)
        items = spark.createDataFrame([("zzz_unseen",)], "item string")
        [r] = cms_estimate(cms, items, depth=4, width=4096).collect()
        assert r.est == 0

    def test_sketch_is_bounded_and_plan_udf_free(self, spark):
        from documents_vector_search_spark.operators.sketches import (
            cms_build,
        )

        df = self._stream(spark, {f"k{i}": 2 for i in range(200)})
        cms = cms_build(df, F.col("v"), depth=3, width=16)
        assert cms.count() <= 3 * 16
        plan = cms._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


class TestCorpusJaccard:
    """corpus_jaccard (operators/sketches.py): with fewer than k
    distinct shingle hashes the KMV sketch IS the full set, so the
    estimate must equal the exact Jaccard; identity and disjointness
    are pinned as the boundary cases."""

    @staticmethod
    def _docs(spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_identical_corpora_score_one(self, spark):
        from documents_vector_search_spark.operators.sketches import (
            corpus_jaccard,
        )

        docs = self._docs(
            spark, [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta")]
        )
        r = corpus_jaccard(docs, docs).collect()[0]
        assert r["jaccard_est"] == 1.0
        assert r["n_common"] == r["k_used"]

    def test_disjoint_corpora_score_zero(self, spark):
        from documents_vector_search_spark.operators.sketches import (
            corpus_jaccard,
        )

        a = self._docs(spark, [(1, "one two three four five")])
        b = self._docs(spark, [(2, "six seven eight nine ten")])
        r = corpus_jaccard(a, b).collect()[0]
        assert r["jaccard_est"] == 0.0 and r["n_common"] == 0

    def test_exact_when_under_k(self, spark):
        from documents_vector_search_spark.operators.sketches import (
            corpus_jaccard,
        )

        def py_shingles(t):
            toks = t.split()
            if len(toks) <= 3:
                return {" ".join(toks)}
            return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

        texts_a = {i: " ".join(f"w{(i + j) % 9}" for j in range(6))
                   for i in range(6)}
        texts_b = {i: " ".join(f"w{(i + j) % 9}" for j in range(6))
                   for i in range(3, 9)}
        a = self._docs(spark, list(texts_a.items()))
        b = self._docs(spark, list(texts_b.items()))
        sa = set().union(*(py_shingles(t) for t in texts_a.values()))
        sb = set().union(*(py_shingles(t) for t in texts_b.values()))
        exact = len(sa & sb) / len(sa | sb)
        r = corpus_jaccard(a, b, k=256).collect()[0]
        # < 256 distinct shingles total: the sketch is the full set
        assert r["k_used"] == len(sa | sb)
        assert r["n_common"] == len(sa & sb)
        assert abs(r["jaccard_est"] - round(exact, 6)) < 1e-9
