"""Recursive splitter (T1 parity) + KMeans-IVF ANN."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.ivf import fit_ivf
from documents_vector_search_spark.operators.knn import knn_l2
from documents_vector_search_spark.operators.recursive_split import (
    recursive_character_chunks,
    split_text_recursive,
)


class TestRecursiveSplit:
    def test_respects_chunk_size(self):
        text = "para one.\n\npara two is a bit longer.\n\n" + "word " * 300
        chunks = split_text_recursive(text, chunk_size=100, chunk_overlap=20)
        assert all(len(c) <= 100 for c in chunks)
        assert "".join(chunks)  # nothing lost entirely

    def test_prefers_paragraph_boundaries(self):
        text = "aaaa bbbb.\n\ncccc dddd."
        chunks = split_text_recursive(text, chunk_size=15, chunk_overlap=0)
        assert chunks[0].startswith("aaaa")
        assert any(c.startswith("cccc") for c in chunks)

    def test_overlap_carried(self):
        text = ("x" * 50 + " ") * 10
        chunks = split_text_recursive(text, chunk_size=100, chunk_overlap=20)
        for a, b in zip(chunks, chunks[1:]):
            assert b.startswith(a[-20:]) or len(a) < 20

    def test_small_and_empty(self):
        assert split_text_recursive("", 100, 10) == []
        assert split_text_recursive("tiny", 100, 10) == ["tiny"]

    def test_hard_split_no_separators(self):
        chunks = split_text_recursive("a" * 250, chunk_size=100, chunk_overlap=10)
        assert all(len(c) <= 100 for c in chunks)
        assert sum(len(c) for c in chunks) >= 250

    def test_invalid_overlap(self):
        with pytest.raises(ValueError):
            split_text_recursive("x", chunk_size=10, chunk_overlap=10)

    def test_dataframe_udf_shape(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha.\n\nbeta.\n\n" + "gamma " * 50), (2, "")],
            ["doc_id", "text"],
        )
        got = recursive_character_chunks(df, chunk_size=80, chunk_overlap=10)
        rows = got.collect()
        assert all(len(r.chunk_text) <= 80 for r in rows)
        nums = [r.chunk_number for r in rows if r.doc_id == 1]
        assert nums == list(range(len(nums)))  # contiguous 0-based
        assert all(r.doc_id == 1 for r in rows)  # empty doc → no chunks


class TestIVF:
    def test_probe_all_equals_exact(self, embeddings_df):
        from documents_vector_search_spark.registry import QUERY_VEC

        ivf = fit_ivf(embeddings_df, nlist=4)
        approx = ivf.search_l2(QUERY_VEC, 5, nprobe=4).collect()
        exact = knn_l2(embeddings_df, QUERY_VEC, 5).collect()
        assert [r.vec_id for r in approx] == [r.vec_id for r in exact]

    def test_pruned_probe_is_subset_and_ordered(self, embeddings_df):
        from documents_vector_search_spark.registry import QUERY_VEC

        ivf = fit_ivf(embeddings_df, nlist=8)
        got = ivf.search_l2(QUERY_VEC, 5, nprobe=2).collect()
        assert len(got) == 5
        dists = [r.distance for r in got]
        assert dists == sorted(dists)
        # every hit really lives in a probed cluster
        probed = set(ivf.probe_clusters(QUERY_VEC, 2))
        clusters = {
            r.cluster_id
            for r in ivf.assigned.filter(
                F.col("vec_id").isin([g.vec_id for g in got])
            ).collect()
        }
        assert clusters <= probed

    def test_pandas_assigner_matches_expression(self, embeddings_df):
        """assign_cluster_pandas (large-nlist path) must agree with
        assign_cluster_expr row-for-row — same rounding, same
        lowest-index tie-break."""
        from documents_vector_search_spark.operators.ivf import (
            assign_cluster_expr,
            assign_cluster_pandas,
            round_centroids,
        )

        ivf = fit_ivf(embeddings_df, nlist=6)
        cents = round_centroids(ivf.centroids)
        vec = F.col("embedding").cast("array<double>")
        both = embeddings_df.select(
            "vec_id",
            assign_cluster_expr(vec, cents).alias("by_expr"),
            assign_cluster_pandas(vec, cents).alias("by_pandas"),
        ).collect()
        assert all(r.by_expr == r.by_pandas for r in both)
        assert len({r.by_expr for r in both}) > 1  # several clusters hit

    def test_partitioned_write_prunes(self, embeddings_df, tmp_path, spark):
        ivf = fit_ivf(embeddings_df, nlist=4)
        path = str(tmp_path / "ivf")
        ivf.write_partitioned(path)
        reloaded = spark.read.parquet(path)
        plan = (
            reloaded.filter(F.col("cluster_id") == 1)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters: [isnotnull(cluster_id" in plan


class TestProductQuantization:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )

    @pytest.fixture(scope="class")
    def codebooks(self, emb):
        from documents_vector_search_spark.operators.pq import fit_pq

        return fit_pq(emb, dim=16, m=4, ksub=8)

    def test_pandas_encoder_matches_expression(self, emb, codebooks):
        """pq_encode_pandas (large-ksub path) must agree with
        pq_encode_expr code-for-code."""
        from documents_vector_search_spark.operators.pq import (
            pq_encode_expr,
            pq_encode_pandas,
        )

        vec = F.col("embedding").cast("array<double>")
        both = emb.select(
            "vec_id",
            pq_encode_expr(vec, codebooks).alias("by_expr"),
            pq_encode_pandas(vec, codebooks).alias("by_pandas"),
        ).collect()
        assert all(list(r.by_expr) == list(r.by_pandas) for r in both)

    def test_codebook_shape_and_rounding(self, codebooks):
        assert len(codebooks) == 4
        assert all(len(cb) == 8 for cb in codebooks)
        assert all(len(c) == 4 for cb in codebooks for c in cb)
        for cb in codebooks:
            for cent in cb:
                assert all(x == round(x, 6) for x in cent)

    def test_encode_deterministic_and_in_range(self, emb, codebooks):
        from documents_vector_search_spark.operators.pq import pq_encode_expr

        enc = emb.select(
            "vec_id",
            pq_encode_expr(
                F.col("embedding").cast("array<double>"), codebooks
            ).alias("codes"),
        )
        rows = {r.vec_id: list(r.codes) for r in enc.collect()}
        rows2 = {r.vec_id: list(r.codes) for r in enc.collect()}
        assert rows == rows2
        assert all(len(c) == 4 for c in rows.values())
        assert all(0 <= x < 8 for c in rows.values() for x in c)

    def test_adc_matches_lut_reconstruction(self, emb, codebooks):
        """ADC semantics, exactly: every returned distance must equal
        sqrt(Σ_j lut[j][code_j]) recomputed driver-side from the row's
        codes — table lookups, not full-vector math."""
        from documents_vector_search_spark.operators.pq import (
            pq_adc_lut,
            pq_adc_topk,
            pq_encode_expr,
        )

        q = [((i * 37) % 17 - 8) / 10.0 for i in range(16)]
        enc = emb.select(
            "vec_id",
            pq_encode_expr(
                F.col("embedding").cast("array<double>"), codebooks
            ).alias("codes"),
        )
        adc = {
            r.vec_id: r.adc_distance
            for r in pq_adc_topk(enc, codebooks, q, k=10).collect()
        }
        dists = list(adc.values())
        assert all(d >= 0 for d in dists)
        lut = pq_adc_lut(q, codebooks)
        codes = {r.vec_id: list(r.codes) for r in enc.collect()}
        for vid, d in adc.items():
            expect = round(
                sum(lut[j][codes[vid][j]] for j in range(4)) ** 0.5, 6
            )
            assert d == expect

    def test_adc_recall_with_rerank_margin(self, emb, codebooks):
        """ADC is approximate — the standard usage is ADC-shortlist then
        exact re-rank. Query with an actual corpus vector: its own ADC
        distance is pure quantization error, so it must land in a
        moderate shortlist (k=50 over 500 near-random unit vectors,
        where distances cluster tightly and exact top-10 recall is not
        a fair bar for a coarse 8-code codebook)."""
        from documents_vector_search_spark.operators.pq import (
            pq_adc_topk,
            pq_encode_expr,
        )

        target = emb.filter(F.col("vec_id") == 42).first()
        q = [float(x) for x in target.embedding]
        enc = emb.select(
            "vec_id",
            pq_encode_expr(
                F.col("embedding").cast("array<double>"), codebooks
            ).alias("codes"),
        )
        shortlist = {
            r.vec_id for r in pq_adc_topk(enc, codebooks, q, k=50).collect()
        }
        assert 42 in shortlist

    def test_dim_not_divisible_rejected(self, emb):
        from documents_vector_search_spark.operators.pq import fit_pq

        with pytest.raises(ValueError, match="not divisible"):
            fit_pq(emb, dim=16, m=5)


class TestTrainingSample:
    """collect_training_sample's uniform hash gate (ADVICE r4: a bare
    limit() on a cluster-partitioned table trains centroids on the
    first few cluster directories only)."""

    @staticmethod
    def _two_cluster_df(spark):
        # 400 distinct vectors: ids 0-199 near the origin ("cluster A"),
        # ids 200-399 shifted +100 ("cluster B")
        rows = [
            (i, [float(i % 23) + (100.0 if i >= 200 else 0.0), float(i)])
            for i in range(400)
        ]
        return spark.createDataFrame(rows, ["id", "v"])

    def test_layout_independent_beyond_budget(self, spark):
        import numpy as np

        from documents_vector_search_spark.operators.kmeans import (
            collect_training_sample,
        )

        df = self._two_cluster_df(spark)
        a = collect_training_sample(df.orderBy("id").coalesce(1), "v", 64)
        b = collect_training_sample(df.repartition(7, "id"), "v", 64)
        c = collect_training_sample(df.orderBy(F.desc("id")), "v", 64)
        assert len(a) == 64
        assert np.array_equal(a, b)
        assert np.array_equal(a, c)

    def test_gate_sample_spans_clusters(self, spark):
        from documents_vector_search_spark.operators.kmeans import (
            collect_training_sample,
        )

        # physically ordered by cluster: a scan-prefix limit(64) would
        # return only cluster-A vectors; the hash gate must draw both
        df = self._two_cluster_df(spark).orderBy("id").coalesce(1)
        X = collect_training_sample(df, "v", 64)
        firsts = X[:, 0]
        assert (firsts < 50.0).any(), "no cluster-A vectors sampled"
        assert (firsts > 50.0).any(), "no cluster-B vectors sampled"

    def test_small_corpus_collects_everything(self, spark):
        from documents_vector_search_spark.operators.kmeans import (
            collect_training_sample,
        )

        df = self._two_cluster_df(spark)
        X = collect_training_sample(df, "v", 1024)
        assert len(X) == 400


class TestAdcBatchShortlist:
    """pq_adc_batch_shortlist's parity contract: each query's shortlist
    SET equals its standalone pruned pq_adc_topk selection."""

    def test_single_query_matches_pq_adc_topk(self, embeddings_df, spark):
        from documents_vector_search_spark.operators.ivf import (
            assign_cluster_expr,
            fit_ivf,
            round_centroids,
        )
        from documents_vector_search_spark.operators.pq import (
            fit_pq,
            pq_adc_batch_shortlist,
            pq_adc_topk,
            pq_encode_expr,
        )
        from documents_vector_search_spark.registry import QUERY_VEC

        cents = round_centroids(fit_ivf(embeddings_df, nlist=4).centroids)
        codebooks = fit_pq(embeddings_df, dim=16, m=4, ksub=8)
        vec = F.col("embedding").cast("array<double>")
        enc = embeddings_df.select(
            "vec_id",
            pq_encode_expr(vec, codebooks).alias("codes"),
            assign_cluster_expr(vec, cents).alias("cluster_id"),
        )
        probes = [0, 2]
        pruned = enc.filter(F.col("cluster_id").isin(probes))
        expected = {
            r.vec_id
            for r in pq_adc_topk(pruned, codebooks, QUERY_VEC, 25).collect()
        }
        got = {
            r.vec_id
            for r in pq_adc_batch_shortlist(
                pruned, codebooks, {"q": QUERY_VEC}, {"q": probes}, 25,
            ).collect()
        }
        assert got == expected

    def test_two_queries_independent_probe_masks(self, embeddings_df):
        from documents_vector_search_spark.operators.ivf import (
            assign_cluster_expr,
            fit_ivf,
            round_centroids,
        )
        from documents_vector_search_spark.operators.pq import (
            fit_pq,
            pq_adc_batch_shortlist,
            pq_encode_expr,
        )
        from documents_vector_search_spark.registry import QUERY_VEC

        cents = round_centroids(fit_ivf(embeddings_df, nlist=4).centroids)
        codebooks = fit_pq(embeddings_df, dim=16, m=4, ksub=8)
        vec = F.col("embedding").cast("array<double>")
        enc = embeddings_df.select(
            "vec_id",
            pq_encode_expr(vec, codebooks).alias("codes"),
            assign_cluster_expr(vec, cents).alias("cluster_id"),
        )
        qb = [v + 0.25 for v in QUERY_VEC]
        rows = pq_adc_batch_shortlist(
            enc.filter(F.col("cluster_id").isin([0, 1, 3])),
            codebooks,
            {"a": QUERY_VEC, "b": qb},
            {"a": [0, 3], "b": [1]},
            10,
        ).collect()
        clusters = {
            r.vec_id: r.cluster_id
            for r in enc.select("vec_id", "cluster_id").collect()
        }
        for r in rows:
            allowed = {0, 3} if r.qid == "a" else {1}
            assert clusters[r.vec_id] in allowed, r


class TestTopicProfile:
    """operators/topics.py — nearest-centroid profile semantics."""

    def test_profile_exact_small(self, spark):
        from documents_vector_search_spark.operators.topics import (
            topic_profile,
        )

        # two well-separated centroids; one point equidistant (tie ->
        # lower topic id)
        rows = [
            (0, [0.0, 0.0], 7),
            (1, [0.2, 0.0], 7),
            (2, [4.0, 0.0], 3),
            (3, [2.0, 0.0], 3),  # equidistant (d=2 to both) -> tie -> topic 0
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        cents = [[0.0, 0.0], [4.0, 0.0]]
        got = {
            r.topic_id: r
            for r in topic_profile(emb, cents, label_col="label").collect()
        }
        assert set(got) == {0, 1}
        assert got[0].n_docs == 3 and got[1].n_docs == 1
        assert abs(got[0].share - 0.75) < 1e-9
        assert abs(got[1].share - 0.25) < 1e-9
        # topic 0 holds labels {7, 7, 3} -> modal label 7; topic 1 {3}
        assert got[0].top_label == 7 and got[1].top_label == 3
        # avg_dist over rounded member distances: (0 + 0.2 + 2.0)/3
        assert abs(got[0].avg_dist - round((0.0 + 0.2 + 2.0) / 3, 6)) < 1e-9

    def test_top_label_tie_breaks_low(self, spark):
        from documents_vector_search_spark.operators.topics import (
            topic_profile,
        )

        emb = spark.createDataFrame(
            [(0, [0.0], 9), (1, [0.1], 2)],
            "vec_id long, embedding array<double>, label int",
        )
        got = topic_profile(emb, [[0.0]], label_col="label").collect()
        assert len(got) == 1 and got[0].top_label == 2

    def test_share_sums_to_one_on_corpus(self, embeddings_df):
        from documents_vector_search_spark.operators.ivf import (
            fit_ivf,
            round_centroids,
        )
        from documents_vector_search_spark.operators.topics import (
            topic_profile,
        )

        cents = round_centroids(fit_ivf(embeddings_df, nlist=4).centroids)
        prof = topic_profile(embeddings_df, cents, label_col="label").collect()
        assert abs(sum(r.share for r in prof) - 1.0) < 1e-4
        assert sum(r.n_docs for r in prof) == embeddings_df.count()
        assert [r.topic_id for r in prof] == sorted(r.topic_id for r in prof)

    def test_topic_terms_stopword_self_suppression(self, spark):
        """A term present in EVERY doc scores ln(1)=0 and loses to any
        topic-distinctive term; ranks are 0-based and tie-break on the
        lower term."""
        from documents_vector_search_spark.operators.topics import (
            topic_terms,
        )

        docs = spark.createDataFrame(
            [
                (0, "the spark shuffle"),
                (1, "the spark join"),
                (2, "the spark agg"),
                (3, "the quantum flux"),
                (4, "the quantum well"),
                (5, "the quantum dot"),
            ],
            "doc_id long, text string",
        )
        emb = spark.createDataFrame(
            [(i, [0.0 + 0.1 * i]) for i in range(3)]
            + [(i, [4.0 + 0.1 * (i - 3)]) for i in range(3, 6)],
            "vec_id long, embedding array<double>",
        )
        got = topic_terms(docs, emb, [[0.1], [4.1]], k=2).collect()
        by_topic = {}
        for r in got:
            by_topic.setdefault(r.topic_id, []).append(r)
        # "the" (df_all=6=N) scores 0 -> never in the top-2 of either
        # topic while positive-scoring terms exist
        assert all(r.term != "the" for r in got)
        # topic 0: spark 3*ln(2)=2.079 beats each unique term's
        # ln(6)=1.792; among the tied uniques "agg" < "join" < "shuffle"
        assert [(r.term, r.rank) for r in by_topic[0]] == [
            ("spark", 0),
            ("agg", 1),
        ]
        assert [(r.term, r.rank) for r in by_topic[1]] == [
            ("quantum", 0),
            ("dot", 1),
        ]
