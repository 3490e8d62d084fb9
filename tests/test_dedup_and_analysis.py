"""Dedup family, ANN, text analysis, multimodal plumbing, embedding seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.ann import ann_knn_l2, bucket_of
from documents_vector_search_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    random_hyperplanes,
    simhash_fingerprints,
)
from documents_vector_search_spark.operators.embedding import (
    hash_embedding_expr,
    make_embedder_udf,
)
from documents_vector_search_spark.operators.knn import knn_l2
from documents_vector_search_spark.operators.multimodal import (
    attach_binary_payload,
    extract_media_features,
)
from documents_vector_search_spark.operators.text_analysis import (
    language_id,
    quality_score,
    token_counts,
)


@pytest.fixture()
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("dog", "cat")),  # near dup
        (4, "completely different text about spark query planning engines"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestExactDedup:
    def test_groups(self, dup_docs):
        got = {r.canonical_id: r.dup_count for r in exact_dedup(dup_docs).collect()}
        assert got[1] == 2  # docs 1+2 share a hash, canonical = min id
        assert got[3] == 1 and got[4] == 1


class TestSoftDedupWeights:
    """soft_dedup_weights (operators/dedup.py): inverse-duplication
    reweighting — one row per input doc, group mass 1, consistency
    with exact_dedup's groups, and the plan stays a single window
    (no join back)."""

    def test_weights_and_group_mass(self, dup_docs):
        from documents_vector_search_spark.operators.dedup import (
            soft_dedup_weights,
        )

        rows = {r.doc_id: r for r in soft_dedup_weights(dup_docs).collect()}
        assert set(rows) == {1, 2, 3, 4}  # every input doc kept
        assert rows[1]["dup_count"] == rows[2]["dup_count"] == 2
        assert rows[1]["weight"] == rows[2]["weight"] == 0.5
        assert rows[3]["weight"] == 1.0 and rows[4]["weight"] == 1.0
        # group mass: sum of weights per hash == 1 (up to round_to)
        assert rows[1]["content_hash"] == rows[2]["content_hash"]
        assert rows[1]["weight"] + rows[2]["weight"] == pytest.approx(1.0)

    def test_consistent_with_exact_dedup(self, dup_docs):
        from documents_vector_search_spark.operators.dedup import (
            soft_dedup_weights,
        )

        groups = {
            r.content_hash: r.dup_count
            for r in exact_dedup(dup_docs).collect()
        }
        for r in soft_dedup_weights(dup_docs).collect():
            assert groups[r.content_hash] == r.dup_count

    def test_single_shuffle_no_join(self, dup_docs):
        from documents_vector_search_spark.operators.dedup import (
            soft_dedup_weights,
        )

        plan = (
            soft_dedup_weights(dup_docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan  # window count, not a count-join-back


class TestNgramNovelty:
    """ngram_novelty (operators/dedup.py): duplicated text scores 0,
    unique text scores 1, empty text keeps a zero row, and the score
    equals a brute-force shingle-df computation."""

    def test_dups_zero_unique_one(self, dup_docs, spark):
        from documents_vector_search_spark.operators.dedup import (
            ngram_novelty,
        )

        rows = {r.doc_id: r for r in ngram_novelty(dup_docs).collect()}
        # docs 1+2 are identical: every shingle has df >= 2 -> novelty 0
        assert rows[1]["novelty"] == 0.0 and rows[2]["novelty"] == 0.0
        # doc 4 shares no 3-gram with anything -> fully novel
        assert rows[4]["novelty"] == 1.0
        # doc 3 differs from 1/2 by one word: mixed
        assert 0.0 < rows[3]["novelty"] < 1.0

    def test_empty_text_keeps_zero_row(self, spark):
        from documents_vector_search_spark.operators.dedup import (
            ngram_novelty,
        )

        docs = spark.createDataFrame(
            [(1, "some words here"), (2, "")], ["doc_id", "text"]
        )
        rows = {r.doc_id: r for r in ngram_novelty(docs).collect()}
        assert set(rows) == {1, 2}
        assert rows[1]["novelty"] == 1.0

    def test_matches_brute_force(self, spark):
        from documents_vector_search_spark.operators.dedup import (
            ngram_novelty,
        )

        texts = {
            i: " ".join(
                f"w{(i * 7 + j * 3) % 15}" for j in range(5 + i % 4)
            )
            for i in range(12)
        }
        docs = spark.createDataFrame(
            list(texts.items()), ["doc_id", "text"]
        )
        got = {r.doc_id: r for r in ngram_novelty(docs).collect()}

        def py_shingles(t):
            toks = t.split()
            if len(toks) <= 3:
                return {" ".join(toks)}
            return {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }

        all_sh = {i: py_shingles(t) for i, t in texts.items()}
        for i, sh in all_sh.items():
            others = set().union(
                *(s for j, s in all_sh.items() if j != i)
            )
            novel = len(sh - others)
            assert got[i]["n_shingles"] == len(sh), i
            assert got[i]["n_novel"] == novel, i


class TestMinHashLSH:
    def test_finds_planted_near_dup(self, dup_docs):
        pairs = minhash_lsh_pairs(dup_docs, threshold=0.5).collect()
        got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
        assert got[(1, 2)] == 1.0  # exact dup
        assert (1, 3) in got or (2, 3) in got  # near dup found via bands
        assert all(a < b for a, b in got)  # canonical pair direction

    def test_no_false_pairs_at_high_threshold(self, dup_docs):
        pairs = minhash_lsh_pairs(dup_docs, threshold=0.999).collect()
        assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


class TestSimHash:
    def test_identical_text_identical_fingerprint(self, dup_docs):
        fp = {r.doc_id: r.simhash for r in simhash_fingerprints(dup_docs).collect()}
        assert fp[1] == fp[2]
        ham_near = bin(fp[1] ^ fp[3]).count("1")
        ham_far = bin(fp[1] ^ fp[4]).count("1")
        assert ham_near < ham_far


class TestCrossDedup:
    def test_bipartite_pairs_and_no_within_side_pairs(self, spark):
        from documents_vector_search_spark.operators.dedup import (
            minhash_lsh_pairs_between,
        )

        base = "the quick brown fox jumps over the lazy dog again and again ok"
        corpus = spark.createDataFrame(
            [(1, base), (2, "existing corpus text about query planning")],
            ["doc_id", "text"],
        )
        # 101 near-dups corpus doc 1; 102+103 are identical to EACH
        # OTHER but novel vs the corpus — a bipartite pairer must not
        # report them (no new x new pairs)
        new = spark.createDataFrame(
            [
                (101, base.replace("dog", "cat")),
                (102, "novel content that matches nothing in the corpus"),
                (103, "novel content that matches nothing in the corpus"),
            ],
            ["doc_id", "text"],
        )
        pairs = minhash_lsh_pairs_between(new, corpus, threshold=0.5)
        got = {(r.new_id, r.corpus_id): r.jaccard for r in pairs.collect()}
        assert (101, 1) in got
        assert all(n >= 100 and c < 100 for n, c in got)

    def test_embedding_bipartite_matches_sides(self, spark):
        from documents_vector_search_spark.operators.dedup import (
            embedding_neardup_pairs_between,
        )

        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
        ]
        new_rows = [
            (101, [0.99, 0.01, 0.0, 0.0]),   # near-dup of corpus 1
            (102, [0.0, 0.0, 1.0, 0.0]),     # novel direction
            (103, [0.99, 0.02, 0.0, 0.0]),   # near-dup of corpus 1 AND 101
        ]
        corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
        new = spark.createDataFrame(new_rows, ["vec_id", "embedding"])
        pairs = embedding_neardup_pairs_between(
            new, corpus, threshold=0.9, n_planes=2, dim=4
        )
        got = {(r.new_id, r.corpus_id) for r in pairs.collect()}
        # only cross-side pairs, never 101x103 (both on the new side)
        assert got == {(101, 1), (103, 1)}

    def test_embedding_bipartite_empty_new_side(self, spark):
        """An empty daily batch is routine for an admission check —
        dim inference must fall back to the corpus side (or an empty
        frame), never crash."""
        from documents_vector_search_spark.operators.dedup import (
            embedding_neardup_pairs_between,
        )

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0])], ["vec_id", "embedding"]
        )
        empty = corpus.filter(F.lit(False))
        assert embedding_neardup_pairs_between(empty, corpus).count() == 0
        assert embedding_neardup_pairs_between(empty, empty).count() == 0

    def test_cap_bounds_both_sides(self, spark):
        from documents_vector_search_spark.operators.dedup import (
            minhash_lsh_pairs_between,
        )

        same = "identical boilerplate text repeated across every document here"
        new = spark.createDataFrame(
            [(100 + i, same) for i in range(20)], ["doc_id", "text"]
        )
        corpus = spark.createDataFrame(
            [(i, same) for i in range(20)], ["doc_id", "text"]
        )
        capped = minhash_lsh_pairs_between(
            new, corpus, threshold=0.5, max_bucket_size=5
        )
        assert capped.count() == 0  # degenerate buckets dropped, bounded plan
        uncapped = minhash_lsh_pairs_between(new, corpus, threshold=0.5)
        assert uncapped.count() == 400  # 20 x 20 bipartite, no self pairs


class TestSimhashPairs:
    def test_exact_dup_zero_hamming_and_bounds(self, dup_docs):
        from documents_vector_search_spark.operators.dedup import (
            simhash_pairs,
        )

        got = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(
            dup_docs, max_hamming=3
        ).collect()}
        assert got[(1, 2)] == 0  # identical text → identical fingerprint
        assert all(h <= 3 for h in got.values())

    def test_matches_brute_force(self, spark):
        """Pigeonhole contract: banding must find EVERY pair at
        ≤ max_hamming, so the result equals the all-pairs check."""
        from documents_vector_search_spark.operators.dedup import (
            simhash_fingerprints,
            simhash_pairs,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(120)
        fps = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
        ids = sorted(fps)
        brute = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
            if bin(fps[a] ^ fps[b]).count("1") <= 3
        }
        banded = {
            (r.id_a, r.id_b) for r in simhash_pairs(docs, max_hamming=3).collect()
        }
        assert banded == brute

    def test_hamming_range_validation_and_cap(self, dup_docs):
        from documents_vector_search_spark.operators.dedup import (
            simhash_pairs,
        )

        with pytest.raises(ValueError, match="max_hamming"):
            simhash_pairs(dup_docs, max_hamming=4)
        # cap of 1 empties every bucket that could pair
        assert simhash_pairs(dup_docs, max_bucket_size=1).count() == 0


class TestNgramJaccard:
    def test_exact_pairs(self, dup_docs):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(dup_docs, threshold=0.4).collect()
        }
        assert got[(1, 2)] == 1.0
        assert 0.4 <= got[(1, 3)] < 1.0
        assert (1, 4) not in got


class TestEmbeddingNearDup:
    def test_planted_duplicate_vector(self, spark):
        base = [float(i % 7 - 3) for i in range(16)]
        near = list(base)
        near[0] += 0.01
        far = [float((i * 3) % 5 - 2) for i in range(16)]
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, far)], ["vec_id", "embedding"]
        )
        pairs = embedding_neardup_pairs(df, threshold=0.99, n_planes=2).collect()
        assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}

    def test_semdedup_single_cluster_equals_brute_force(self, spark):
        """With one cluster, SemDeDup's within-cluster verification IS
        all-pairs cosine — pins the shared pairing core's semantics."""
        from documents_vector_search_spark.operators.dedup import (
            semdedup_pairs,
        )

        base = [float(i % 7 - 3) for i in range(16)]
        near = list(base)
        near[0] += 0.01
        far = [float((i * 3) % 5 - 2) for i in range(16)]
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, far)], ["vec_id", "embedding"]
        )
        centroid = [[0.0] * 16]  # nlist=1: everything in one cluster
        pairs = {
            (r.id_a, r.id_b): r.cosine
            for r in semdedup_pairs(df, centroid, threshold=0.99).collect()
        }
        assert set(pairs) == {(1, 2)}

    def test_semdedup_cluster_separation_prunes_cross_pairs(self, spark):
        """Vectors in different clusters are never verified — the
        data-aware analog of LSH bucketing."""
        from documents_vector_search_spark.operators.dedup import (
            semdedup_pairs,
        )

        a = [10.0] * 16
        b = [10.0] * 15 + [10.1]
        c = [-10.0] * 16
        d = [-10.0] * 15 + [-10.1]
        df = spark.createDataFrame(
            [(1, a), (2, b), (3, c), (4, d)], ["vec_id", "embedding"]
        )
        cents = [[10.0] * 16, [-10.0] * 16]
        got = {
            (r.id_a, r.id_b)
            for r in semdedup_pairs(df, cents, threshold=0.9).collect()
        }
        assert got == {(1, 2), (3, 4)}


class TestANN:
    def test_bucket_of_matches_expression(self, spark):
        planes = random_hyperplanes(8, 3, seed=1)
        vecs = [[float(j == i) - 0.3 for j in range(8)] for i in range(8)]
        df = spark.createDataFrame(
            list(enumerate(vecs)), ["vec_id", "embedding"]
        )
        from documents_vector_search_spark.operators.dedup import hyperplane_bucket

        got = df.select(
            "vec_id",
            hyperplane_bucket(F.col("embedding").cast("array<double>"), planes).alias(
                "b"
            ),
        ).collect()
        for r in got:
            assert r.b == bucket_of(vecs[r.vec_id], planes)

    def test_ann_subset_of_exact_with_full_probe(self, embeddings_df):
        from documents_vector_search_spark.registry import QUERY_VEC

        # multiprobe over ALL 2^2 buckets == exact search
        ann = ann_knn_l2(
            embeddings_df, QUERY_VEC, 5, n_planes=2, multiprobe_bits=2
        )
        exact = knn_l2(embeddings_df, QUERY_VEC, 5)
        ann_ids = [r.vec_id for r in ann.collect()]
        exact_ids = [r.vec_id for r in exact.collect()]
        # with radius-2 multiprobe on 2 planes every bucket is probed
        assert ann_ids == exact_ids


class TestTextAnalysis:
    def test_language_id_markers(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat and the dog of the house"),
                (2, "el perro y la casa de la ciudad"),
                (3, "xyzzy qwerty asdf"),
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r.lang_guess for r in language_id(df).collect()}
        assert got[1] == "en" and got[2] == "es" and got[3] == "und"

    def test_quality_bounds_and_features(self, tiny_docs):
        rows = quality_score(tiny_docs).collect()
        for r in rows:
            assert 0.0 <= r.quality <= 1.0
            assert 0.0 <= r.alpha_ratio <= 1.0
        empty = [r for r in rows if r.doc_id == 5][0]
        assert empty.n_tokens == 0 and empty.quality == 0.0

    def test_token_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta  gamma"), (2, "internationalization")],
            ["doc_id", "text"],
        )
        got = {r.doc_id: (r.ws_tokens, r.bpe_estimate) for r in token_counts(df).collect()}
        assert got[1] == (3, 2 + 1 + 2)  # ceil(5/4)+ceil(4/4)+ceil(5/4)
        assert got[2] == (1, 5)  # ceil(20/4)


class TestMultimodal:
    def test_feature_extraction_roundtrip(self, tiny_docs):
        media = attach_binary_payload(tiny_docs)
        feats = {r.id: r for r in extract_media_features(media).collect()}
        assert len(feats) == 5
        r = feats[1]
        assert r.byte_len == len("the quick brown fox jumps over the lazy dog")
        assert r.media_type == "text/plain"
        assert len(r.sha256) == 64
        assert feats[5].byte_len == 0  # empty doc

    def test_custom_decoder_injection(self, tiny_docs):
        media = attach_binary_payload(tiny_docs)
        got = extract_media_features(
            media, decoder=lambda mt, payload: (640, 480, 42)
        ).first()
        assert (got.width, got.height, got.n_frames) == (640, 480, 42)

    def test_resize_stub_and_injection(self, tiny_docs):
        from documents_vector_search_spark.operators.multimodal import (
            resize_media,
        )

        media = attach_binary_payload(tiny_docs)
        out = {r.id: r for r in resize_media(media, 8, 4).collect()}
        assert len(out) == 5
        assert all(len(r.payload) == 8 * 4 for r in out.values())
        assert all((r.width, r.height) == (8, 4) for r in out.values())
        # deterministic: same input -> same fake bitmap
        again = {r.id: bytes(r.payload) for r in resize_media(media, 8, 4).collect()}
        assert {i: bytes(r.payload) for i, r in out.items()} == again

        injected = resize_media(
            media, 2, 2, resizer=lambda mt, p, w, h: b"\xff" * (w * h)
        ).first()
        assert bytes(injected.payload) == b"\xff\xff\xff\xff"

    def test_frame_sampling_fan_out(self, spark):
        from documents_vector_search_spark.operators.multimodal import (
            sample_frames,
        )

        media = spark.createDataFrame(
            [(1, "video/fake", bytearray(b"x" * 3072)),  # fake 3s video
             (2, "video/fake", bytearray(b"y" * 10))],   # fake 1s video
            ["id", "media_type", "payload"],
        )
        rows = sample_frames(media, every_ms=1000).collect()
        by_id: dict[int, list] = {}
        for r in rows:
            by_id.setdefault(r.id, []).append(r)
        assert len(by_id[1]) == 3 and len(by_id[2]) == 1
        assert [r.frame_index for r in sorted(by_id[1], key=lambda r: r.ts_ms)] == [0, 1, 2]
        assert all(r.ts_ms % 1000 == 0 for r in rows)

        injected = sample_frames(
            media, every_ms=500,
            sampler=lambda mt, p, ms: [(0, b"f0"), (ms, b"f1")],
        ).collect()
        assert {(r.id, r.ts_ms, bytes(r.payload)) for r in injected} == {
            (1, 0, b"f0"), (1, 500, b"f1"), (2, 0, b"f0"), (2, 500, b"f1"),
        }

    def test_repartition_by_bytes(self, spark):
        from documents_vector_search_spark.operators.multimodal import (
            repartition_by_bytes,
        )

        media = spark.createDataFrame(
            [(i, "blob", bytearray(b"z" * 1000)) for i in range(10)],
            ["id", "media_type", "payload"],
        )
        out = repartition_by_bytes(media, bytes_per_partition=2500)
        assert out.rdd.getNumPartitions() == 4  # ceil(10000/2500)
        assert out.count() == 10
        empty = spark.createDataFrame([], "id BIGINT, payload BINARY")
        assert repartition_by_bytes(empty).rdd.getNumPartitions() == 1


class TestEmbedding:
    def test_hash_embedding_deterministic_unit_norm(self, spark):
        df = spark.createDataFrame([("abc",), ("abc",), ("xyz",)], ["t"])
        rows = df.select(hash_embedding_expr(F.col("t"), 8).alias("v")).collect()
        assert rows[0].v == rows[1].v
        assert rows[0].v != rows[2].v
        norm = sum(x * x for x in rows[0].v) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-9)

    def test_embedder_udf_with_injected_model(self, spark):
        class FakeModel:
            def encode(self, texts):
                return [[float(len(t)), 1.0] for t in texts]

        udf = make_embedder_udf("fake-model", loader=lambda name: FakeModel())
        df = spark.createDataFrame([("ab",), ("abcd",)], ["t"])
        got = [r.v for r in df.select(udf(F.col("t")).alias("v")).collect()]
        assert got == [[2.0, 1.0], [4.0, 1.0]]


class TestSimilarityJoin:
    def test_exact_join_each_left_gets_k(self, embeddings_df):
        from documents_vector_search_spark.operators.similarity_join import (
            knn_join_exact,
        )

        left = embeddings_df.filter(F.col("vec_id") < 10)
        right = embeddings_df.filter(F.col("vec_id") >= 10)
        got = knn_join_exact(left, right, k=3).collect()
        by_left = {}
        for r in got:
            by_left.setdefault(r.left_id, []).append(r)
        assert set(by_left) == set(range(10))
        for rows in by_left.values():
            assert [r.rank for r in sorted(rows, key=lambda x: x.rank)] == [0, 1, 2]
            cosines = [r.cosine for r in sorted(rows, key=lambda x: x.rank)]
            assert cosines == sorted(cosines, reverse=True)

    def test_lsh_join_is_subset_with_full_probe_equal(self, embeddings_df):
        from documents_vector_search_spark.operators.similarity_join import (
            knn_join_exact,
            knn_join_lsh,
        )

        left = embeddings_df.filter(F.col("vec_id") < 5)
        right = embeddings_df.filter(F.col("vec_id") >= 5)
        exact = {
            (r.left_id, r.rank): r.right_id
            for r in knn_join_exact(left, right, k=2).collect()
        }
        # full multiprobe (radius = n_planes) probes every bucket → exact
        full = {
            (r.left_id, r.rank): r.right_id
            for r in knn_join_lsh(
                left, right, k=2, n_planes=2, multiprobe_bits=2
            ).collect()
        }
        assert full == exact
        # pruned probe returns a subset of candidates, still ranked
        pruned = knn_join_lsh(left, right, k=2, n_planes=4, multiprobe_bits=0)
        for r in pruned.collect():
            assert r.rank in (0, 1)


class TestHardNegatives:
    """operators/similarity_join.py hard-negative mining — the
    contrastive-training negatives family."""

    def test_exact_never_returns_same_label_or_self(self, embeddings_df):
        from documents_vector_search_spark.operators.similarity_join import (
            hard_negative_pairs_exact,
        )

        anchors = embeddings_df.filter(F.col("vec_id") < 8)
        got = hard_negative_pairs_exact(anchors, embeddings_df, k=3).collect()
        assert len(got) > 0
        for r in got:
            assert r.left_label != r.right_label
            assert r.left_id != r.right_id
            assert 0 <= r.rank < 3
        by_left = {}
        for r in got:
            by_left.setdefault(r.left_id, []).append(r)
        for rows in by_left.values():
            cosines = [r.cosine for r in sorted(rows, key=lambda x: x.rank)]
            assert cosines == sorted(cosines, reverse=True)

    def test_lsh_full_probe_matches_exact(self, embeddings_df):
        from documents_vector_search_spark.operators.similarity_join import (
            hard_negative_pairs_exact,
            hard_negative_pairs_lsh,
        )

        small = embeddings_df.filter(F.col("vec_id") < 30)
        exact = {
            (r.left_id, r.rank): r.right_id
            for r in hard_negative_pairs_exact(small, small, k=2).collect()
        }
        # radius = n_planes probes every bucket → identical to exact
        full = {
            (r.left_id, r.rank): r.right_id
            for r in hard_negative_pairs_lsh(
                small, k=2, n_planes=2, multiprobe_bits=2
            ).collect()
        }
        assert full == exact
        # pruned probing still never yields a same-label pair
        pruned = hard_negative_pairs_lsh(
            small, k=2, n_planes=4, multiprobe_bits=0
        ).collect()
        for r in pruned:
            assert r.left_label != r.right_label


class TestTemperatureMix:
    def test_alpha_boosts_small_groups_and_only_downsamples(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            temperature_mix,
        )

        rows = [(i, "big") for i in range(900)] + [
            (1000 + i, "small") for i in range(100)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "grp"])
        kept = temperature_mix(df, "doc_id", "grp", alpha=0.3).collect()
        by = {}
        for r in kept:
            by[r.grp] = by.get(r.grp, 0) + 1
        # never upsample
        assert by.get("small", 0) <= 100 and by.get("big", 0) <= 900
        # alpha<1 boosts the small group's SHARE above its natural 10%
        small_share = by.get("small", 0) / max(sum(by.values()), 1)
        assert small_share > 0.2
        # feasibility: the small group anchors the total, so it is
        # kept (nearly) whole while the big group downsamples hard
        assert by["small"] >= 95
        assert by["big"] < 600

    def test_alpha_one_keeps_natural_distribution(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            temperature_mix,
        )

        rows = [(i, "a") for i in range(300)] + [
            (1000 + i, "b") for i in range(100)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "grp"])
        kept = temperature_mix(df, "doc_id", "grp", alpha=1.0).collect()
        by = {}
        for r in kept:
            by[r.grp] = by.get(r.grp, 0) + 1
        # natural shares -> every group's rate is ~1 (rounding slack)
        assert by["a"] >= 295 and by["b"] >= 99

    def test_rejects_bad_alpha(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            temperature_mix,
        )

        df = spark.createDataFrame([(1, "a")], ["doc_id", "grp"])
        for bad in (0.0, -0.5, 1.5):
            with pytest.raises(ValueError, match="alpha"):
                temperature_mix(df, "doc_id", "grp", alpha=bad)


class TestDedupApplyAndCap:
    def test_dedup_filter_keeps_canonicals(self, dup_docs, spark):
        from documents_vector_search_spark.operators.dedup import dedup_filter

        pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
        kept = {r.doc_id for r in dedup_filter(dup_docs, pairs).collect()}
        assert kept == {1, 4}

    def test_bucket_cap_bounds_pairs(self, spark):
        from documents_vector_search_spark.operators.dedup import minhash_lsh_pairs

        # 30 identical docs = one mega-bucket in every band
        docs = spark.createDataFrame(
            [(i, "same text repeated over and over in every document here")
             for i in range(30)],
            ["doc_id", "text"],
        )
        uncapped = minhash_lsh_pairs(docs, threshold=0.9).count()
        assert uncapped == 30 * 29 / 2
        capped = minhash_lsh_pairs(docs, threshold=0.9, max_bucket_size=5).count()
        assert capped == 0  # mega-bucket dropped entirely

    def test_embedding_bucket_cap_bounds_pairs(self, spark):
        from documents_vector_search_spark.operators.dedup import (
            embedding_neardup_pairs,
        )

        # 40 identical embeddings = one hot bucket (the all-zero /
        # mass-duplicate degenerate case); plus two distinct near-dups
        # that land in a small bucket and must survive the cap
        rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)]
        rows += [(100, [0.0, 1.0, 0.01, 0.0]), (101, [0.0, 1.0, 0.0, 0.01])]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        uncapped = embedding_neardup_pairs(
            emb, threshold=0.9, n_planes=6, dim=4
        ).count()
        assert uncapped == 40 * 39 / 2 + 1
        capped = embedding_neardup_pairs(
            emb, threshold=0.9, n_planes=6, dim=4, max_bucket_size=10
        )
        got = {(r.id_a, r.id_b) for r in capped.collect()}
        assert got == {(100, 101)}  # hot bucket dropped, small bucket kept


class TestConnectedComponents:
    def test_transitive_chain_one_cluster(self, spark):
        from documents_vector_search_spark.operators.cc import (
            connected_components,
        )

        # chain 1-2, 2-3, 3-4 plus isolated pair 10-11: two components
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
        )
        got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_long_chain_converges(self, spark):
        from documents_vector_search_spark.operators.cc import (
            connected_components,
        )

        # diameter-9 path: takes several propagation rounds
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(10, 1, -1)], ["id_a", "id_b"]
        )
        got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
        assert set(got.values()) == {2}

    def test_non_convergence_raises(self, spark):
        from documents_vector_search_spark.operators.cc import (
            connected_components,
        )

        pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 30)],
                                      ["id_a", "id_b"])
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_rounds=2)

    def test_canonicalize_keeps_min_per_cluster(self, spark):
        from documents_vector_search_spark.operators.cc import (
            cluster_canonicalize,
            connected_components,
        )

        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(1, 7)], ["doc_id", "text"]
        )
        pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
        kept = cluster_canonicalize(
            docs, connected_components(pairs)
        ).collect()
        assert {r.doc_id for r in kept} == {1, 4, 5}


class TestNearDupPipeline:
    """operators/dedup_pipeline.py: the LSH pair stage runs once per
    pipeline, no matter how many consumers compose on top of it."""

    def test_stage_memoization_and_materialization(self, dup_docs):
        from documents_vector_search_spark.operators import NearDupPipeline

        pipe = NearDupPipeline(dup_docs, threshold=0.5)
        p1 = pipe.pairs()
        # repeat accessors return the SAME DataFrame object — consumers
        # share one materialized stage, not one lineage
        assert pipe.pairs() is p1
        c1 = pipe.clusters()
        assert pipe.clusters() is c1
        # the pair stage is materialized: downstream plans scan rows,
        # not the shingle/band lineage (localCheckpoint → ExistingRDD)
        plan = p1._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan or "ExistingRDD" in plan

    def test_parity_with_direct_operators(self, dup_docs):
        from documents_vector_search_spark.operators import (
            NearDupPipeline,
            minhash_lsh_pairs,
        )
        from documents_vector_search_spark.operators.cc import (
            cluster_canonicalize,
            connected_components,
        )

        pipe = NearDupPipeline(dup_docs, threshold=0.5)
        direct_pairs = minhash_lsh_pairs(dup_docs, threshold=0.5)
        assert sorted(map(tuple, pipe.pairs().collect())) == sorted(
            map(tuple, direct_pairs.collect())
        )
        direct_clusters = connected_components(direct_pairs)
        assert sorted(map(tuple, pipe.clusters().collect())) == sorted(
            map(tuple, direct_clusters.collect())
        )
        direct_kept = cluster_canonicalize(dup_docs, direct_clusters)
        assert {r.doc_id for r in pipe.canonical_docs().collect()} == {
            r.doc_id for r in direct_kept.collect()
        }

    def test_star_variant_same_clusters(self, dup_docs):
        from documents_vector_search_spark.operators import NearDupPipeline

        a = NearDupPipeline(dup_docs, threshold=0.5)
        b = NearDupPipeline(dup_docs, threshold=0.5, star=True)
        assert sorted(map(tuple, a.clusters().collect())) == sorted(
            map(tuple, b.clusters().collect())
        )

    def test_custom_materializer_called_once(self, dup_docs):
        from documents_vector_search_spark.operators import NearDupPipeline

        calls = []

        def mat(df):
            calls.append(1)
            return df.localCheckpoint()

        pipe = NearDupPipeline(dup_docs, threshold=0.5, materialize=mat)
        pipe.pairs()
        pipe.clusters()
        pipe.canonical_docs()
        assert calls == [1]


class TestConnectedComponentsStar:
    """Large-star/small-star variant: same contract as label
    propagation, O(log^2 n) rounds on long chains."""

    def test_agrees_with_label_propagation_on_random_graph(self, spark):
        import random

        from documents_vector_search_spark.operators.cc import (
            connected_components,
            connected_components_star,
        )

        rng = random.Random(99)
        edges = {
            tuple(sorted(rng.sample(range(60), 2))) for _ in range(70)
        }
        pairs = spark.createDataFrame(sorted(edges), ["id_a", "id_b"])
        lp = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
        star = {
            r.id: r.cluster_id
            for r in connected_components_star(pairs).collect()
        }
        assert star == lp

    def test_long_chain_in_logarithmic_rounds(self, spark):
        from documents_vector_search_spark.operators.cc import (
            connected_components_star,
        )

        # diameter-120 path: label propagation would need ~120 rounds;
        # the star algorithm must finish in ~log^2 — 12 rounds is ample
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(120)], ["id_a", "id_b"]
        )
        got = {
            r.id: r.cluster_id
            for r in connected_components_star(pairs, max_rounds=12).collect()
        }
        assert len(got) == 121 and set(got.values()) == {0}

    def test_duplicate_and_reversed_edges(self, spark):
        from documents_vector_search_spark.operators.cc import (
            connected_components_star,
        )

        pairs = spark.createDataFrame(
            [(2, 1), (1, 2), (2, 3), (3, 2), (7, 7), (9, 8)],
            ["id_a", "id_b"],
        )
        got = {
            r.id: r.cluster_id
            for r in connected_components_star(pairs).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8}


class TestKmvSketch:
    def test_estimate_within_tolerance(self, spark):
        from documents_vector_search_spark.operators.sketches import kmv_distinct

        n_distinct = 5000
        df = spark.range(n_distinct * 2).select(
            (F.col("id") % n_distinct).alias("v")
        )
        row = kmv_distinct(df, F.col("v"), k=256).first()
        assert row.k == 256
        # KMV relative error ~ 1/sqrt(k-1) ≈ 6%; allow 4 sigma
        assert abs(row.est_distinct - n_distinct) / n_distinct < 0.25

    def test_small_input_underfills_k(self, spark):
        from documents_vector_search_spark.operators.sketches import kmv_distinct

        df = spark.range(10).select(F.col("id").alias("v"))
        row = kmv_distinct(df, F.col("v"), k=256).first()
        assert row.k == 10  # fewer distinct values than k

    def test_candidates_bounded_per_batch(self, spark):
        from documents_vector_search_spark.operators.sketches import (
            kmv_candidates,
        )

        hashes = spark.range(10_000).select(F.col("id").alias("h")).coalesce(2)
        n_cand = kmv_candidates(hashes, k=16).count()
        # per Arrow batch ≤ 16 rows out; way below the input size
        assert n_cand < 10_000 and n_cand >= 16


class TestHashSampling:
    def test_split_deterministic_and_disjoint(self, spark):
        from documents_vector_search_spark.operators.sampling import hash_split

        df = spark.range(2000).select(F.col("id").alias("doc_id"))
        a = hash_split(df, "doc_id", seed=3).collect()
        b = hash_split(df, "doc_id", seed=3).collect()
        assert sorted((r.doc_id, r.split) for r in a) == sorted(
            (r.doc_id, r.split) for r in b
        )
        counts = {r.split: 0 for r in a}
        for r in a:
            counts[r.split] += 1
        assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
        assert sum(counts.values()) == 2000  # fractions sum to 1 → no None

    def test_sample_rate_approximate(self, spark):
        from documents_vector_search_spark.operators.sampling import hash_sample

        df = spark.range(20_000).select(F.col("id").alias("doc_id"))
        n = hash_sample(df, "doc_id", rate=0.1, seed=1).count()
        assert 0.07 * 20_000 < n < 0.13 * 20_000

    def test_overcommitted_split_rejected(self, spark):
        from documents_vector_search_spark.operators.sampling import hash_split

        df = spark.range(10).select(F.col("id").alias("doc_id"))
        with pytest.raises(ValueError, match="sum to"):
            hash_split(df, "doc_id", {"a": 0.9, "b": 0.2})

    def test_weighted_sample_tracks_per_row_probability(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            weighted_hash_sample,
        )

        # weight 0 rows never keep, weight 1 rows always keep, weight
        # 0.3 rows keep at ~30%; out-of-range weights clamp
        rows = (
            [(i, 0.0) for i in range(0, 3000)]
            + [(i, 0.3) for i in range(3000, 13000)]
            + [(i, 1.0) for i in range(13000, 16000)]
            + [(16000, -5.0), (16001, 7.0)]
        )
        df = spark.createDataFrame(rows, ["doc_id", "w"])
        kept = weighted_hash_sample(df, "doc_id", "w", seed=4)
        by_w = {
            r.w: r.n
            for r in kept.groupBy("w").agg(F.count("*").alias("n")).collect()
        }
        assert 0.0 not in by_w and by_w.get(-5.0) is None  # clamp → 0
        assert by_w[1.0] == 3000 and by_w[7.0] == 1  # clamp → 1
        assert 0.24 * 10_000 < by_w[0.3] < 0.36 * 10_000
        # deterministic: same seed, same rows
        again = weighted_hash_sample(df, "doc_id", "w", seed=4)
        assert sorted(r.doc_id for r in kept.collect()) == sorted(
            r.doc_id for r in again.collect()
        )

    def test_stratified_rates(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            stratified_hash_sample,
        )

        rows = [(i, "en" if i % 2 == 0 else "de") for i in range(10_000)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        got = stratified_hash_sample(
            df, "doc_id", "lang", {"en": 0.5, "de": 0.05}, seed=2
        )
        by_lang = {
            r.lang: r.n
            for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert 0.4 * 5000 < by_lang["en"] < 0.6 * 5000
        assert 0.02 * 5000 < by_lang["de"] < 0.09 * 5000

    def test_mix_to_target_hits_composition(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            mix_to_target,
        )

        # corpus 80% en / 20% de; target 50/50 → en downsamples to the
        # de population (T = min(8000/.5, 2000/.5) = 4000: ~2000 each),
        # de keeps everything (rate exactly 1.0 → the gate never drops)
        rows = [(i, "en" if i < 8000 else "de") for i in range(10_000)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        kept = mix_to_target(
            df, "doc_id", "lang", {"en": 0.5, "de": 0.5}, seed=6
        )
        by_lang = {
            r.lang: r.n
            for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert by_lang["de"] == 2000  # rate 1.0: deterministic keep-all
        assert 0.2 * 8000 < by_lang["en"] < 0.3 * 8000  # ~rate 0.25

    def test_cap_per_group_matches_plain_window(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            cap_per_group,
        )
        from documents_vector_search_spark.functions.hashing import (
            md5_hash64_py,
        )

        # skewed: domain "big" 500 rows, "small" 3 rows
        rows = [(i, "big") for i in range(500)] + [
            (1000 + i, "small") for i in range(3)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "domain"])
        kept = cap_per_group(df, "domain", 5, "doc_id", seed=9).collect()
        by_dom: dict = {}
        for r in kept:
            by_dom.setdefault(r.domain, []).append(r.doc_id)
        assert len(by_dom["big"]) == 5
        assert sorted(by_dom["small"]) == [1000, 1001, 1002]  # under cap
        # the salted two-phase result must equal the plain total order:
        # the 5 smallest (hash, id) keys of the big domain
        expect = sorted(range(500), key=lambda i: (md5_hash64_py(str(i), salt=9), i))[:5]
        assert sorted(by_dom["big"]) == sorted(expect)

    def test_cap_per_group_order_by_keeps_best(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            cap_per_group,
        )

        rows = [(i, "d", float(i % 100)) for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "domain", "quality"])
        kept = cap_per_group(
            df, "domain", 4, "doc_id", order_by=[F.col("quality").desc()]
        ).collect()
        # top quality 99.0 appears 3× (ids 99,199,299); tie → min id next
        assert sorted((r.quality, r.doc_id) for r in kept) == [
            (98.0, 98), (99.0, 99), (99.0, 199), (99.0, 299)
        ]

    def test_mix_with_precomputed_counts_matches_self_calibrating(
        self, spark
    ):
        """counts= (the one-scan profile path) must select EXACTLY the
        rows the self-calibrating two-scan path selects — the driver-
        side rate arithmetic is the same IEEE double sequence."""
        from documents_vector_search_spark.operators.sampling import (
            mix_to_target,
        )

        rows = [(i, "en" if i % 7 else "de") for i in range(2000)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        w = {"en": 0.7, "de": 0.3}
        auto = mix_to_target(df, "doc_id", "lang", w, seed=6)
        n_de = sum(1 for _, l in rows if l == "de")
        manual = mix_to_target(
            df, "doc_id", "lang", w, seed=6,
            counts={"en": 2000 - n_de, "de": n_de},
        )
        assert sorted(r.doc_id for r in auto.collect()) == sorted(
            r.doc_id for r in manual.collect()
        )
        # and the counts path is genuinely map-only: no join, no agg
        plan = manual._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "Aggregate" not in plan

    def test_mix_zero_weight_drops_group_in_both_paths(self, spark):
        """weight 0 is the natural way to exclude a source — both the
        self-calibrating and the precomputed-counts path must drop the
        group, never divide by zero."""
        from documents_vector_search_spark.operators.sampling import (
            mix_to_target,
        )

        rows = [(i, "en" if i % 2 else "de") for i in range(200)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        w = {"en": 1.0, "de": 0.0}
        auto = mix_to_target(df, "doc_id", "lang", w, seed=6)
        manual = mix_to_target(
            df, "doc_id", "lang", w, seed=6, counts={"en": 100, "de": 100}
        )
        for kept in (auto, manual):
            langs = {r.lang for r in kept.collect()}
            assert langs == {"en"}
        assert auto.count() == manual.count() == 100

    def test_mix_to_target_drops_unlisted_groups(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            mix_to_target,
        )

        rows = [(i, ["en", "de", "zz"][i % 3]) for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        kept = mix_to_target(
            df, "doc_id", "lang", {"en": 0.5, "de": 0.5}, seed=6
        )
        assert kept.filter(F.col("lang") == "zz").count() == 0
        with pytest.raises(ValueError, match="positive sum"):
            mix_to_target(df, "doc_id", "lang", {})


class TestRepeatedSpans:
    """operators/dedup.py::repeated_span_report — exact substring
    (Lee et al. 2022) cross-document boilerplate detection."""

    def test_hand_computed_shared_span(self, spark):
        from documents_vector_search_spark.operators.dedup import (
            repeated_span_report,
        )

        boiler = "this license text is identical across both documents"
        docs = spark.createDataFrame(
            [
                (1, f"alpha beta gamma. {boiler}"),
                (2, f"{boiler} and then totally different words here"),
                (3, "no shared content in this one at all whatsoever"),
                (4, ""),
            ],
            ["doc_id", "text"],
        )
        got = {
            r.doc_id: (r.n_spans, r.dup_spans, r.dup_ratio)
            for r in repeated_span_report(docs, span_tokens=8).collect()
        }
        assert set(got) == {1, 2, 3, 4}
        # the 8-token license span slides through both docs 1 and 2
        assert got[1][1] > 0 and got[2][1] > 0
        assert got[3] == (got[3][0], 0, 0.0)  # unique doc: zero dups
        assert got[4] == (0, 0, 0.0)  # empty doc: zeros, no collision
        # n_spans = len(toks) - k + 1 (doc 1 has 11 tokens, k=8 -> 4)
        assert got[1][0] == 4

    def test_short_docs_one_span_and_min_docs(self, spark):
        from documents_vector_search_spark.operators.dedup import (
            repeated_span_report,
        )

        docs = spark.createDataFrame(
            [(1, "tiny shared text"), (2, "tiny shared text"),
             (3, "tiny shared text"), (4, "other words")],
            ["doc_id", "text"],
        )
        # 3-token docs with k=10: one whole-doc span each; identical
        # across 1-3 so each counts as duplicated
        got = {
            r.doc_id: (r.n_spans, r.dup_spans)
            for r in repeated_span_report(docs, span_tokens=10).collect()
        }
        assert got[1] == (1, 1) and got[2] == (1, 1) and got[3] == (1, 1)
        assert got[4] == (1, 0)
        # min_docs=4: the trio no longer qualifies
        strict = {
            r.doc_id: r.dup_spans
            for r in repeated_span_report(
                docs, span_tokens=10, min_docs=4
            ).collect()
        }
        assert all(v == 0 for v in strict.values())

    def test_materialize_off_same_result(self, spark):
        from documents_vector_search_spark.operators.dedup import (
            repeated_span_report,
        )

        docs = spark.createDataFrame(
            [(i, f"common prefix words here tail {i}") for i in range(6)],
            ["doc_id", "text"],
        )
        a = sorted(
            (r.doc_id, r.n_spans, r.dup_spans, r.dup_ratio)
            for r in repeated_span_report(docs, span_tokens=4).collect()
        )
        b = sorted(
            (r.doc_id, r.n_spans, r.dup_spans, r.dup_ratio)
            for r in repeated_span_report(
                docs, span_tokens=4, materialize=False
            ).collect()
        )
        assert a == b


class TestLinearProbe:
    """operators/classify.py — deterministic linear-probe quality
    classifier (the model-based curation tier)."""

    @staticmethod
    def _separable_df(spark):
        # positives live at +2 on dim 0, negatives at -2: linearly
        # separable, so a working probe must rank them apart
        rows = [
            (i, 1, [2.0 + (i % 7) * 0.05, float(i % 3) * 0.1])
            for i in range(40)
        ] + [
            (100 + i, 0, [-2.0 - (i % 7) * 0.05, float(i % 3) * 0.1])
            for i in range(40)
        ]
        return spark.createDataFrame(rows, ["vec_id", "label", "embedding"])

    def test_fit_is_deterministic_and_layout_independent(self, spark):
        from documents_vector_search_spark.operators.classify import (
            fit_linear_probe,
        )

        df = self._separable_df(spark)
        w1, b1 = fit_linear_probe(df, positive_label=1)
        w2, b2 = fit_linear_probe(df.repartition(7, "vec_id"), 1)
        w3, b3 = fit_linear_probe(df.orderBy(F.desc("vec_id")), 1)
        assert (w1, b1) == (w2, b2) == (w3, b3)

    def test_separable_data_scores_separate(self, spark):
        from documents_vector_search_spark.operators.classify import (
            classifier_scores,
            fit_linear_probe,
        )

        df = self._separable_df(spark)
        w, b = fit_linear_probe(df, positive_label=1)
        got = {
            r.vec_id: (r.score, r.keep)
            for r in classifier_scores(
                df, [round(v, 6) for v in w], round(b, 6)
            ).collect()
        }
        pos = [got[i][0] for i in range(40)]
        neg = [got[100 + i][0] for i in range(40)]
        assert min(pos) > max(neg)  # fully ranked apart
        assert all(got[i][1] for i in range(40))
        assert not any(got[100 + i][1] for i in range(40))

    def test_scores_match_numpy_twin(self, spark):
        import numpy as np

        from documents_vector_search_spark.operators.classify import (
            classifier_scores,
        )

        df = self._separable_df(spark)
        w, b = [0.31, -1.25], 0.125
        got = {
            r.vec_id: r.score for r in classifier_scores(df, w, b).collect()
        }
        for r in df.collect():
            z = float(np.dot(r.embedding, w)) + b
            expected = round(1.0 / (1.0 + np.exp(-z)), 6)
            assert abs(got[r.vec_id] - expected) < 1e-9

    def test_keep_threshold_on_rounded_score(self, spark):
        from documents_vector_search_spark.operators.classify import (
            classifier_scores,
        )

        df = spark.createDataFrame(
            [(1, 0, [0.0, 0.0])], ["vec_id", "label", "embedding"]
        )
        got = classifier_scores(df, [1.0, 1.0], 0.0).first()
        assert got.score == 0.5 and bool(got.keep) is True


class TestTextProbe:
    """operators/classify.py text tier — hashed-n-gram (fastText/DCLM
    style) classifier for corpora without embeddings."""

    POS = [
        "the careful study analyses results with rigorous method",
        "a detailed study of query engines analyses shuffle method",
        "rigorous analyses of the method behind study results",
    ]
    NEG = [
        "click here buy now win big prizes click now",
        "buy cheap now win prizes click here buy cheap",
        "win now click prizes buy here now win cheap",
    ]

    def _df(self, spark):
        rows = [(i, t, 1) for i, t in enumerate(self.POS * 5)] + [
            (100 + i, t, 0) for i, t in enumerate(self.NEG * 5)
        ]
        return spark.createDataFrame(rows, ["doc_id", "text", "label"])

    def test_featurization_matches_expression(self, spark):
        """The driver-side Python featurizer and the scoring
        expression's gram/bucket pipeline agree per occurrence —
        including short-doc and empty-doc conventions."""
        from documents_vector_search_spark.functions.hashing import (
            md5_hash64,
        )
        from documents_vector_search_spark.operators.classify import (
            _gram_array,
            text_gram_buckets_py,
        )

        texts = ["The quick, brown FOX!", "", "one", "a b", " ,, ",
                 "x1 y2 z3 x1 y2"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        expr = F.transform(
            _gram_array(F.col("text"), 2),
            lambda g: F.pmod(md5_hash64(g), F.lit(256)).cast("int"),
        )
        got = {r.doc_id: r.b for r in df.select("doc_id", expr.alias("b")).collect()}
        for i, t in enumerate(texts):
            assert got[i] == text_gram_buckets_py(t, 256, 2), t

    def test_fit_is_deterministic_and_layout_independent(self, spark):
        from documents_vector_search_spark.operators.classify import (
            fit_text_probe,
        )

        df = self._df(spark)
        w1, b1 = fit_text_probe(df, positive_label=1)
        w2, b2 = fit_text_probe(df.repartition(7, "doc_id"), 1)
        w3, b3 = fit_text_probe(df.orderBy(F.desc("doc_id")), 1)
        assert (w1, b1) == (w2, b2) == (w3, b3)

    def test_separable_text_scores_separate(self, spark):
        from documents_vector_search_spark.operators.classify import (
            fit_text_probe,
            text_classifier_scores,
        )

        df = self._df(spark)
        w, b = fit_text_probe(df, positive_label=1)
        got = {
            r.doc_id: (r.score, r.keep)
            for r in text_classifier_scores(
                df, [round(v, 6) for v in w], round(b, 6)
            ).collect()
        }
        pos = [got[i][0] for i in range(15)]
        neg = [got[100 + i][0] for i in range(15)]
        assert min(pos) > max(neg)
        assert all(got[i][1] for i in range(15))
        assert not any(got[100 + i][1] for i in range(15))

    def test_empty_doc_scores_sigmoid_bias(self, spark):
        import numpy as np

        from documents_vector_search_spark.operators.classify import (
            text_classifier_scores,
        )

        df = spark.createDataFrame(
            [(1, ""), (2, " ,,;; ")], ["doc_id", "text"]
        )
        w = [5.0] * 256  # any gram contribution would be visible
        got = text_classifier_scores(df, w, -1.0).collect()
        expected = round(1.0 / (1.0 + np.exp(1.0)), 6)
        for r in got:
            assert r.score == expected and bool(r.keep) is False

    def test_scoring_plan_is_python_free(self, spark):
        from documents_vector_search_spark.operators.classify import (
            text_classifier_scores,
        )

        df = self._df(spark)
        plan = (
            text_classifier_scores(df, [0.1] * 256, 0.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan  # map-only


class TestFastTextProbe:
    """xxhash64 token-hash probe (classify.py fast family): the
    production-throughput featurization whose fit and score share one
    Spark expression (no Python twin to drift)."""

    POS = ["great clear helpful document text", "clear helpful answer",
           "helpful well written document"]
    NEG = ["buy now click spam spam", "click click spam buy",
           "spam buy now now now"]

    def _df(self, spark):
        rows = [(i, t, 1) for i, t in enumerate(self.POS * 5)] + [
            (100 + i, t, 0) for i, t in enumerate(self.NEG * 5)
        ]
        return spark.createDataFrame(rows, ["doc_id", "text", "label"])

    def test_bucket_array_shape_and_range(self, spark):
        from documents_vector_search_spark.operators.classify import (
            fast_bucket_array,
        )

        texts = ["a b c", "one", "", " ,, ", "x1 y2 z3"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = {
            r.doc_id: r.b
            for r in df.select(
                "doc_id", fast_bucket_array(F.col("text"), 256, 2).alias("b")
            ).collect()
        }
        # n tokens -> n unigrams + (n-1) bigrams; no short-doc padding
        assert len(got[0]) == 3 + 2
        assert len(got[1]) == 1 + 0
        assert got[2] == [] and got[3] == []
        assert len(got[4]) == 3 + 2
        assert all(0 <= b < 256 for bs in got.values() for b in bs)

    def test_fit_deterministic_and_layout_independent(self, spark):
        from documents_vector_search_spark.operators.classify import (
            fit_text_probe_fast,
        )

        df = self._df(spark)
        w1, b1 = fit_text_probe_fast(df, positive_label=1)
        w2, b2 = fit_text_probe_fast(df.repartition(7, "doc_id"), 1)
        w3, b3 = fit_text_probe_fast(df.orderBy(F.desc("doc_id")), 1)
        assert (w1, b1) == (w2, b2) == (w3, b3)

    def test_separable_text_scores_separate(self, spark):
        from documents_vector_search_spark.operators.classify import (
            fit_text_probe_fast,
            text_classifier_scores_fast,
        )

        df = self._df(spark)
        w, b = fit_text_probe_fast(df, positive_label=1)
        got = {
            r.doc_id: (r.score, r.keep)
            for r in text_classifier_scores_fast(
                df, [round(v, 6) for v in w], round(b, 6)
            ).collect()
        }
        pos = [got[i][0] for i in range(15)]
        neg = [got[100 + i][0] for i in range(15)]
        assert min(pos) > max(neg)
        assert all(got[i][1] for i in range(15))
        assert not any(got[100 + i][1] for i in range(15))

    def test_empty_doc_scores_sigmoid_bias(self, spark):
        import numpy as np

        from documents_vector_search_spark.operators.classify import (
            text_classifier_scores_fast,
        )

        df = spark.createDataFrame(
            [(1, ""), (2, " ,,;; ")], ["doc_id", "text"]
        )
        got = text_classifier_scores_fast(df, [5.0] * 256, -1.0).collect()
        expected = round(1.0 / (1.0 + np.exp(1.0)), 6)
        for r in got:
            assert r.score == expected and bool(r.keep) is False

    def test_scoring_plan_is_python_free_and_map_only(self, spark):
        from documents_vector_search_spark.operators.classify import (
            text_classifier_scores_fast,
        )

        df = self._df(spark)
        plan = (
            text_classifier_scores_fast(df, [0.1] * 256, 0.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan


class TestClusterSafeSplit:
    """operators/sampling.py::cluster_safe_split — near-dup clusters
    assigned to train/val/test atomically (no leakage across splits)."""

    def test_cluster_members_share_a_split(self, spark):
        from documents_vector_search_spark.operators.sampling import (
            cluster_safe_split,
        )

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(1, 21)], ["doc_id", "text"]
        )
        # two clusters: {1,2,3} (transitively) and {10, 11}
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
        )
        out = cluster_safe_split(
            docs, "doc_id", pairs,
            splits={"train": 0.5, "val": 0.25, "test": 0.25},
        ).collect()
        by_id = {r.doc_id: r for r in out}
        # every row labeled, cluster members share unit AND split
        assert len(by_id) == 20
        assert all(r.split in ("train", "val", "test") for r in out)
        for cluster in [(1, 2, 3), (10, 11)]:
            units = {by_id[i].split_unit for i in cluster}
            labels = {by_id[i].split for i in cluster}
            assert len(units) == 1 and len(labels) == 1, cluster
            assert units == {min(cluster)}
        # singletons hash on their own id — same label a plain
        # hash_split of the unit column would give
        from documents_vector_search_spark.operators.sampling import (
            hash_split,
        )

        singles = [i for i in range(1, 21) if i not in (1, 2, 3, 10, 11)]
        plain = {
            r.doc_id: r.split
            for r in hash_split(
                docs, "doc_id",
                {"train": 0.5, "val": 0.25, "test": 0.25},
            ).collect()
        }
        for i in singles:
            assert by_id[i].split == plain[i]
