"""Robustness of the embedding queries across element-type shifts in
the driver's `embeddings.parquet` (the round-3 lesson, generalized: a
testdata type change must degrade to identical results, not
AnalysisException). Every vector consumer casts to array<double>
in-plan, so float32 / float64 encodings of the same values must produce
identical rounded distances."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERY = [0.5, -1.25, 2.0, 0.0]
VECS = [
    (1, [0.5, -1.25, 2.0, 0.0]),
    (2, [1.5, 0.75, -2.0, 4.0]),
    (3, [0.0, 0.0, 0.0, 1.0]),
]


@pytest.fixture(scope="module")
def typed_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("emb_types")
    for name, typ in (("f32", pa.float32()), ("f64", pa.float64())):
        d = root / name
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([v[0] for v in VECS], pa.int64()),
                    "embedding": pa.array(
                        [v[1] for v in VECS], pa.list_(typ)
                    ),
                    "label": pa.array([1, 2, 3], pa.int32()),
                }
            ),
            str(d / "embeddings.parquet"),
        )
    return root


def test_knn_and_sq8_agree_across_element_types(spark, typed_dirs):
    """The chosen fixture values are exactly representable in float32,
    so both encodings must yield bit-identical distances through the
    in-plan array<double> cast."""
    from documents_vector_search_spark.operators.knn import knn_l2
    from documents_vector_search_spark.operators.sq import sq_search_l2

    results = {}
    for name in ("f32", "f64"):
        emb = spark.read.parquet(f"{typed_dirs}/{name}/embeddings.parquet")
        knn = knn_l2(emb, QUERY, 3).collect()
        sq = sq_search_l2(emb, QUERY, 3, shortlist=10).collect()
        results[name] = (
            [(r.vec_id, r.distance) for r in knn],
            [(r.vec_id, r.distance) for r in sq],
        )
    assert results["f32"] == results["f64"]
    assert results["f32"][0][0][0] == 1  # exact match ranks first
