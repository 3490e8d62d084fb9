"""One-off experiment: window-cap vs two-pass hot-bucket cap for
minhash_lsh_pairs. Run: python dev/minhash_cap_experiment.py [sf_dir]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from documents_vector_search_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
)
from documents_vector_search_spark.registry import MINHASH_MAX_BUCKET  # noqa: E402
from documents_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="minhash-cap-exp")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run(tag, **kw):
        for i in range(3):
            t0 = time.time()
            n = minhash_lsh_pairs(
                docs, threshold=0.8, num_hashes=8, bands=4, **kw
            ).count()
            print(f"{tag} run{i}: {time.time() - t0:.2f}s pairs={n}")

    run("window-cap", max_bucket_size=MINHASH_MAX_BUCKET)
    run("uncapped  ")

    # two-pass variant: hot buckets from a map-side count agg, then a
    # broadcast anti-join — no WindowExec sort over the banded rows,
    # at the cost of computing the signatures twice
    from documents_vector_search_spark.functions.hashing import (
        minhash_ab_array,
        minhash_from_ab,
    )
    from documents_vector_search_spark.operators.shingles import shingle_array

    def two_pass():
        num_hashes, bands, threshold = 8, 4, 0.8
        r = num_hashes // bands
        shing = shingle_array(docs, 3, "doc_id", "text", distinct=True)
        ab = shing.select(
            "id", "shingles", minhash_ab_array(F.col("shingles")).alias("_ab")
        )
        fam = lambda i: (lambda e: minhash_from_ab(e, i))  # noqa: E731
        sig = ab.select(
            "id", "shingles",
            *[
                F.array_min(F.transform("_ab", fam(i))).alias(f"m{i}")
                for i in range(num_hashes)
            ],
        )
        band_vals = F.array(
            *[
                F.concat_ws("_", *[F.col(f"m{b * r + j}") for j in range(r)])
                for b in range(bands)
            ]
        )
        banded = sig.select(
            "id", "shingles",
            F.posexplode(band_vals).alias("band_index", "band_value"),
        )
        hot = (
            banded.groupBy("band_index", "band_value")
            .count()
            .filter(F.col("count") > MINHASH_MAX_BUCKET)
            .select("band_index", "band_value")
        )
        capped = banded.join(
            F.broadcast(hot), ["band_index", "band_value"], "left_anti"
        )
        buckets = capped.groupBy("band_index", "band_value").agg(
            F.collect_list(F.struct("id", "shingles")).alias("_members")
        )
        pairs = (
            buckets.select(F.explode("_members").alias("a"), F.col("_members"))
            .select("a", F.explode("_members").alias("b"))
            .filter(F.col("a.id") < F.col("b.id"))
        )
        inter = F.size(
            F.array_intersect("a.shingles", "b.shingles")
        ).cast("bigint")
        n_a = F.size("a.shingles").cast("bigint")
        n_b = F.size("b.shingles").cast("bigint")
        union = n_a + n_b - inter
        jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
        scored = pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jac.alias("jaccard"),
        ).filter(F.col("jaccard") >= threshold)
        return scored.groupBy("id_a", "id_b").agg(
            F.first("jaccard").alias("jaccard")
        )

    for i in range(3):
        t0 = time.time()
        n = two_pass().count()
        print(f"two-pass   run{i}: {time.time() - t0:.2f}s pairs={n}")
    spark.stop()


if __name__ == "__main__":
    main()
