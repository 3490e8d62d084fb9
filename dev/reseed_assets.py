#!/usr/bin/env python3
"""Regenerate the COMMITTED sf0.01 asset seeds in-place.

The committed `documents_vector_search_spark/assets/` dir is a
cold-start seed only — normal runs copy it to `.cache/assets_run` and
write there (registry._init_assets_run_dir), so `git status` stays
clean. This script is the ONE sanctioned writer of the committed dir:
it points DVSS_ASSETS_DIR at the committed path and executes the six
asset-fitting queries at sf0.01, refreshing the seeds deterministically
(operators/kmeans.py fits are canonical-order + seeded, so reruns are
content-identical).

Usage: python dev/reseed_assets.py [sf_dir]   (default /root/testdata/sf0.01)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# must land before the registry import — _ASSETS_DIR is bound at import
os.environ["DVSS_ASSETS_DIR"] = os.path.join(
    REPO, "documents_vector_search_spark", "assets"
)

ASSET_QUERIES = [
    "ivf_ann",
    "pq_adc",
    "ivfpq_search",
    "semdedup",
    "recursive_chunk",
    "quality_classifier",
    "quality_classifier_text",
    "topic_model",
    "topic_terms",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from documents_vector_search_spark import registry
    from documents_vector_search_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for key in ASSET_QUERIES:
        qs[key](spark, sf_dir).count()  # executes the fit + asset write
        print(f"reseeded via {key}")
    print(f"done: seeds in {os.environ['DVSS_ASSETS_DIR']} (sf_dir={sf_dir})")


if __name__ == "__main__":
    main()
