"""Driver-contract smoke: entry() runs; queries()/oracle_sql() aligned."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_ranked_documents(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert {"doc_id", "rrf_score"} <= set(df.columns)


# Expected head of entry()'s fused+presented ranking at sf0.001,
# committed verbatim: (doc_id, rrf_score rounded to 6, lang, source,
# n_chars). The fusion itself is oracle-checked (rrf_hybrid key); this
# pins the PRESENTATION join — column wiring, join key, final ordering
# — which the driver smoke only row-counts.
ENTRY_GOLDEN_TOP5 = [
    (255, 0.027047, "en", "src15", 259),
    (481, 0.024925, "en", "src1", 509),
    (269, 0.024819, "en", "src9", 339),
    (259, 0.024184, "es", "src19", 493),
    (156, 0.020495, "en", "src16", 426),
]


def test_entry_golden_top_rows(spark):
    rows = entrymod.entry(spark).collect()
    assert len(rows) == 20
    got = [
        (r.doc_id, round(r.rrf_score, 6), r.lang, r.source, r.n_chars)
        for r in rows[:5]
    ]
    assert got == ENTRY_GOLDEN_TOP5


# operators whose semantics SQL cannot express — the driver records
# rows-only checks. Empty since round 5: ivf_ann left in round 2 (its
# KMeans fit persists centroids the oracle reads back), and
# recursive_chunk left in round 5 (a dual-implementation twin persists
# the expected chunks the oracle reads back).
NON_SQL_OPS: set[str] = set()


def test_every_query_has_oracle():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(qs) - set(oracles) == NON_SQL_OPS
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


def test_queries_execute_at_smoke_scale(spark, sf_dir):
    # one representative per operator family (full parity is dev/compare.py)
    qs = entrymod.queries()
    for name in ["bm25_topk", "knn_l2", "rrf_hybrid", "dedup_minhash", "sessionize"]:
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0


def test_every_oracle_binds_cold(sf_dir):
    """Every oracle_sql() entry must PREPARE in DuckDB in a fresh
    environment, before any Spark query has run. Guards against oracles
    that depend on run-time side artifacts from uncommitted paths —
    ivf_ann/pq_adc read fitted centroids from a parquet that was
    gitignored until round 4, which silently cost their driver
    CORRECTNESS rows for two rounds."""
    import duckdb

    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.sql("EXPLAIN " + sql)
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            failures[name] = str(exc)[:200]
    assert not failures, failures
