"""Global plan contracts over EVERY registry query.

The hand-picked plan assertions (test_plan_contracts.py) pin specific
strategies for specific operators; this sweep guards the whole surface
against the three silent scale-killers that can sneak into any
refactor:

- an accidental CartesianProduct (an equi-join that lost its keys),
- a row-at-a-time Python UDF on the data path (BatchEvalPython —
  ~10-100x slower than the Arrow-batched forms; ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas remain allowed), and
- an UNPARTITIONED WindowExec beyond the audited whitelist (a global
  window moves the whole input to one task; every allowed site below
  runs over a provably bounded frame — a top-k hit list, an O(days) /
  O(langs) aggregate, or a documented exact-parity opt-in path —
  and the r11 grep audit of all 123 runtime warnings is hereby a
  TEST, not a convention).

Plans are BUILT, not executed (physical planning only), so the sweep
stays cheap even over all registry keys.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# documented bounded-input cross products (the operator's contract says
# "small inputs only" and the docstring explains why)
BOUNDED_CROSS = {
    "dedup_ngram",  # exact pairwise Jaccard, documented bounded-only
}

# Audited unpartitioned-window sites: registry key -> max WindowExec
# nodes with an EMPTY partitionSpec allowed in its built plan. Every
# entry names why the frame is bounded; a NEW unpartitioned window
# anywhere (new key, or an extra node on a listed key) FAILS the sweep
# until it is audited and listed here with its justification.
BOUNDED_GLOBAL_WINDOWS = {
    # contiguous chunk-id parity path: row_number over the per-doc
    # chunk list of ONE document set, documented exact-parity opt-in
    # (operators/chunking.py; the scale default is hash ids)
    "chunk_split": 1,
    # rank over the top_k PMI survivors of a TakeOrderedAndProject —
    # O(top_k) rows by construction (text_analysis.py collocations)
    "collocations": 1,
    # dense_rank over a <=k-row hit list (operators/group_hits.py)
    "group_hits": 1,
    # exact-RFM's documented parity path: three ntile windows over the
    # O(users) aggregate with the approx hatch for scale
    # (operators/paths.py:103-105)
    "rfm_segments": 3,
    # two <=k-row per-leg rank lists before the fusion join
    # (operators/rrf.py)
    "rrf_hybrid": 2,
    # cumulative hazard + rank over the O(days) life-table aggregate
    # (operators/retention.py survival_curve)
    "survival_curve": 2,
    # rank over the O(top_terms x k) topic-term aggregate
    # (operators/topics.py)
    "topic_model": 1,
    # water-fill prefix scan over the O(langs) budget frame
    # (operators/sampling.py unimax_allocation)
    "unimax_mix": 2,
}

_QUERIES = entrymod.queries()


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))
    try:
        subs = node.subqueries()
        for i in range(subs.size()):
            yield from _walk(subs.apply(i))
    except Exception:
        pass


def count_unpartitioned_windows(df) -> int:
    """WindowExec / WindowInPandasExec nodes with an empty
    partitionSpec in the pre-AQE physical plan (subqueries included).
    WindowGroupLimitExec is excluded on purpose: it is the pushed-down
    top-k LIMIT — bounded output by definition."""
    plan = df._jdf.queryExecution().sparkPlan()
    return sum(
        1
        for n in _walk(plan)
        if n.getClass().getSimpleName()
        in ("WindowExec", "WindowInPandasExec")
        and n.partitionSpec().isEmpty()
    )


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_no_cartesian_no_row_udf_no_new_global_window(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in BOUNDED_CROSS:
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian"
    assert "BatchEvalPython" not in plan, (
        f"{name} plans a row-at-a-time Python UDF"
    )
    n_global = count_unpartitioned_windows(df)
    allowed = BOUNDED_GLOBAL_WINDOWS.get(name, 0)
    assert n_global <= allowed, (
        f"{name} plans {n_global} unpartitioned window(s), whitelist"
        f" allows {allowed} — a global Window moves ALL rows to one"
        " task; audit the frame's bound and list it in"
        " BOUNDED_GLOBAL_WINDOWS, or partition/two-phase the window"
    )


def test_detector_catches_a_planted_global_window(spark):
    """The canary: the detector must flag a deliberately unpartitioned
    window (and stay quiet on the partitioned twin)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(10)
    planted = df.withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    )
    assert count_unpartitioned_windows(planted) == 1
    keyed = df.withColumn(
        "r",
        F.row_number().over(Window.partitionBy(df.id % 2).orderBy("id")),
    )
    assert count_unpartitioned_windows(keyed) == 0
