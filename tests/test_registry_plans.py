"""Global plan contracts over EVERY registry query.

The hand-picked plan assertions (test_plan_contracts.py) pin specific
strategies for specific operators; this sweep guards the whole surface
against the two silent scale-killers that can sneak into any refactor:

- an accidental CartesianProduct (an equi-join that lost its keys), and
- a row-at-a-time Python UDF on the data path (BatchEvalPython —
  ~10-100x slower than the Arrow-batched forms; ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas remain allowed).

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

# cross-with-tiny-side shapes that plan as BroadcastNestedLoopJoin on
# purpose (a broadcast of k rows or one scalar row, not a blowup):
# checked separately so a REAL nested-loop regression elsewhere fails.
_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_no_cartesian_and_no_row_udf(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in BOUNDED_CROSS:
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian"
    assert "BatchEvalPython" not in plan, (
        f"{name} plans a row-at-a-time Python UDF"
    )
