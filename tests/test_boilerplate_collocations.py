"""boilerplate_strip (operators/curation.py) and pmi_collocations
(operators/text_analysis.py): semantic pins beyond the oracle hash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.operators.curation import boilerplate_strip
from documents_vector_search_spark.operators.text_analysis import (
    pmi_collocations,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestBoilerplateStrip:
    def test_ubiquitous_footer_stripped_everywhere(self, spark):
        """A footer in 100% of docs goes; unique body lines stay."""
        rows = [(i, f"body line {i}\nfooter v1") for i in range(10)]
        out = {r["doc_id"]: r for r in
               boilerplate_strip(_docs(spark, rows)).collect()}
        for i in range(10):
            assert out[i]["text"] == f"body line {i}"
            assert out[i]["n_lines_removed"] == 1
            assert out[i]["n_lines_kept"] == 1

    def test_threshold_is_exact_integer_percent(self, spark):
        """At max_doc_pct=50 over 10 docs: a line in exactly 5 docs
        (df·100 == pct·N) IS boilerplate; one in 4 is not."""
        rows = [(i, f"at five\nbody {i}") for i in range(5)]
        rows += [(5 + i, f"at four\nbody {5 + i}") for i in range(4)]
        rows.append((9, "solo"))
        out = boilerplate_strip(_docs(spark, rows), max_doc_pct=50)
        kept = {r["doc_id"]: r["text"] for r in out.collect()}
        assert kept[0] == "body 0"            # "at five" stripped (boundary)
        assert kept[5] == "at four\nbody 5"   # below threshold kept
        assert kept[9] == "solo"

    def test_min_df_floor(self, spark):
        """Tiny corpora: a 1-of-2 line is 50% but df < min_df=2 — kept."""
        rows = [(1, "common\na"), (2, "common\nb"), (3, "unique\nc")]
        out = {r["doc_id"]: r["text"] for r in
               boilerplate_strip(_docs(spark, rows), max_doc_pct=30).collect()}
        assert out[1] == "a" and out[2] == "b"       # df=2 ≥ floor, 66% > 30%
        assert out[3] == "unique\nc"                 # df=1 < min_df

    def test_all_boilerplate_doc_survives_empty(self, spark):
        rows = [(i, "footer") for i in range(10)]
        out = boilerplate_strip(_docs(spark, rows)).collect()
        assert all(r["text"] == "" and r["n_lines_kept"] == 0 for r in out)
        assert len(out) == 10

    def test_short_lines_exempt(self, spark):
        """Blank lines in every doc are structure — never stripped."""
        rows = [(i, f"a{i}\n\nb{i}") for i in range(10)]
        out = boilerplate_strip(_docs(spark, rows)).collect()
        assert all(r["text"] == f"a{r['doc_id']}\n\nb{r['doc_id']}"
                   for r in out)


class TestPmiCollocations:
    def test_exclusive_pair_ranks_first(self, spark):
        """'san francisco' appears only together; filler words pair
        with everything — the exclusive pair must out-PMI them."""
        rows = [(i, "san francisco is the city and the fog and the bay")
                for i in range(5)]
        rows += [(100 + i, "the city is big and the fog is cold and wide")
                 for i in range(5)]
        out = pmi_collocations(_docs(spark, rows), min_count=5).collect()
        assert (out[0]["w1"], out[0]["w2"]) == ("san", "francisco")
        assert out[0]["rank"] == 1

    def test_min_count_filters(self, spark):
        rows = [(1, "rare pair"), (2, "aa bb"), (3, "aa bb"),
                (4, "aa bb"), (5, "aa bb"), (6, "aa bb")]
        out = pmi_collocations(_docs(spark, rows), min_count=5).collect()
        pairs = {(r["w1"], r["w2"]) for r in out}
        assert ("aa", "bb") in pairs and ("rare", "pair") not in pairs

    def test_pmi_value_closed_form(self, spark):
        """One doc 'x y' repeated 5 times: every count collapses —
        p(ab)=1, p(a)=p(b)=1/2 → PMI = log2(4) = 2 bits."""
        rows = [(i, "x y") for i in range(5)]
        out = pmi_collocations(_docs(spark, rows), min_count=5).collect()
        assert len(out) == 1
        assert out[0]["pmi"] == pytest.approx(2.0)
        assert out[0]["n"] == 5

    def test_no_python_no_cartesian_plan(self, spark):
        rows = [(i, "alpha beta gamma delta") for i in range(20)]
        plan = pmi_collocations(_docs(spark, rows), min_count=2) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
