"""Filter mini-language: parser AST shape + Column compilation semantics.

Covers the reference behaviors cited in SURVEY §2.2 P6 / §7.4: equal
precedence, left associativity, same-op flattening, quoted-string
values, and the typed-comparison compiler.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documents_vector_search_spark.plans.filter_compiler import (
    compile_filter,
    filter_to_sql,
)
from documents_vector_search_spark.plans.filter_language import (
    FilterCondition,
    FilterGroup,
    FilterParseError,
    parse_filter,
)


class TestParser:
    def test_single_condition(self):
        node = parse_filter('status = "Open"')
        assert node == FilterCondition("status", "=", "Open")

    @pytest.mark.parametrize("op", ["=", "!=", ">", ">=", "<", "<="])
    def test_all_operators(self, op):
        node = parse_filter(f'f {op} "v"')
        assert node == FilterCondition("f", op, "v")

    def test_same_op_chain_flattens(self):
        node = parse_filter('a = "1" and b = "2" and c = "3"')
        assert isinstance(node, FilterGroup)
        assert node.op == "and"
        assert len(node.children) == 3

    def test_mixed_ops_left_associative(self):
        # a or b and c  ==  (a or b) and c   (NOT SQL precedence)
        node = parse_filter('a = "1" or b = "2" and c = "3"')
        assert node.op == "and"
        assert isinstance(node.children[0], FilterGroup)
        assert node.children[0].op == "or"
        assert node.children[1] == FilterCondition("c", "=", "3")

    def test_parentheses_override(self):
        node = parse_filter('a = "1" or (b = "2" and c = "3")')
        assert node.op == "or"
        assert node.children[1].op == "and"

    def test_escaped_quote_in_value(self):
        node = parse_filter('a = "say \\"hi\\""')
        assert node.value == 'say "hi"'

    @pytest.mark.parametrize(
        "bad",
        ["", "a =", 'a = unquoted', '(a = "1"', 'a ~ "1"', 'a = "1" extra'],
    )
    def test_parse_errors(self, bad):
        with pytest.raises(FilterParseError):
            parse_filter(bad)


class TestCompiler:
    def test_string_and_typed_compare(self, spark):
        df = spark.createDataFrame(
            [("en", 100), ("en", 400), ("fr", 100)], ["lang", "n"]
        )
        pred = compile_filter(
            'lang = "en" and n >= "200"', field_types={"n": "bigint"}
        )
        assert df.filter(pred).count() == 1

    def test_left_assoc_evaluation(self, spark):
        df = spark.createDataFrame(
            [(1, 1, 1), (1, 0, 0), (0, 1, 1), (0, 0, 1)], ["a", "b", "c"]
        )
        # (a=1 or b=1) and c=1 → rows 1, 3 (0-indexed: first and third)
        pred = compile_filter(
            'a = "1" or b = "1" and c = "1"',
            field_types={"a": "int", "b": "int", "c": "int"},
        )
        assert df.filter(pred).count() == 2

    def test_missing_map_key_is_false(self, spark):
        df = spark.createDataFrame(
            [(1, {"folder1": "x"}), (2, {"folder1": "x", "folder2": "y"})],
            ["id", "metadata"],
        )
        pred = compile_filter(
            'folder2 = "y"', metadata_map_col="metadata", direct_fields=set()
        )
        assert [r.id for r in df.filter(pred).collect()] == [2]

    def test_timestamp_compare(self, spark):
        df = spark.createDataFrame(
            [("2024-01-01 00:00:00",), ("2024-06-01 00:00:00",)], ["ts_str"]
        ).select(F.col("ts_str").cast("timestamp").alias("ts"))
        pred = compile_filter(
            'ts > "2024-03-01 00:00:00"', field_types={"ts": "timestamp"}
        )
        assert df.filter(pred).count() == 1

    def test_sql_rendering_parenthesizes(self):
        sql = filter_to_sql('a = "1" or b = "2" and c = "3"')
        assert sql == "(((a = '1') OR (b = '2')) AND (c = '3'))"

    def test_sql_escapes_quotes(self):
        sql = filter_to_sql("a = \"o'brien\"")
        assert "o''brien" in sql
