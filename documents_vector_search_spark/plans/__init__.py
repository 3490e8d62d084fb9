"""Query-plan-level pieces: the metadata filter mini-language.

The reference's only intermediate representation is a filter AST
(reference main/indexes/filters/filter_parser.py:7-19) compiled twice —
once to a Chroma ``where`` dict, once to a SQLite WHERE clause. Here one
compiler targets ``pyspark.sql.Column``; Catalyst then pushes the
predicate into the Parquet scan for every index representation, which
subsumes both backend compilers (SURVEY §2.2 P6-P8).
"""

from documents_vector_search_spark.plans.filter_language import (
    FilterCondition,
    FilterGroup,
    FilterNode,
    parse_filter,
)
from documents_vector_search_spark.plans.filter_compiler import (
    compile_filter,
    filter_to_sql,
)

__all__ = [
    "FilterCondition",
    "FilterGroup",
    "FilterNode",
    "parse_filter",
    "compile_filter",
    "filter_to_sql",
]
