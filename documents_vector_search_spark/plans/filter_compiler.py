"""Compile a filter AST to a ``pyspark.sql.Column`` (and to ANSI SQL).

One compiler replaces the reference's two backend-specific ones
(Chroma ``where`` dicts, main/indexes/indexers/chroma_indexer.py:103-135;
SQLite json_extract WHERE, main/indexes/indexers/sqllite_indexer.py:131-143).
Catalyst pushes the resulting predicate into the Parquet scan, so every
index representation gets filtered search "for free" — the capability
the reference's FAISS backend lacks entirely
(main/indexes/indexers/faiss_indexer.py:33-34).

Typing rules (fixes the reference's divergent date semantics, SURVEY
§1.2/§7.4): the caller supplies the column's Spark type (or a resolver);
values are cast from the always-quoted string to that type, so
``n_chars > "100"`` compares numerically and timestamp fields compare as
typed timestamps. Fields resolved inside a ``MAP<STRING,STRING>``
metadata column compare as strings unless a type is declared; a missing
map key yields NULL, which makes the predicate false (documented delta
from the reference's "None"-stringification).
"""

from __future__ import annotations

from functools import reduce
from typing import Callable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from documents_vector_search_spark.plans.filter_language import (
    FilterCondition,
    FilterGroup,
    FilterNode,
    parse_filter,
)

# field name -> (column expression, cast type or None)
FieldResolver = Callable[[str], tuple[Column, str | None]]


def _column_resolver(
    field_types: Mapping[str, str] | None = None,
    metadata_map_col: str | None = None,
    direct_fields: set[str] | None = None,
) -> FieldResolver:
    types = dict(field_types or {})

    def resolve(field: str) -> tuple[Column, str | None]:
        if direct_fields is None or field in direct_fields:
            col = F.col(field)
        elif metadata_map_col is not None:
            col = F.element_at(F.col(metadata_map_col), field)
        else:
            col = F.col(field)
        return col, types.get(field)

    return resolve


def compile_condition(cond: FilterCondition, resolver: FieldResolver) -> Column:
    col, cast_type = resolver(cond.field)
    value: Column = F.lit(cond.value)
    if cast_type is not None:
        col = col.cast(cast_type)
        value = value.cast(cast_type)
    ops: dict[str, Callable[[Column, Column], Column]] = {
        "=": lambda c, v: c == v,
        "!=": lambda c, v: c != v,
        ">": lambda c, v: c > v,
        ">=": lambda c, v: c >= v,
        "<": lambda c, v: c < v,
        "<=": lambda c, v: c <= v,
    }
    return ops[cond.op](col, value)


def compile_filter(
    node: FilterNode | str,
    field_types: Mapping[str, str] | None = None,
    metadata_map_col: str | None = None,
    direct_fields: set[str] | None = None,
) -> Column:
    """AST (or raw filter string) → boolean Column.

    ``field_types`` maps field name → Spark cast type ("bigint",
    "double", "timestamp", ...); untyped fields compare as strings,
    matching the reference's string-everywhere model (SURVEY §1.2).
    """
    if isinstance(node, str):
        node = parse_filter(node)
    resolver = _column_resolver(field_types, metadata_map_col, direct_fields)

    def walk(n: FilterNode) -> Column:
        if isinstance(n, FilterCondition):
            return compile_condition(n, resolver)
        children = [walk(c) for c in n.children]
        if n.op == "and":
            return reduce(lambda a, b: a & b, children)
        return reduce(lambda a, b: a | b, children)

    return walk(node)


def filter_to_sql(
    node: FilterNode | str,
    field_types: Mapping[str, str] | None = None,
) -> str:
    """AST → ANSI SQL predicate string (explicitly parenthesized, so the
    mini-language's flat left-associative and/or precedence survives SQL's
    AND-binds-tighter rule). Used to build DuckDB oracles and for pushing
    predicates to external SQL sources."""
    if isinstance(node, str):
        node = parse_filter(node)
    types = dict(field_types or {})

    def walk(n: FilterNode) -> str:
        if isinstance(n, FilterCondition):
            escaped = n.value.replace("'", "''")
            cast_type = types.get(n.field)
            lhs, rhs = n.field, f"'{escaped}'"
            if cast_type is not None:
                lhs = f"CAST({n.field} AS {cast_type})"
                rhs = f"CAST({rhs} AS {cast_type})"
            op = "<>" if n.op == "!=" else n.op
            return f"({lhs} {op} {rhs})"
        joined = f" {n.op.upper()} ".join(walk(c) for c in n.children)
        return f"({joined})"

    return walk(node)
