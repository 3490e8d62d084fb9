"""Metadata filter mini-language: ``field op "value"`` expressions.

Grammar (matches the observable behavior of the reference parser,
main/indexes/filters/filter_parser.py:21-95 — re-implemented from its
semantics, not copied):

    expr      := term (("and" | "or") term)*     # EQUAL precedence,
    term      := "(" expr ")" | condition        # LEFT-associative
    condition := field op quoted_string
    op        := = | != | >= | <= | > | <

Notable semantics preserved from the reference:

- ``and`` and ``or`` have the SAME precedence and associate LEFT:
  ``a or b and c`` parses as ``(a or b) and c`` — this differs from SQL!
  (The reference README claims mixing is unsupported, but the parser
  handles it exactly this way — SURVEY §7.4; filter_parser.py:64-77.)
  Compilers must parenthesize accordingly.
- Consecutive terms joined by the SAME operator flatten into one group
  (filter_parser.py:72-75), so ``a and b and c`` is one 3-child AND.
- Values are always quoted strings; typing (numeric / timestamp
  comparison) is the compiler's job, driven by the table schema.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Union

COMPARISON_OPS = ("!=", ">=", "<=", "=", ">", "<")  # longest-match order

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<op>!=|>=|<=|=|>|<)
      | (?P<string>"(?:[^"\\]|\\.)*")
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)


@dataclass(frozen=True)
class FilterCondition:
    field: str
    op: str
    value: str


@dataclass
class FilterGroup:
    op: str  # "and" | "or"
    children: list["FilterNode"] = dc_field(default_factory=list)


FilterNode = Union[FilterCondition, FilterGroup]


class FilterParseError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise FilterParseError(f"cannot tokenize filter at: {text[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        raw = m.group(kind)
        if kind == "string":
            raw = raw[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        tokens.append((kind, raw))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def take(self) -> tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise FilterParseError("unexpected end of filter expression")
        self.i += 1
        return tok

    def parse_expr(self) -> FilterNode:
        node = self.parse_term()
        while True:
            tok = self.peek()
            if tok is None or tok[0] != "word" or tok[1].lower() not in ("and", "or"):
                break
            bool_op = self.take()[1].lower()
            rhs = self.parse_term()
            # left-associative; flatten same-op chains into one group
            if isinstance(node, FilterGroup) and node.op == bool_op:
                node.children.append(rhs)
            else:
                node = FilterGroup(op=bool_op, children=[node, rhs])
        return node

    def parse_term(self) -> FilterNode:
        kind, value = self.take()
        if kind == "lparen":
            inner = self.parse_expr()
            close = self.take()
            if close[0] != "rparen":
                raise FilterParseError("expected ')'")
            return inner
        if kind == "word":
            op_tok = self.take()
            if op_tok[0] != "op":
                raise FilterParseError(
                    f"expected comparison operator after field {value!r}"
                )
            val_tok = self.take()
            if val_tok[0] != "string":
                raise FilterParseError(
                    f"expected quoted value after {value!r} {op_tok[1]!r}"
                )
            return FilterCondition(field=value, op=op_tok[1], value=val_tok[1])
        raise FilterParseError(f"unexpected token {value!r}")


def parse_filter(text: str) -> FilterNode:
    """Parse a filter string into an AST; raises FilterParseError."""
    tokens = _tokenize(text)
    if not tokens:
        raise FilterParseError("empty filter expression")
    parser = _Parser(tokens)
    node = parser.parse_expr()
    if parser.peek() is not None:
        raise FilterParseError(f"trailing tokens: {parser.tokens[parser.i:]}")
    return node
