"""Result formatting: json / json_with_indent / toon.

Mirror of the reference's formatter surface (main/utils/formatting.py:
5-15), which delegates 'toon' to the ``toons`` library. That library is
not in this container, so this module implements the public TOON
(Token-Oriented Object Notation) spec for the value shapes the serving
adapters emit — JSON-compatible dicts/lists/scalars:

- objects: ``key: value`` lines, nested blocks indented two spaces
- arrays of primitives: ``key[N]: v1,v2,v3``
- arrays of UNIFORM flat objects (the search-results shape): the
  tabular form ``key[N]{f1,f2}:`` with one comma-joined row per line
- other arrays: ``key[N]:`` with one ``- item`` line per element
- strings are quoted (JSON escaping) only when they would be ambiguous
  (delimiters, leading/trailing space, number/bool/null look-alikes)
"""

from __future__ import annotations

import json
import re

_SAFE_RE = re.compile(r"^[^\s\"#,:\[\]{}][^\"#,:\[\]{}]*$")
_AMBIG_RE = re.compile(r"^(true|false|null|-?\d+(\.\d+)?([eE][+-]?\d+)?)$")


def _scalar(v) -> str:
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (int, float)):
        return json.dumps(v)
    s = str(v)
    if s == "" or not _SAFE_RE.match(s) or _AMBIG_RE.match(s) or s != s.strip():
        return json.dumps(s, ensure_ascii=False)
    return s


def _is_flat_uniform(items: list) -> bool:
    if not items or not all(isinstance(x, dict) for x in items):
        return False
    keys = list(items[0].keys())
    if not keys:
        return False
    return all(
        list(x.keys()) == keys
        and all(not isinstance(v, (dict, list)) for v in x.values())
        for x in items
    )


def _emit(key: str | None, value, indent: int, out: list[str]) -> None:
    pad = "  " * indent
    label = f"{_scalar(key)}" if key is not None else None
    if isinstance(value, dict):
        if label is not None:
            out.append(f"{pad}{label}:")
            indent += 1
        for k, v in value.items():
            _emit(k, v, indent, out)
    elif isinstance(value, list):
        n = len(value)
        if _is_flat_uniform(value):
            fields = list(value[0].keys())
            head = f"[{n}]{{{','.join(_scalar(f) for f in fields)}}}:"
            out.append(f"{pad}{label or ''}{head}")
            for item in value:
                out.append(
                    "  " * (indent + 1)
                    + ",".join(_scalar(item[f]) for f in fields)
                )
        elif all(not isinstance(x, (dict, list)) for x in value):
            joined = ",".join(_scalar(x) for x in value)
            out.append(f"{pad}{label or ''}[{n}]: {joined}")
        else:
            out.append(f"{pad}{label or ''}[{n}]:")
            for item in value:
                if isinstance(item, (dict, list)):
                    out.append("  " * (indent + 1) + "-")
                    _emit(None, item, indent + 2, out)
                else:
                    out.append("  " * (indent + 1) + f"- {_scalar(item)}")
    else:
        out.append(f"{pad}{label}: {_scalar(value)}" if label else f"{pad}{_scalar(value)}")


def to_toon(obj) -> str:
    """Serialize a JSON-compatible value to TOON text."""
    out: list[str] = []
    if isinstance(obj, (dict, list)):
        _emit(None, obj, 0, out)
    else:
        out.append(_scalar(obj))
    return "\n".join(out)


def format_object(obj, fmt: str) -> str:
    """json / json_with_indent / toon — the reference's formatter
    surface (main/utils/formatting.py:5-15)."""
    if fmt == "json":
        return json.dumps(obj, ensure_ascii=False, default=str)
    if fmt == "json_with_indent":
        return json.dumps(obj, ensure_ascii=False, indent=2, default=str)
    if fmt == "toon":
        return to_toon(_jsonable(obj))
    raise ValueError(f"Unsupported format: {fmt}")


def _jsonable(obj):
    """Round-trip through the json encoder's default=str handling so
    toon sees the same coerced values the json formats print."""
    return json.loads(json.dumps(obj, ensure_ascii=False, default=str))
