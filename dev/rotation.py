"""Verification-rotation planner for the driver's 50-key window.

The driver's correctness gate records only the FIRST 50 entries of
``queries()`` (the registry docstring documents the policy: never-
driver-green keys first, then the stalest). This tool reads every
committed ``CORRECTNESS_r{N}.json`` and prints, per key, its newest
driver-green round and the recommended next-round window — so the
next round's reorder is a mechanical copy instead of a hand-audit.

Usage:
    python dev/rotation.py            # report + recommended window
    python dev/rotation.py --check    # exit 1 if the current first-50
                                      # violates the policy (a key with
                                      # an OLDER newest-green round is
                                      # outside the window while a
                                      # younger one is inside)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def _green(row: dict) -> bool:
    return bool(
        row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
    ) and not row.get("err")


def newest_green_rounds(repo_root: str) -> dict[str, int]:
    """key -> newest round with a driver-green row (absent = never)."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for key, row in data.items():
            if isinstance(row, dict) and _green(row):
                newest[key] = max(newest.get(key, 0), rnd)
    return newest


def plan(keys: list[str], newest: dict[str, int]) -> list[str]:
    """Recommended next-window order: never-green first (registry
    order preserved — newest additions lead), then ascending by
    newest-green round (stalest first), ties in registry order."""
    order = {k: i for i, k in enumerate(keys)}
    never = [k for k in keys if k not in newest]
    seen = sorted(
        (k for k in keys if k in newest), key=lambda k: (newest[k], order[k])
    )
    return never + seen


def main() -> int:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry

    keys = list(entry.queries())
    newest = newest_green_rounds(repo_root)
    recommended = plan(keys, newest)

    def tag(k: str) -> str:
        return f"r{newest[k]}" if k in newest else "NEVER"

    print(f"registry keys: {len(keys)}; window: first {WINDOW}")
    print("\ncurrent window (with newest driver-green round):")
    for i, k in enumerate(keys[:WINDOW], 1):
        print(f"  {i:3d}. {k:28s} {tag(k)}")
    print("\nout-of-window (stalest first):")
    tail = sorted(keys[WINDOW:], key=lambda k: newest.get(k, -1))
    for k in tail:
        print(f"       {k:28s} {tag(k)}")
    print(f"\nrecommended NEXT-ROUND window (copy into queries() order):")
    for i, k in enumerate(recommended[:WINDOW], 1):
        print(f"  {i:3d}. {k:28s} {tag(k)}")

    if "--check" in sys.argv:
        # the canonical violation the verdicts flag: a never-green key
        # outside the window while a green key occupies a slot
        never_out = [k for k in keys[WINDOW:] if k not in newest]
        if never_out:
            print(
                f"\nPOLICY VIOLATION: never-green keys outside the window: "
                f"{never_out} — they must LEAD the next round's window"
            )
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
