"""Error-resilient pagination driver + retry helper.

Same observable semantics as the reference's generic paging loop
(main/utils/batch.py:4-52) and retry wrapper (main/utils/retry.py:5-15),
re-implemented: fetch batches of ``batch_size``; when a batch read
fails, degrade to size-1 batches and skip up to
``max_skipped_items_in_row`` consecutive bad items before raising.

These run driver-side around REST sources (Spark task retries cover
executor-side failures; SURVEY §2.1 S7/S8)."""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import Any


class SkippedItemsLimitExceeded(RuntimeError):
    pass


def execute_with_retry(
    func: Callable[[], Any],
    what: str = "",
    retries: int = 3,
    delay_seconds: float = 1.0,
) -> Any:
    """Retry with fixed delay (reference default: 3 retries / 1 s)."""
    last: Exception | None = None
    for attempt in range(retries):
        try:
            return func()
        except Exception as exc:  # noqa: BLE001 - deliberate catch-all boundary
            last = exc
            if attempt < retries - 1:
                time.sleep(delay_seconds)
    raise RuntimeError(f"retries exhausted for {what or func}") from last


def read_items_in_batches(
    read_batch: Callable[[int, int], list],
    total: int,
    batch_size: int = 500,
    max_skipped_items_in_row: int = 5,
) -> Iterator[Any]:
    """Yield items from ``read_batch(offset, limit)`` with degradation:
    a failing batch is retried item-by-item, skipping up to N
    consecutive bad items (reference utils/batch.py:18-41)."""
    offset = 0
    skipped_in_row = 0
    while offset < total:
        limit = min(batch_size, total - offset)
        try:
            items = read_batch(offset, limit)
            skipped_in_row = 0
            yield from items
            offset += limit
        except Exception:
            # degrade: walk this batch one item at a time
            for single in range(offset, offset + limit):
                try:
                    yield from read_batch(single, 1)
                    skipped_in_row = 0
                except Exception as exc:
                    skipped_in_row += 1
                    if skipped_in_row > max_skipped_items_in_row:
                        raise SkippedItemsLimitExceeded(
                            f"skipped {skipped_in_row} consecutive items "
                            f"at offset {single}"
                        ) from exc
            offset += limit
