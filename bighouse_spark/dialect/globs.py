"""Brace-glob expansion for source URLs.

ClickHouse table functions accept ``{a..b}`` numeric ranges and
``{x,y}`` alternation in URLs (reference
``temporal/workflow_query_executor_test.go:49,63-65`` —
``house_{0,1}.parquet``, ``data-{2009..2016}{01..12}.csv.gz``).

Hadoop's glob syntax supports ``{x,y}`` natively but NOT ``{a..b}``
ranges, so ranges are expanded here, pre-read, into explicit path
lists. Expansion is purely textual and happens on the driver — the
resulting list (≤ thousands of paths) is cheap; the executors still
do the listing/reading in parallel.
"""

from __future__ import annotations

import itertools
import re

_RANGE = re.compile(r"\{(\d+)\.\.(\d+)\}")


def expand_braces(url: str) -> list[str]:
    """Expand every ``{a..b}`` range in ``url``; preserves zero padding
    (``{01..12}`` → ``01, 02, …``). ``{x,y}`` alternation is left
    intact for the Hadoop glob layer. Returns at least ``[url]``.
    """
    m = _RANGE.search(url)
    if not m:
        return [url]
    lo, hi = m.group(1), m.group(2)
    width = len(lo) if lo.startswith("0") and len(lo) == len(hi) else 0
    values = [str(i).zfill(width) for i in range(int(lo), int(hi) + 1)]
    prefix, suffix = url[: m.start()], url[m.end() :]
    return list(
        itertools.chain.from_iterable(
            expand_braces(f"{prefix}{v}{suffix}") for v in values
        )
    )
