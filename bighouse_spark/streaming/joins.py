"""Stream-stream interval join — the enrichment join of two live
streams (clicks ⋈ purchases within an hour), built so the SAME
function serves batch DataFrames and streaming ones.

Spark's stream-stream join contract: both sides watermarked, join
condition = key equality + a bounded time range, append output. The
range bound is what lets the state store expire rows — without it
both sides buffer forever. At 100 TB/day the state held is
``rate × (upper - lower + watermark)`` per side, independent of
stream length — that bounded-state property is the whole design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    lower_s: int = 0,
    upper_s: int = 3600,
    watermark_s: int = 600,
    right_suffix: str = "_r",
) -> DataFrame:
    """Inner-join ``left`` and ``right`` on ``on`` keys where
    ``right_time ∈ [left_time + lower_s, left_time + upper_s]``.
    Right-side non-key columns are suffixed. Works identically on
    batch and streaming inputs; streaming inputs get watermarks
    (required for state expiry)."""
    if left.isStreaming:
        left = left.withWatermark(left_time, f"{watermark_s} seconds")
    if right.isStreaming:
        right = right.withWatermark(right_time, f"{watermark_s} seconds")
    r = right.select(
        *[F.col(k) for k in on],
        *[
            F.col(c).alias(c + right_suffix)
            for c in right.columns
            if c not in on
        ],
    )
    rt = right_time + right_suffix
    cond = [left[k] == r[k] for k in on] + [
        F.col(rt) >= F.col(left_time) + F.expr(f"INTERVAL {lower_s} SECONDS"),
        F.col(rt) <= F.col(left_time) + F.expr(f"INTERVAL {upper_s} SECONDS"),
    ]
    joined = left.join(r, cond, "inner")
    # drop the duplicated key columns from the right side
    return joined.select(
        *[left[c] for c in left.columns],
        *[F.col(c + right_suffix) for c in right.columns if c not in on],
    )
