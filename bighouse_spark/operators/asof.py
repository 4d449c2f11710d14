"""AS-OF join — match each left row to the most recent right row.

ClickHouse has native ``ASOF JOIN``; Spark's DataFrame API does not
(SURVEY.md §2.C flags this as the one genuine custom operator for
full-surface parity). Implemented as the union+window trick rather
than a pandas ``merge_asof``:

1. tag both sides, union on (keys, time),
2. per key ordered by (time, side-tag), ``last(right_payload,
   ignorenulls=True)`` over an unbounded-preceding window carries the
   latest right row forward,
3. keep left rows.

Scale shape: ONE shuffle on the join keys (the window partition) —
same cost as a regular sort-merge join, no range explosion, no
driver-side loop. Skewed keys behave like any window skew (salt the
key upstream if one entity dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_values: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row matching on
    ``on`` keys: with ``direction="backward"`` (default) the greatest
    ``right_time`` ≤ ``left_time`` (< if ``strict``); with
    ``"forward"`` the smallest ``right_time`` ≥ ``left_time``
    (> if ``strict``). ``tolerance`` (seconds for timestamp columns,
    column units otherwise) nulls the right payload when the matched
    row is further than that from the left time — the pandas
    ``merge_asof`` contract, distributed.

    Right payload columns are suffixed on collision.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    right_values = right_values or [
        c for c in right.columns if c not in on and c != right_time
    ]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_values
    }
    rt_out = right_time + suffix if right_time in left.columns else right_time

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_values],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
        F.col(right_time).alias("__rt"),
    ).select(*l_tag.columns)  # align column order for union

    # Order right rows before left rows at equal timestamps so a
    # same-instant right row is visible (non-strict). Strict mode
    # orders left first, hiding same-instant rights. Forward direction
    # traverses time descending — "last previous in traversal order"
    # then means "nearest following in time".
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        F.col("__t").alias("__lt"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(out_names[c])
            for c in right_values
        ],
        F.last("__rt", ignorenulls=True).over(w).alias(rt_out),
    )
    out = carried.where(F.col("__side") == 1)
    if tolerance is not None:
        lt, rt = F.col("__lt"), F.col(rt_out)
        is_ts = str(left.schema[left_time].dataType).startswith("Timestamp")
        if is_ts:
            gap = F.abs(
                lt.cast("double") - rt.cast("double")
            )  # timestamp → epoch seconds
        else:
            gap = F.abs(lt - rt)
        keep = rt.isNotNull() & (gap <= F.lit(tolerance))
        out = out.select(
            *[F.col(c) for c in left.columns],
            F.col("__side"),
            F.col("__lt"),
            *[
                F.when(keep, F.col(out_names[c]))
                .otherwise(F.lit(None))
                .alias(out_names[c])
                for c in right_values
            ],
            F.when(keep, rt).otherwise(F.lit(None)).alias(rt_out),
        )
    return out.drop("__side", "__lt")
