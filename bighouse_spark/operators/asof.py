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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bighouse_spark.functions.identifiers import double_lit, quote_ident


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

    # Every projection below is built as selectExpr STRINGS, not the
    # column DSL: the per-column F.col/F.lit/cast/alias chatter cost
    # ~750 py4j round trips (~0.2 s) per asof_join construction
    # (profiled r15); the string form is a handful of calls parsing to
    # the identical expression trees.
    q = quote_ident

    l_schema = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    r_schema = {f.name: f.dataType.simpleString() for f in right.schema.fields}

    l_tag = left.selectExpr(
        *[q(c) for c in left.columns],
        f"{q(left_time)} AS `__t`",
        "1 AS `__side`",
        *[
            f"CAST(NULL AS {r_schema[c]}) AS {q('__r_' + c)}"
            for c in right_values
        ],
        f"CAST(NULL AS {r_schema[right_time]}) AS `__rt`",
    )
    r_tag = right.selectExpr(
        *[q(c) for c in on],
        *[
            f"CAST(NULL AS {l_schema[c]}) AS {q(c)}"
            for c in left.columns
            if c not in on
        ],
        f"{q(right_time)} AS `__t`",
        "0 AS `__side`",
        *[f"{q(c)} AS {q('__r_' + c)}" for c in right_values],
        f"{q(right_time)} AS `__rt`",
    )

    # Order right rows before left rows at equal timestamps so a
    # same-instant right row is visible (non-strict). Strict mode
    # orders left first, hiding same-instant rights. Forward direction
    # traverses time descending — "last previous in traversal order"
    # then means "nearest following in time".
    t_dir = "ASC" if direction == "backward" else "DESC"
    s_dir = "ASC" if not strict else "DESC"
    over = (
        f"OVER (PARTITION BY {', '.join(q(c) for c in on)} "
        f"ORDER BY `__t` {t_dir}, `__side` {s_dir} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    carried = l_tag.unionByName(r_tag).selectExpr(
        *[q(c) for c in left.columns],
        "`__side`",
        "`__t` AS `__lt`",
        *[
            f"last({q('__r_' + c)}, true) {over} AS {q(out_names[c])}"
            for c in right_values
        ],
        f"last(`__rt`, true) {over} AS {q(rt_out)}",
    )
    out = carried.where(F.col("__side") == 1)
    if tolerance is not None:
        is_ts = str(left.schema[left_time].dataType).startswith("Timestamp")
        if is_ts:
            # timestamp → epoch seconds
            gap = f"abs(CAST(`__lt` AS DOUBLE) - CAST({q(rt_out)} AS DOUBLE))"
        else:
            gap = f"abs(`__lt` - {q(rt_out)})"
        keep = (
            f"({q(rt_out)} IS NOT NULL AND {gap} <= {double_lit(tolerance)})"
        )
        out = out.selectExpr(
            *[q(c) for c in left.columns],
            "`__side`",
            "`__lt`",
            *[
                f"CASE WHEN {keep} THEN {q(out_names[c])} END"
                f" AS {q(out_names[c])}"
                for c in right_values
            ],
            f"CASE WHEN {keep} THEN {q(rt_out)} END AS {q(rt_out)}",
        )
    return out.drop("__side", "__lt")
