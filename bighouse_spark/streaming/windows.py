"""Time-window aggregations (batch + Structured Streaming).

The reference is strictly batch (SURVEY.md §2: "Not present anywhere,
in any form: streaming"); this is extension surface over the fixtures'
``events`` table. Each builder works on BOTH a batch DataFrame and a
streaming one — ``F.window``/``F.session_window`` are mode-agnostic —
so correctness is oracle-checked in batch while the same code serves
``readStream`` pipelines. ``with_watermark`` is applied only when the
input is streaming (required for state eviction of late data).

At scale: windowed aggregation state lives in the state store keyed by
(group, window); watermark tightness bounds state size — an unbounded
watermark on a 100 TB/day stream is an OOM, not a correctness choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if df.isStreaming and watermark:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Non-overlapping windows: count + sum(value) per (window, keys).
    Epoch-aligned window starts (Spark default) match DuckDB
    ``time_bucket`` for the oracle."""
    df = _maybe_watermark(events, ts_col, watermark)
    group = [F.window(F.col(ts_col), window).alias("w")] + [
        F.col(k) for k in (keys or [])
    ]
    return (
        df.groupBy(*group)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *[F.col(k) for k in (keys or [])],
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping windows (each event lands in window/slide buckets)."""
    df = _maybe_watermark(events, ts_col, watermark)
    group = [F.window(F.col(ts_col), window, slide).alias("w")] + [
        F.col(k) for k in (keys or [])
    ]
    return (
        df.groupBy(*group)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            *[F.col(k) for k in (keys or [])],
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "10 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into
    one session per key. Batch semantics equal the gaps-and-islands
    SQL (lag + cumulative island id) used by the oracle."""
    keys = keys or ["user_id"]
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            *keys,
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
