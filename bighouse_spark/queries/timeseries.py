"""Time-series operators over the ``events`` fixture: AS-OF join and
tumbling / sliding / session window aggregations.

AS-OF is the one operator ClickHouse has natively that Spark's
DataFrame API lacks (SURVEY.md §2.C); the implementation in
``operators.asof`` is a single-shuffle union+window. The window
aggregations are the Structured-Streaming-compatible builders from
``streaming.windows`` run in batch mode so DuckDB can oracle-check
identical semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.operators.asof import asof_join
from bighouse_spark.queries.registry import query, t
from bighouse_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


# AS-OF JOIN: for each purchase, the most recent click (≤ ts) by the
# same user. Oracle uses DuckDB's native ASOF LEFT JOIN.
@query(
    "asof_join_purchase_click",
    oracle="""
SELECT p.event_id, p.user_id, c.ts AS click_ts,
       c.event_id AS click_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def asof_join_purchase_click(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.col("event_id").alias("click_event_id"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_values=["click_event_id"],
    )
    return joined.select(
        "event_id", "user_id", F.col("ts_right").alias("click_ts"), "click_event_id"
    )


# Tumbling window: hourly event counts + value sums per event type.
# DuckDB time_bucket and Spark F.window are both epoch-aligned.
@query(
    "window_tumbling_hourly",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY window_start, event_type
""",
)
def window_tumbling_hourly(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# Sliding window: 1-hour windows every 30 minutes. Each event lands in
# exactly 2 windows; the oracle materializes both via unnest.
@query(
    "window_sliding_1h_30m",
    oracle="""
SELECT ws AS window_start, count(*) AS n_events
FROM (
  SELECT unnest([
    time_bucket(INTERVAL '30 minutes', ts),
    time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
  ]) AS ws
  FROM events)
GROUP BY ws
""",
)
def window_sliding_1h_30m(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return sliding_window_agg(ev, window="1 hour", slide="30 minutes")


# Session window: 10-minute-gap sessions per user. Oracle is the
# gaps-and-islands formulation (new session when gap ≥ 10 min, since
# Spark session windows are [start, last+gap) — end-exclusive).
@query(
    "window_session_10m",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), islands AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM islands GROUP BY user_id, session_id
""",
)
def window_session_10m(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return session_window_agg(ev, gap="10 minutes", keys=["user_id"])


# Tumbling daily rollup of sessions — a second streaming-compatible
# aggregation layered on the first (hypertable-rollup shape).
@query(
    "window_daily_rollup",
    oracle="""
SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY window_start
""",
)
def window_daily_rollup(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_users")
    )


# JSON extraction from the events.props column (ClickHouse JSON
# function family). regexp_extract keeps Spark and DuckDB regex
# semantics aligned (trivial pattern).
@query(
    "json_extract_props",
    oracle="""
SELECT CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT)
         AS sum_k,
       count(*) AS cnt
FROM events
""",
)
def json_extract_props(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    k = F.regexp_extract("props", '"k": (\\d+)', 1).cast("bigint")
    return ev.agg(F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("cnt"))


# Gap filling: dense hourly buckets per user spanning the user's
# active range, zero-filled where no events — the hypertable
# time_bucket_gapfill shape. The bucket spine generates from
# sequence+explode (scan-side, no shuffle); counts join back on
# (user, bucket).
@query(
    "window_gapfill_hourly",
    oracle="""
WITH bounds AS (
  SELECT user_id,
         date_trunc('hour', min(ts)) AS t0,
         date_trunc('hour', max(ts)) AS t1
  FROM events WHERE user_id < 5 GROUP BY user_id
), spine AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
), counts AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE user_id < 5 GROUP BY user_id, bucket
)
SELECT s.user_id, s.bucket, coalesce(c.n, 0) AS n_events
FROM spine s LEFT JOIN counts c
  ON s.user_id = c.user_id AND s.bucket = c.bucket
ORDER BY s.user_id, s.bucket
""",
)
def window_gapfill_hourly(spark, sf_dir):
    ev = t(spark, sf_dir, "events").where(F.col("user_id") < 5)
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    counts = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        spine.join(counts, ["user_id", "bucket"], "left")
        .select(
            "user_id", "bucket", F.coalesce("n", F.lit(0)).alias("n_events")
        )
        .orderBy("user_id", "bucket")
    )
