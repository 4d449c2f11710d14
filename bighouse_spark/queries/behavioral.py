"""ClickHouse behavioral-analytics aggregate family, Spark-first.

The reference ships full ClickHouse 23.6 (SURVEY.md §2.C, ch/Dockerfile:1),
whose distinctive non-standard aggregates are ``windowFunnel``,
``retention`` and ``sequenceMatch`` — per-entity ordered-event analytics.
Spark has no built-in equivalents; rather than a per-row Python UDF we
express each as a composition of conditional aggregations and broadcast
self-joins so the whole plan stays in whole-stage codegen:

* windowFunnel  -> chained min-timestamp aggregations (one small shuffle
  per funnel level, each level's output is per-user and broadcast into
  the next level's filter);
* retention     -> one conditional aggregation pass (max(CASE ...));
* sequenceMatch -> min/max conditional timestamps compared per user.

At 100 TB the event table shuffles once per funnel stage on user_id
(the natural key, ~uniform); per-level outputs are |users|-sized —
orders of magnitude smaller than the event set — so every join after
the first aggregation is broadcast-able and AQE will pick broadcast
automatically. No windowing over the full event stream is needed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.queries.registry import query, t


# windowFunnel('1 hour')(ts, view, click, purchase), first-anchor
# semantics: level 1 at the user's FIRST view; level 2 at the first
# click in [t1, t1+1h]; level 3 at the first purchase in [t2, t1+1h].
# Output: users per max funnel level (0 = never viewed).
@query(
    "funnel_window_3step",
    oracle="""
WITH l1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), l2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN l1 ON e.user_id = l1.user_id
  WHERE e.event_type = 'click'
    AND e.ts >= l1.t1 AND e.ts <= l1.t1 + INTERVAL 1 HOUR
  GROUP BY e.user_id
), l3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e
  JOIN l2 ON e.user_id = l2.user_id
  JOIN l1 ON e.user_id = l1.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts >= l2.t2 AND e.ts <= l1.t1 + INTERVAL 1 HOUR
  GROUP BY e.user_id
)
SELECT level, count(*) AS n_users FROM (
  SELECT u.user_id,
         CASE WHEN l3.t3 IS NOT NULL THEN 3
              WHEN l2.t2 IS NOT NULL THEN 2
              WHEN l1.t1 IS NOT NULL THEN 1
              ELSE 0 END AS level
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN l1 ON u.user_id = l1.user_id
  LEFT JOIN l2 ON u.user_id = l2.user_id
  LEFT JOIN l3 ON u.user_id = l3.user_id
) GROUP BY level
""",
)
def funnel_window_3step(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    hour = F.expr("INTERVAL 1 HOUR")
    # r14 (guide §2.4 — remove passes): ONE conditional aggregation
    # yields both the user universe (the old separate
    # `ev.select("user_id").distinct()` scan) and each user's first
    # view (`t1`, null when the user never viewed — exactly the old
    # LEFT JOIN l1 outcome). Level 2 carries t1 through its aggregate
    # (constant per user) so level 3 needs one broadcast input, not
    # two. Net: 4 event scans → 3, one aggregation exchange and two
    # broadcast joins removed; per-level aggregates stay |users|-sized
    # and broadcastable at any scale.
    base = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1")
    )
    l1 = base.where(F.col("t1").isNotNull())
    l2 = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(l1), "user_id")
        .where((F.col("ts") >= F.col("t1")) & (F.col("ts") <= F.col("t1") + hour))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.max("t1").alias("t1w"))
    )
    l3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(l2), "user_id")
        .where((F.col("ts") >= F.col("t2")) & (F.col("ts") <= F.col("t1w") + hour))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    level = (
        base.join(F.broadcast(l2.select("user_id", "t2")), "user_id", "left")
        .join(F.broadcast(l3), "user_id", "left")
        .select(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .alias("level")
        )
    )
    return level.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


# retention(signup, active wk2+, purchase): one conditional-aggregation
# pass per user, then column sums. r1 gates r2/r3 exactly as CH
# retention() does (cond_i AND cond_1).
@query(
    "retention_cohort",
    oracle="""
SELECT CAST(sum(r1) AS BIGINT) AS n_r1,
       CAST(sum(CASE WHEN r1 = 1 AND r2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_r2,
       CAST(sum(CASE WHEN r1 = 1 AND r3 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_r3
FROM (
  SELECT user_id,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
         max(CASE WHEN ts >= TIMESTAMP '2024-01-08 00:00:00'
                  THEN 1 ELSE 0 END) AS r2,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r3
  FROM events GROUP BY user_id
)
""",
)
def retention_cohort(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("r1"),
        F.max(
            F.when(
                F.col("ts") >= F.lit("2024-01-08 00:00:00").cast("timestamp"), 1
            ).otherwise(0)
        ).alias("r2"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("r3"),
    )
    return per_user.agg(
        F.sum("r1").cast("bigint").alias("n_r1"),
        F.sum(
            F.when((F.col("r1") == 1) & (F.col("r2") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_r2"),
        F.sum(
            F.when((F.col("r1") == 1) & (F.col("r3") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_r3"),
    )


# sequenceMatch('(?1).*(?2)')(ts, view, purchase): per user, does any
# view precede any purchase? min(view ts) < max(purchase ts), one
# aggregation pass — no ordered scan materialized.
@query(
    "sequence_match_view_purchase",
    oracle="""
SELECT CAST(sum(CASE WHEN first_view < last_purchase THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       count(*) AS n_users
FROM (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
  FROM events GROUP BY user_id
)
""",
)
def sequence_match_view_purchase(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    return per_user.agg(
        F.sum(
            F.when(F.col("first_view") < F.col("last_purchase"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_matched"),
        F.count(F.lit(1)).alias("n_users"),
    )


# sequenceCount('(?1)(?2)') — the COUNT of non-overlapping
# view→purchase chains per user (CH counts greedy non-overlapping
# matches). Closed form instead of a stateful scan: pairing each
# purchase with an earlier unmatched view greedily leaves exactly
# max_prefix(purchases_so_far - views_so_far) purchases unmatched
# (ballot-problem argument), so
#   chains(user) = total_purchases - max(0, max_prefix_deficit)
# — one window cumsum + one rollup per user, no UDF, no iteration.
# Deterministic tie order: (ts, event_id).
@query(
    "sequence_count_view_purchase",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_v
  FROM events WHERE event_type IN ('view', 'purchase')
), c AS (
  SELECT user_id,
         sum(is_p) OVER w AS cum_p,
         sum(is_v) OVER w AS cum_v,
         is_p
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT user_id,
       CAST(sum(is_p) - greatest(max(cum_p - cum_v), 0) AS BIGINT)
         AS n_chains
FROM c GROUP BY user_id ORDER BY user_id
""",
)
def sequence_count_view_purchase(spark, sf_dir):
    from pyspark.sql import Window

    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id", "event_id", "ts",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            .alias("is_p"),
            F.when(F.col("event_type") == "view", 1).otherwise(0)
            .alias("is_v"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = ev.select(
        "user_id", "is_p",
        F.sum("is_p").over(w).alias("cum_p"),
        F.sum("is_v").over(w).alias("cum_v"),
    )
    return (
        c.groupBy("user_id")
        .agg(
            (
                F.sum("is_p")
                - F.greatest(
                    F.max(F.col("cum_p") - F.col("cum_v")), F.lit(0)
                )
            ).cast("bigint").alias("n_chains")
        )
        .orderBy("user_id")
    )
