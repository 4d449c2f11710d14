"""Second batch of relational coverage: scalar-function families
(string/date/regex/null-handling), more TPC-H shapes (Q4/Q6/Q10/Q14/
Q18/Q19 adapted to the fixture columns), range join, pivot, UNION ALL.

These exercise Catalyst paths the first batch doesn't: disjunctive
predicate pushdown (q19), IN-subquery with HAVING (q18), correlated
EXISTS (q4), inequality/range join conditions, and pivot's
groupBy+pivot rewrite.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.queries.registry import query, t


def _dsum(expr, alias: str, scale: int = 2):
    return F.sum(expr.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


# String-function sweep over nation (25 rows — per-row projection).
@query(
    "string_functions",
    oracle="""
SELECT n_name,
       upper(n_name) AS up, lower(n_name) AS lo,
       CAST(length(n_name) AS BIGINT) AS name_len,
       substr(n_name, 1, 3) AS pre3,
       replace(n_name, 'A', '@') AS repl,
       lpad(n_name, 12, '*') AS padded,
       CAST(strpos(n_name, 'AN') AS BIGINT) AS an_pos,
       reverse(n_name) AS rev,
       concat(n_name, '#', CAST(n_regionkey AS VARCHAR)) AS tagged
FROM nation
""",
)
def string_functions(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.upper("n_name").alias("up"),
        F.lower("n_name").alias("lo"),
        F.length("n_name").cast("bigint").alias("name_len"),
        F.substring("n_name", 1, 3).alias("pre3"),
        F.replace(F.col("n_name"), F.lit("A"), F.lit("@")).alias("repl"),
        F.lpad("n_name", 12, "*").alias("padded"),
        F.instr(F.col("n_name"), "AN").cast("bigint").alias("an_pos"),
        F.reverse("n_name").alias("rev"),
        F.concat(
            F.col("n_name"), F.lit("#"), F.col("n_regionkey").cast("string")
        ).alias("tagged"),
    )


# LIKE / ILIKE / rlike filters.
@query(
    "like_filters",
    oracle="""
SELECT CAST(sum(CASE WHEN p_name LIKE '%ole%' THEN 1 ELSE 0 END) AS BIGINT) AS n_like,
       CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END) AS BIGINT) AS n_promo,
       CAST(sum(CASE WHEN regexp_matches(p_brand, '^Brand#[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_brand_re,
       count(*) AS cnt
FROM part
""",
)
def like_filters(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.agg(
        F.sum(
            F.when(F.col("p_name").like("%ole%"), 1).otherwise(0)
        ).alias("n_like"),
        F.sum(
            F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0)
        ).alias("n_promo"),
        F.sum(
            F.when(F.col("p_brand").rlike("^Brand#[0-9]+$"), 1).otherwise(0)
        ).alias("n_brand_re"),
        F.count(F.lit(1)).alias("cnt"),
    )


# Date-function sweep: trunc, extract, arithmetic, last_day.
# dayofweek offsets differ (Spark Sunday=1, DuckDB Sunday=0) — the
# query normalizes to DuckDB's convention.
@query(
    "date_functions",
    oracle="""
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       count(*) AS n_orders,
       CAST(sum(dayofweek(o_orderdate)) AS BIGINT) AS sum_dow,
       CAST(sum(CAST(quarter(o_orderdate) AS BIGINT)) AS BIGINT) AS sum_quarter,
       max(last_day(CAST(o_orderdate AS DATE))) AS max_month_end,
       CAST(sum(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS BIGINT)
         AS sum_days_since
FROM orders GROUP BY order_month
""",
)
def date_functions(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.dayofweek("o_orderdate") - 1).alias("sum_dow"),
        F.sum(F.quarter("o_orderdate").cast("bigint")).alias("sum_quarter"),
        F.max(F.last_day("o_orderdate")).alias("max_month_end"),
        F.sum(
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        ).alias("sum_days_since"),
    )


# NULL handling: nullif/coalesce/null-safe equality.
@query(
    "null_handling",
    oracle="""
SELECT count(*) AS cnt,
       count(nullif(o_orderstatus, 'O')) AS n_not_open,
       CAST(sum(CASE WHEN nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_f,
       CAST(sum(CASE WHEN coalesce(nullif(o_orderstatus, 'O'), 'OPEN') = 'OPEN'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_coalesced
FROM orders
""",
)
def null_handling(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    masked = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count(masked).alias("n_not_open"),
        F.sum(F.when(masked.eqNullSafe("F"), 1).otherwise(0)).alias(
            "n_nullsafe_f"
        ),
        F.sum(
            F.when(F.coalesce(masked, F.lit("OPEN")) == "OPEN", 1).otherwise(0)
        ).alias("n_coalesced"),
    )


# TPC-H Q6: forecasting revenue change — tight scan + filter + agg,
# the predicate-pushdown showcase.
@query(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def tpch_q6(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", 4)
        )
    )


# TPC-H Q4 shape: correlated EXISTS + group by priority.
@query(
    "tpch_q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def tpch_q4(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("__q4_orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("__q4_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM __q4_orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM __q4_lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


# TPC-H Q10 shape: returned-item revenue per customer, top 20.
@query(
    "tpch_q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def tpch_q10(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                4,
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# TPC-H Q14 shape: promo revenue share (conditional agg over a join).
@query(
    "tpch_q14_promo_revenue",
    oracle="""
SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         * 100 AS promo_share_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
""",
)
def tpch_q14(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(zero))
                .cast("double")
                / F.sum(disc).cast("double")
                * 100
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# TPC-H Q18 shape: large-volume orders via IN-subquery with HAVING.
@query(
    "tpch_q18_large_orders",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
GROUP BY o_orderkey, o_custkey
""",
)
def tpch_q18(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("__q18_orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("__q18_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_qty
        FROM __q18_orders JOIN __q18_lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM __q18_lineitem GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        GROUP BY o_orderkey, o_custkey
        """
    )


# TPC-H Q19 shape: disjunctive multi-attribute predicates over a join
# (the OR-pushdown stress test).
@query(
    "tpch_q19_disjunctive",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       count(*) AS n_matched
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity < 10)
   OR (p_type = 'PROMO' AND l_discount > 0.05)
""",
)
def tpch_q19(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 10)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") < 10)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_discount") > 0.05))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                4,
            ),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )


# Range join: click→purchase conversions within 5 minutes, same user.
# Equi-join on user_id with a residual time-range predicate — one
# shuffle, no cartesian (the scalable range-join shape).
@query(
    "range_join_conversions",
    oracle="""
SELECT count(*) AS n_conversions,
       count(DISTINCT c.user_id) AS n_users
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL '5 minutes'
""",
)
def range_join_conversions(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
    )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 5 MINUTES")
        ),
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.count_distinct("user_id").alias("n_users"),
    )


# Pivot: per-user event-type counts as columns (groupBy().pivot()).
@query(
    "pivot_event_counts",
    oracle="""
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events GROUP BY user_id
""",
)
def pivot_event_counts(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    # Explicit value list keeps the pivot single-pass (no distinct-
    # values pre-scan) and the output schema stable.
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


# UNION ALL (multiset union, no dedup shuffle).
@query(
    "set_union_all",
    oracle="""
SELECT nk, count(*) AS cnt FROM (
  SELECT c_nationkey AS nk FROM customer
  UNION ALL
  SELECT s_nationkey AS nk FROM supplier
  UNION ALL
  SELECT n_nationkey AS nk FROM nation) u
GROUP BY nk
""",
)
def set_union_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    n = t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nk"))
    return (
        c.unionAll(s)
        .unionAll(n)
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# Cross join (small × small) — cartesian of region × priority values.
@query(
    "cross_join_matrix",
    oracle="""
SELECT r_name, o_orderpriority, count(*) AS cnt
FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
GROUP BY r_name, o_orderpriority
""",
)
def cross_join_matrix(spark, sf_dir):
    r = t(spark, sf_dir, "region")
    pri = t(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return (
        r.crossJoin(pri)
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# UNPIVOT (wide→long reshaping): lineitem's four measures become
# (measure, value) rows via stack() — the inverse of the PIVOT query.
# Scan-side row generation, no shuffle.
@query(
    "unpivot_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
       CAST(l_quantity AS DOUBLE) AS value
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice',
       CAST(l_extendedprice AS DOUBLE) FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount',
       CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax',
       CAST(l_tax AS DOUBLE) FROM lineitem WHERE l_orderkey < 100
""",
)
def unpivot_measures(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(4, 'l_quantity', CAST(l_quantity AS DOUBLE), "
            "'l_extendedprice', CAST(l_extendedprice AS DOUBLE), "
            "'l_discount', CAST(l_discount AS DOUBLE), "
            "'l_tax', CAST(l_tax AS DOUBLE)) AS (measure, value)"
        ),
    )
