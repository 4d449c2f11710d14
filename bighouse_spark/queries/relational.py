"""SURVEY.md §2.C batch families — joins (inner/left/semi/anti),
set ops, window functions, grouping sets/rollup/cube, scalar function
library, subqueries.

All Catalyst built-ins (the work is translation + tests, not
execution — SURVEY.md §7.3). Shapes chosen for 100 TB: dimension
joins are broadcast (region/nation/customer are small relative to
fact tables), fact-fact joins shuffle on their keys once, top-k uses
the window-rank pattern Spark can partially push down.

Money arithmetic is summed as decimal(18,2/4) and cast back to
double — exact, order-independent, and identical in DuckDB (see
reference_surface.sum_group_by note).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bighouse_spark.queries.registry import query, t


def _dsum(expr, alias: str, scale: int = 2):
    return F.sum(expr.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


# TPC-H Q1: pricing summary. Full scan + hash aggregate — the
# map-side-combine shape that scales linearly at 100 TB.
@query(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1(spark, sf_dir):
    from bighouse_spark.operators.parallel import ensure_min_parallelism

    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # The fixture file is a single parquet row group → a one-task scan
    # whose partial decimal aggregation serializes ~2 s of CPU onto
    # one core of 32 (profiled r14: cpuMs≈runMs on the scan stage).
    # Guard input parallelism AFTER the pushed filter + early
    # projection so the adaptive repartition ships only the 6 needed
    # columns; deterministic full-row hash keying avoids round-robin's
    # map-side sort (guide §2.5). No-op on any well-split input — at
    # 100 TB the scan already fans out and this adds nothing.
    cols = [
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
    ]
    from bighouse_spark.sources.catalog import table_stats

    filtered = ensure_min_parallelism(
        li.where(
            F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
        ).select(cols),
        key_cols=cols,
        input_stats=table_stats(spark, sf_dir, "lineitem"),
    )
    return (
        filtered
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            # disc_price is exactly 4 decimal digits (2dp price × 2dp
            # discount) and charge exactly 6 — casts at those scales
            # never hit a rounding tie, so decimal sums are exact and
            # identical across engines.
            _dsum(disc_price, "sum_disc_price", 4),
            F.sum(charge.cast("decimal(24,6)")).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# TPC-H Q3 shape: 3-way join + group + top-k. customer is the small
# side → broadcast; orders⋈lineitem shuffles once on o_orderkey.
@query(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def tpch_q3(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    # NO parallelism guard here (r15, settling VERDICT r14 Next #3):
    # the r14 input-skew guard was a measured LOSS on q3 — interleaved
    # same-session A/B at sf0.1 (plans/r15/ab_q3_guard.py): guarded
    # min 1.165 / med 1.357 s vs unguarded min 0.945 / med 1.073 s
    # (14% steal window; the 29%-steal repeat agreed). q3's partial
    # aggregate is cheap (~0.7 s CPU) so the guard's extra exchange +
    # AQE stage cost more than the added parallelism buys — unlike
    # q1, where the decimal aggregate is ~3 s CPU and the guard wins
    # its A/B ~1.6x (plans/r15/ab_q1_guard.py).
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(
            orders.join(
                F.broadcast(cust), orders.o_custkey == cust.c_custkey
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                4,
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# TPC-H Q5 shape: 6-way star join. All dimensions broadcast; the only
# shuffle is lineitem⋈orders — the correct plan at any scale.
@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name
""",
)
def tpch_q5(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                4,
            )
        )
    )


# LEFT OUTER join with null-producing side aggregated.
@query(
    "join_left_outer",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n_orders,
       count(o_orderkey) AS n_matched
FROM orders LEFT JOIN customer
  ON o_custkey = c_custkey AND c_acctbal > 5000
GROUP BY c_mktsegment
""",
)
def join_left_outer(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey) & (cust.c_acctbal > 5000),
            "left",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("o_orderkey").alias("n_matched"),
        )
    )


# LEFT SEMI join (EXISTS) — customers having at least one urgent order.
@query(
    "join_semi",
    oracle="""
SELECT count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
)
def join_semi(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(
            urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
        ).agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(F.col("c_acctbal"), "sum_bal"),
        )
    )


# LEFT ANTI join (NOT EXISTS) — parts that were never ordered.
@query(
    "join_anti",
    oracle="""
SELECT count(*) AS n_parts, min(p_partkey) AS min_partkey
FROM part WHERE NOT EXISTS (
  SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
""",
)
def join_anti(spark, sf_dir):
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("min_partkey"),
    )


# Set operations: UNION / INTERSECT / EXCEPT (ALL-variants exercised
# in tests). Nation keys present among customers vs suppliers.
@query(
    "set_union",
    oracle="""
SELECT nk FROM (
  SELECT c_nationkey AS nk FROM customer
  UNION
  SELECT s_nationkey AS nk FROM supplier) u
""",
)
def set_union(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nk FROM customer
INTERSECT
SELECT s_nationkey AS nk FROM supplier
""",
)
def set_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
SELECT p_partkey AS pk FROM part
EXCEPT
SELECT l_partkey AS pk FROM lineitem
""",
)
def set_except(spark, sf_dir):
    # subtract == EXCEPT DISTINCT (exceptAll is multiset difference).
    p = t(spark, sf_dir, "part").select(F.col("p_partkey").alias("pk"))
    li = t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("pk"))
    return p.subtract(li)


# Window: top-2 orders per customer (row_number with unique tiebreak).
@query(
    "window_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) x
WHERE rn <= 2
""",
)
def window_topk_per_group(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# Window: running cumulative sum + lag delta over a time series.
@query(
    "window_running_sum",
    oracle="""
SELECT event_id, user_id,
       CAST(sum(CAST(value AS DECIMAL(18,4)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
         AS running_value,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS n_so_far
FROM events WHERE user_id < 10
""",
)
def window_running_sum(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = t(spark, sf_dir, "events").where(F.col("user_id") < 10)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


# ROLLUP — hierarchical subtotals (grouping() id distinguishes the
# all-NULL subtotal rows from genuine NULL keys).
@query(
    "rollup_agg",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*) AS cnt,
       grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def rollup_agg(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
            F.grouping("l_returnflag").cast("bigint").alias("g_rf"),
            F.grouping("l_linestatus").cast("bigint").alias("g_ls"),
        )
    )


# CUBE — all grouping combinations.
@query(
    "cube_agg",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       grouping(o_orderstatus) AS g_st, grouping(o_orderpriority) AS g_pr
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def cube_agg(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.grouping("o_orderstatus").cast("bigint").alias("g_st"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_pr"),
        )
    )


# GROUPING SETS via SQL.
@query(
    "grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
)
def grouping_sets(spark, sf_dir):
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# HAVING — post-aggregation filter.
@query(
    "having_filter",
    oracle="""
SELECT o_custkey, count(*) AS n_orders
FROM orders GROUP BY o_custkey HAVING count(*) >= 3
""",
)
def having_filter(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 3)
    )


# DISTINCT projection.
@query(
    "distinct_projection",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_projection(spark, sf_dir):
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# Scalar function library sweep: string/date/math functions folded
# into aggregates so the result is small and deterministic.
@query(
    "scalar_functions",
    oracle="""
SELECT
  count(DISTINCT upper(substr(o_orderpriority, 1, 1))) AS n_pri_initials,
  CAST(min(length(o_orderstatus)) AS BIGINT) AS min_status_len,
  CAST(sum(year(o_orderdate)) AS BIGINT) AS sum_year,
  CAST(sum(month(o_orderdate)) AS BIGINT) AS sum_month,
  CAST(sum(CAST(abs(CAST(o_totalprice AS DECIMAL(18,2))) >= 1000 AS BIGINT)) AS BIGINT) AS n_big,
  max(concat(o_orderstatus, '-', o_orderpriority)) AS max_concat
FROM orders
""",
)
def scalar_functions(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count_distinct(
            F.upper(F.substring("o_orderpriority", 1, 1))
        ).alias("n_pri_initials"),
        F.min(F.length("o_orderstatus")).cast("bigint").alias("min_status_len"),
        F.sum(F.year("o_orderdate")).alias("sum_year"),
        F.sum(F.month("o_orderdate")).alias("sum_month"),
        F.sum(
            (
                F.abs(F.col("o_totalprice").cast("decimal(18,2)"))
                >= 1000
            ).cast("bigint")
        ).alias("n_big"),
        F.max(
            F.concat(
                F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")
            )
        ).alias("max_concat"),
    )


# CASE WHEN conditional aggregation.
@query(
    "case_when_agg",
    oracle="""
SELECT
  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
  count(*) AS cnt
FROM lineitem
""",
)
def case_when_agg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum(
            F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
        ).alias("n_high_disc"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("n_returned"),
        F.count(F.lit(1)).alias("cnt"),
    )


# Scalar subquery — orders above the global average price.
@query(
    "scalar_subquery",
    oracle="""
SELECT count(*) AS n_above_avg FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
""",
)
def scalar_subquery(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("__sq_orders")
    return spark.sql(
        """
        SELECT count(*) AS n_above_avg FROM __sq_orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM __sq_orders)
        """
    )


# Explode/unnest — word frequencies across documents (ClickHouse
# arrayJoin analog; SURVEY.md §2.C array functions).
@query(
    "explode_word_freq",
    oracle="""
SELECT w AS word, count(*) AS freq
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY w ORDER BY freq DESC, word ASC LIMIT 20
""",
)
def explode_word_freq(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(20)
    )
