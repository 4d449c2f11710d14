"""Window-function breadth: lag/lead, ranking family (dense_rank,
percent_rank, ntile, cume_dist), first/last with explicit frames, and
RANGE-frame aggregation — the full §2.C window family beyond the
row_number/topk/running-sum cases in ``relational.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bighouse_spark.queries.registry import query, t


@query(
    "window_lag_lead",
    oracle="""
SELECT event_id, user_id,
       lag(event_type) OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       CAST(round(value - lag(value) OVER w, 6) AS DOUBLE) AS value_delta
FROM events
WHERE user_id < 5
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_lag_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf_dir, "events").where(F.col("user_id") < 5)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.col("value") - F.lag("value").over(w), 6)
        .cast("double")
        .alias("value_delta"),
    )


@query(
    "window_rank_family",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       dense_rank() OVER w AS drank,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS prank,
       round(cume_dist() OVER w, 6) AS cdist
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
)
def window_rank_family(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    o = t(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "window_first_last_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_order,
       CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
FROM orders
WHERE o_custkey < 30
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_first_last_frame(spark, sf_dir):
    w_ord = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    o = t(spark, sf_dir, "orders").where(F.col("o_custkey") < 30)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w_ord).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_custkey"))
        .alias("n_orders"),
    )


@query(
    "window_range_frame",
    oracle="""
SELECT o_orderkey, o_totalprice,
       CAST(count(*) OVER (ORDER BY o_totalprice
            RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_within_1000
FROM orders WHERE o_custkey < 20
""",
)
def window_range_frame(spark, sf_dir):
    # RANGE frame over a value ordering — each row counts orders
    # within $1000 below its price (a sliding value-window).
    w = Window.orderBy("o_totalprice").rangeBetween(-1000, Window.currentRow)
    o = t(spark, sf_dir, "orders").where(F.col("o_custkey") < 20)
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_1000"),
    )


@query(
    "array_functions",
    oracle="""
SELECT doc_id,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_words,
       list_sort(list_distinct(string_split(text, ' ')))[1] AS first_word_sorted,
       CAST(list_contains(string_split(text, ' '), 'data') AS BOOLEAN) AS has_data,
       CAST(coalesce(nullif(list_position(string_split(text, ' '), 'data'), 0), 0) AS BIGINT)
         AS data_pos,
       array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3), ',')
         AS top3_sorted
FROM documents WHERE doc_id < 100
""",
)
def array_functions(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    words = F.split("text", " ")
    dwords = F.array_distinct(words)
    sorted_words = F.sort_array(dwords)
    return docs.select(
        "doc_id",
        F.size(dwords).cast("bigint").alias("n_distinct_words"),
        F.element_at(sorted_words, 1).alias("first_word_sorted"),
        F.array_contains(words, "data").alias("has_data"),
        F.array_position(words, "data").cast("bigint").alias("data_pos"),
        F.array_join(F.slice(sorted_words, 1, 3), ",").alias("top3_sorted"),
    )
