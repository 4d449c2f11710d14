"""Driver-checkable round-trips THROUGH the ClickHouse-dialect
frontend: each query here is written in CH SQL, transpiled, and
executed by Spark, with a DuckDB oracle in plain ANSI SQL — so the
dialect rewrite layer itself (renames, combinators, parametrics,
contextual rewrites) gets rows+schema+hash driver verification, not
just unit tests on the rewritten text.

The fixture view is registered under a query-local name to avoid
colliding with attached tables in a shared session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.dialect.transpile import transpile
from bighouse_spark.queries.registry import query, t


def _ch(spark, sf_dir, table: str, view: str, ch_sql: str):
    t(spark, sf_dir, table).createOrReplaceTempView(view)
    return spark.sql(transpile(ch_sql, spark).sql)


# CH spellings exercised: count(), countIf, sumIf, any, uniqExact,
# if(), toStartOfMonth — the reference's dashboard-query vocabulary.
@query(
    "dialect_agg_roundtrip",
    oracle="""
SELECT event_type,
       count(*) AS n,
       count(*) FILTER (WHERE value > 0.5) AS n_big,
       CAST(sum(CAST(value AS DECIMAL(18,4))) FILTER (WHERE value > 0.5)
            AS DOUBLE) AS sum_big,
       count(DISTINCT user_id) AS uniq_users
FROM events GROUP BY event_type
""",
)
def dialect_agg_roundtrip(spark, sf_dir):
    return _ch(
        spark,
        sf_dir,
        "events",
        "__dq_events",
        """
        SELECT event_type,
               count() AS n,
               countIf(value > 0.5) AS n_big,
               CAST(sumIf(CAST(value AS DECIMAL(18,4)), value > 0.5)
                    AS DOUBLE) AS sum_big,
               uniqExact(user_id) AS uniq_users
        FROM __dq_events GROUP BY event_type
        """,
    )


# topK exact twin + position/extract/range contextual rewrites, all
# flowing through one CH query; DuckDB recomputes the top-3 most
# frequent event types (ties asc) with window SQL.
@query(
    "dialect_topk_roundtrip",
    oracle="""
WITH c AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY event_type
), r AS (
  SELECT event_type,
         row_number() OVER (ORDER BY n DESC, event_type ASC) AS rn
  FROM c
)
SELECT array_to_string(list(event_type ORDER BY rn), ',') AS top3,
       CAST(3 AS BIGINT) AS n_top
FROM r WHERE rn <= 3
""",
)
def dialect_topk_roundtrip(spark, sf_dir):
    out = _ch(
        spark,
        sf_dir,
        "events",
        "__dq_events_tk",
        "SELECT topK(3)(event_type) AS topk FROM __dq_events_tk",
    )
    return out.select(
        F.array_join("topk", ",").alias("top3"),
        F.size("topk").cast("bigint").alias("n_top"),
    )


# LIMIT BY + ORDER BY through the dialect: top-2 orders by price per
# priority class (deterministic tiebreak on o_orderkey).
@query(
    "dialect_limit_by_roundtrip",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rn
  FROM orders
) WHERE rn <= 2
""",
)
def dialect_limit_by_roundtrip(spark, sf_dir):
    return _ch(
        spark,
        sf_dir,
        "orders",
        "__dq_orders",
        """
        SELECT o_orderpriority, o_orderkey, o_totalprice
        FROM __dq_orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 2 BY o_orderpriority
        """,
    )


# ARRAY JOIN clause + splitByChar through the dialect: word
# frequencies over the documents table, the CH spelling of
# explode_word_freq. Deterministic top-10 (count desc, word asc).
@query(
    "dialect_array_join_roundtrip",
    oracle="""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT word, count(*) AS n FROM w GROUP BY word
ORDER BY n DESC, word ASC LIMIT 10
""",
)
def dialect_array_join_roundtrip(spark, sf_dir):
    return _ch(
        spark,
        sf_dir,
        "documents",
        "__dq_docs",
        """
        SELECT word, count() AS n
        FROM (SELECT splitByChar(' ', text) AS ws FROM __dq_docs)
        ARRAY JOIN ws AS word
        GROUP BY word
        ORDER BY n DESC, word ASC
        LIMIT 10
        """,
    )
