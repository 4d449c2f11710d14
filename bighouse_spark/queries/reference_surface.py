"""SURVEY.md §2.B — the SQL surface the reference demonstrably
exercises, re-phrased over the fixture tables.

Reference query corpus: ``temporal/workflow_query_executor_test.go:
41-71,75``, ``README.md:43-59,86-121,148-163``, ``run.sh:17``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.functions.hashing import row_md5, table_checksum
from bighouse_spark.queries.registry import query, t
from bighouse_spark.sources.readers import with_file_column


# B7: SELECT count() FROM s3(...) — the NYC-taxi headline query
# (reference README.md:148-163).
@query(
    "count_star",
    oracle="SELECT count(*) AS cnt FROM lineitem",
)
def count_star(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


# B6+B10: GROUP BY _file virtual column (reference
# workflow_query_executor_test.go:42-49).
@query(
    "count_by_file",
    oracle=(
        "SELECT count(*) AS cnt, 'lineitem.parquet' AS _file "
        "FROM lineitem GROUP BY _file"
    ),
)
def count_by_file(spark, sf_dir):
    df = with_file_column(t(spark, sf_dir, "lineitem"))
    return df.groupBy("_file").agg(F.count(F.lit(1)).alias("cnt")).select(
        "cnt", "_file"
    )


# B8+B10: sum() GROUP BY — the github_events headline query
# `SELECT sum(commits), event_type ... GROUP BY event_type`
# (reference workflow_query_executor_test.go:75, README.md:43).
@query(
    "sum_group_by",
    oracle=(
        "SELECT event_type, "
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value, "
        "count(*) AS cnt FROM events GROUP BY event_type"
    ),
)
def sum_group_by(spark, sf_dir):
    # Double sums are order-dependent in the last ulps; summing as
    # decimal(18,4) is exact and engine-independent (each double→
    # decimal rounding is tie-free: x.00005 is not binary-representable).
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


# B9: uniq() — exact twin for the oracle check
# (reference README.md:57,66-79).
@query(
    "uniq_exact",
    oracle=(
        "SELECT count(DISTINCT user_id) AS uniq_users, "
        "count(DISTINCT event_type) AS uniq_types FROM events"
    ),
)
def uniq_exact(spark, sf_dir):
    return t(spark, sf_dir, "events").agg(
        F.count_distinct("user_id").alias("uniq_users"),
        F.count_distinct("event_type").alias("uniq_types"),
    )


# B9 approximate flavor (HLL-class, like CH `uniq`). No oracle —
# approx result; driver records rows-only. Bounded-error contract is
# tested in tests/ against the exact value.
@query("uniq_approx")
def uniq_approx(spark, sf_dir):
    return t(spark, sf_dir, "events").agg(
        F.approx_count_distinct("user_id").alias("approx_uniq_users")
    )


# B15: WHERE equality filter on string
# (reference workflow_query_executor.go:182, run.sh:5-6).
@query(
    "filter_eq",
    oracle=(
        "SELECT count(*) AS cnt, "
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value "
        "FROM events WHERE event_type = 'click'"
    ),
)
def filter_eq(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


# B12+B16: ORDER BY + LIMIT (reference test.go:49,70,98-105; run.sh:17).
# Deterministic: unique sort key (o_orderkey tiebreak).
@query(
    "order_limit",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"
    ),
)
def order_limit(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


# B14: arithmetic on aggregate — `count()+2`, the reference's own
# readiness probe (workflow_query_executor.go:182).
@query(
    "count_plus_two",
    oracle="SELECT count(*) + 2 AS cnt_plus_two FROM lineitem",
)
def count_plus_two(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").agg(
        (F.count(F.lit(1)) + F.lit(2)).alias("cnt_plus_two")
    )


# B11: SELECT * projection (reference run.sh:17) — full row set of a
# small table, deterministic because unordered-set compare.
@query(
    "select_star",
    oracle="SELECT * FROM region",
)
def select_star(spark, sf_dir):
    return t(spark, sf_dir, "region").select("*")


# B13: whole-table checksum, cross-engine-checkable flavor: md5 row
# fingerprint over integer/string columns (float formatting is not
# portable). Capability analog of `sum(cityHash64(*))`
# (reference README.md:106-121).
@query(
    "checksum_md5",
    oracle=(
        "SELECT count(DISTINCT md5(concat_ws('|', "
        "CAST(l_orderkey AS VARCHAR), CAST(l_partkey AS VARCHAR), "
        "CAST(l_suppkey AS VARCHAR), CAST(l_linenumber AS VARCHAR), "
        "l_returnflag, l_linestatus))) AS uniq_rows, "
        "count(*) AS cnt, "
        "min(md5(concat_ws('|', CAST(l_orderkey AS VARCHAR), "
        "CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR), "
        "CAST(l_linenumber AS VARCHAR), l_returnflag, l_linestatus))) "
        "AS min_hash FROM lineitem"
    ),
)
def checksum_md5(spark, sf_dir):
    cols = [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
    ]
    h = row_md5(cols)
    return t(spark, sf_dir, "lineitem").agg(
        F.count_distinct(h).alias("uniq_rows"),
        F.count(F.lit(1)).alias("cnt"),
        F.min(h).alias("min_hash"),
    )


# B13 fast path: xxhash64 whole-table checksum — the actual 100 TB
# scan-bandwidth query shape. Engine-specific hash → no oracle
# (rows-only check); stability is covered in tests/.
@query("checksum_xxhash64")
def checksum_xxhash64(spark, sf_dir):
    return table_checksum(t(spark, sf_dir, "lineitem"))
