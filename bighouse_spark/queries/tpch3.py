"""TPC-H q2 / q11 / q16 / q20 / q21 — the five queries round 1 left
blocked on missing fixture columns (``tpch2.py`` header), unblocked
via a deterministic synthesized ``partsupp`` and a derived lateness
predicate. Completes the 22-query TPC-H surface implied by the
reference's full-ClickHouse-SQL delegation (``ch/Dockerfile:1``,
SURVEY.md §2.C).

``partsupp`` synthesis (closed-form, seedless, computed identically
in Spark and in each oracle's WITH clause so both engines see the
exact same table):

    for each p_partkey, i in {0,1,2,3}:
      ps_suppkey          = (p_partkey*7 + i*13) % count(supplier)
      ps_availqty         = (p_partkey*31 + i*17) % 9999 + 1
      ps_supplycost_cents = (p_partkey*59 + i*29) % 92500 + 25000
      ps_supplycost       = cents / 100.0

Fixture suppkeys are 0-based contiguous, so the modulo lands on real
suppliers; 13·{1,2,3} is non-zero mod any fixture supplier count
(10/100/1000), so each part gets 4 distinct suppliers. Money math
that feeds comparisons or aggregates uses ``ps_supplycost_cents``
(exact BIGINT) so double summation order can never flip a HAVING
boundary or a rounded output between engines.

q21's missing commit/receipt dates are derived:
``late := (l_orderkey*7 + l_linenumber*3) % 30 >= 20`` — a
deterministic per-line delay standing in for
``l_receiptdate > l_commitdate``; join topology (EXISTS /
NOT EXISTS over other suppliers in the same order) is the real
TPC-H shape.

Scale notes (100 TB posture): partsupp is 4×|part| — dimension-sized,
generated scan-side with zero shuffle (explode of a 4-literal array);
every supplier/nation/region join broadcasts; the only wide shuffles
are lineitem aggregates keyed on their group keys, and q21's
semi/anti self-joins key on l_orderkey (natural co-partitioning).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.queries.registry import query, t

# DuckDB twin of synth_partsupp(); prepended to each oracle.
PARTSUPP_CTE = """
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 7 + gen.i * 13)
           % (SELECT count(*) FROM supplier) AS ps_suppkey,
         (p_partkey * 31 + gen.i * 17) % 9999 + 1 AS ps_availqty,
         (p_partkey * 59 + gen.i * 29) % 92500 + 25000
           AS ps_supplycost_cents,
         CAST(((p_partkey * 59 + gen.i * 29) % 92500 + 25000) / 100.0
              AS DOUBLE) AS ps_supplycost
  FROM part CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) gen
)
"""


def synth_partsupp(spark, sf_dir):
    """The Spark side of the synthesis above. One narrow scan of
    part (key column only) + a broadcast scalar supplier count —
    no shuffle, partition-preserving, dimension-sized output."""
    p = t(spark, sf_dir, "part").select("p_partkey")
    s_cnt = (
        t(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("__s_cnt"))
    )
    pk, i = F.col("p_partkey"), F.col("i")
    cents = (pk * 59 + i * 29) % 92500 + 25000
    return (
        p.crossJoin(F.broadcast(s_cnt))
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("i"),
            "__s_cnt",
        )
        .select(
            pk.alias("ps_partkey"),
            ((pk * 7 + i * 13) % F.col("__s_cnt")).alias("ps_suppkey"),
            ((pk * 31 + i * 17) % 9999 + 1).alias("ps_availqty"),
            cents.alias("ps_supplycost_cents"),
            (cents / 100.0).cast("double").alias("ps_supplycost"),
        )
    )


# Q2 minimum-cost supplier: for each qualifying part, the EUROPE
# supplier(s) offering it at the region-wide minimum cost. Original
# output columns p_mfgr/s_address/s_phone/s_comment don't exist in
# the fixtures → p_type stands in; the correlated-min subquery +
# 5-way join shape is intact. Cost equality compares exact cents.
@query(
    "tpch_q2_min_cost_supplier",
    oracle="WITH "
    + PARTSUPP_CTE
    + """,
europe AS (
  SELECT s_suppkey, s_acctbal, s_name, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
       p_partkey, p_type
FROM part
JOIN partsupp ON p_partkey = ps_partkey
JOIN europe ON ps_suppkey = s_suppkey
WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
  AND ps_supplycost_cents = (
    SELECT min(ps2.ps_supplycost_cents)
    FROM partsupp ps2 JOIN europe e2 ON ps2.ps_suppkey = e2.s_suppkey
    WHERE ps2.ps_partkey = part.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def tpch_q2(spark, sf_dir):
    p = t(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    ps = synth_partsupp(spark, sf_dir)
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    europe = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eu_ps = ps.join(
        F.broadcast(europe), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    # Decorrelated min: per-part minimum cents among EUROPE suppliers,
    # broadcast back (dimension-sized) — no per-row re-execution.
    min_cost = eu_ps.groupBy(F.col("ps_partkey").alias("__mc_pk")).agg(
        F.min("ps_supplycost_cents").alias("__min_cents")
    )
    return (
        eu_ps.join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(F.broadcast(min_cost), F.col("__mc_pk") == F.col("ps_partkey"))
        .where(F.col("ps_supplycost_cents") == F.col("__min_cents"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# Q11 important stock: per-part inventory value within one nation,
# HAVING above a fraction of the nation total (scalar subquery).
# All value math in exact cents; /100 only at the output edge.
@query(
    "tpch_q11_important_stock",
    oracle="WITH "
    + PARTSUPP_CTE
    + """,
natsupp AS (
  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS val_cents
  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT ps_partkey,
       CAST(sum(val_cents) / 100.0 AS DOUBLE) AS value
FROM natsupp
GROUP BY ps_partkey
HAVING sum(val_cents) > (SELECT sum(val_cents) * 0.005 FROM natsupp)
ORDER BY value DESC, ps_partkey
""",
)
def tpch_q11(spark, sf_dir):
    ps = synth_partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    natsupp = (
        ps.join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias(
                "val_cents"
            ),
        )
    )
    per_part = natsupp.groupBy("ps_partkey").agg(
        F.sum("val_cents").alias("__sum_cents")
    )
    total = natsupp.agg(
        (F.sum("val_cents") * 0.005).alias("__threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("__sum_cents") > F.col("__threshold"))
        .select(
            "ps_partkey",
            (F.col("__sum_cents") / 100.0).cast("double").alias("value"),
        )
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


# Q16 parts/supplier relationship: distinct-supplier counts per
# (brand, type, size) bucket, excluding flagged suppliers. The
# original excludes comment LIKE '%Customer%Complaints%'; fixtures
# have no s_comment → negative account balance stands in (same
# NOT-IN-subquery shape → broadcast anti-join).
@query(
    "tpch_q16_part_supplier_relation",
    oracle="WITH "
    + PARTSUPP_CTE
    + """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#23' AND p_type <> 'MEDIUM'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND ps_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def tpch_q16(spark, sf_dir):
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    flagged = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        synth_partsupp(spark, sf_dir)
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            F.broadcast(flagged),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.count_distinct("ps_suppkey")
            .cast("bigint")
            .alias("supplier_cnt")
        )
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# Q20 potential part promotion: suppliers in one region holding
# excess stock (availqty > 50% of a year's shipped quantity) of
# promotable parts. The correlated sum subquery decorrelates into a
# keyed aggregate joined on (partkey, suppkey); an empty-group sum is
# NULL in the original (comparison false) ≡ inner join here.
# l_quantity is integral in the fixtures so the double sum is exact.
@query(
    "tpch_q20_excess_stock",
    oracle="WITH "
    + PARTSUPP_CTE
    + """,
shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
     JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT ps_suppkey
    FROM partsupp
    JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%') red
         ON red.p_partkey = ps_partkey
    JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    WHERE ps_availqty > 0.5 * qty)
ORDER BY s_name
""",
)
def tpch_q20(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    red = (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    excess = (
        synth_partsupp(spark, sf_dir)
        .join(F.broadcast(red), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi"
        )
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_name")
    )


# Q21 suppliers who kept orders waiting: within finished ('F')
# multi-supplier orders, count lines where THIS supplier was late and
# no other supplier in the order was. Lateness derived (module
# docstring); the EXISTS → left-semi / NOT EXISTS → left-anti pair
# both key on l_orderkey, so the three lineitem legs co-partition on
# the same shuffle key (AQE reuses the exchange).
@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
WITH others AS (
  SELECT l_orderkey, l_suppkey,
         (l_orderkey * 7 + l_linenumber * 3) % 30 >= 20 AS late
  FROM lineitem
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_5'
  AND (l1.l_orderkey * 7 + l1.l_linenumber * 3) % 30 >= 20
  AND EXISTS (SELECT 1 FROM others l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM others l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
)
def tpch_q21(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 3) % 30 >= 20
    l1 = (
        li.where(late)
        .select("l_orderkey", "l_suppkey")
        .alias("l1")
    )
    others = li.select(
        F.col("l_orderkey").alias("o_ok"),
        F.col("l_suppkey").alias("o_sk"),
        late.alias("o_late"),
    )
    l2 = others.alias("l2")
    l3 = others.where(F.col("o_late")).alias("l3")
    same_order_other_supp = lambda side: (  # noqa: E731
        (F.col("l1.l_orderkey") == F.col(f"{side}.o_ok"))
        & (F.col("l1.l_suppkey") != F.col(f"{side}.o_sk"))
    )
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    n = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        l1.join(l2, same_order_other_supp("l2"), "left_semi")
        .join(l3, same_order_other_supp("l3"), "left_anti")
        .join(o, F.col("l1.l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
