"""Driver-checkable contract summaries for the approximate operators.

Each approximate op keeps its natural-output registry query (driver
records rows-only), and gains a companion here that folds the op's
semantic contract — bounded error, recall floor, partition invariance
— into a scalar row: the exact components are recomputed by the DuckDB
oracle, the tolerance gates are booleans Spark derives from the
approx-vs-exact comparison. The driver's rows+schema+hash check then
verifies the contract end-to-end instead of only "it returned rows"
(VERDICT round-1 item 4).

Thresholds: recall floors are set at 0.25, under the weakest observed
value across sf0.001/sf0.01/sf0.1 at the registry parameters
(LSH 0.40/0.40/0.60, IVF 0.28/0.48/0.64 — chance line is ~1%) and far
enough below to absorb fixture regeneration; error tolerances mirror
the existing semantic tests (5% HLL, 2% t-digest at accuracy=10000).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.functions.hashing import table_checksum
from bighouse_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_ann_topk,
    pq_topk,
)
from bighouse_spark.queries.registry import query, t


# CH `uniq` ≈ exact: HLL++ estimate within 5% relative error
# (reference README.md:57 — `uniq(...)` over 5B rows is the headline
# approximate query; the error bound is the whole contract).
@query(
    "uniq_approx_check",
    oracle=(
        "SELECT count(DISTINCT user_id) AS exact_uniq_users, "
        "true AS within_5pct FROM events"
    ),
)
def uniq_approx_check(spark, sf_dir):
    agg = t(spark, sf_dir, "events").agg(
        F.count_distinct("user_id").alias("exact_uniq_users"),
        F.approx_count_distinct("user_id").alias("approx"),
    )
    rel_err = (
        F.abs(F.col("approx") - F.col("exact_uniq_users"))
        / F.col("exact_uniq_users")
    )
    return agg.select(
        "exact_uniq_users", (rel_err <= 0.05).alias("within_5pct")
    )


# CH `quantile` (t-digest class) vs exact interpolated percentile.
# The exact side is the oracle-checkable component (quantile_cont and
# Spark `percentile` share linear-interpolation semantics).
@query(
    "percentile_approx_check",
    oracle="""
SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS p25_exact,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS p50_exact,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS p75_exact,
       true AS within_2pct
FROM lineitem
""",
)
def percentile_approx_check(spark, sf_dir):
    agg = t(spark, sf_dir, "lineitem").agg(
        F.percentile("l_extendedprice", F.lit(0.25)).alias("p25_exact"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_exact"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("p75_exact"),
        F.percentile_approx(
            "l_extendedprice", F.lit([0.25, 0.5, 0.75]), F.lit(10000)
        ).alias("approx"),
    )

    def ok(exact_col: str, idx: int):
        appr = F.element_at(F.col("approx"), idx)
        return F.abs(appr - F.col(exact_col)) / F.col(exact_col) <= 0.02

    return agg.select(
        "p25_exact",
        "p50_exact",
        "p75_exact",
        (ok("p25_exact", 1) & ok("p50_exact", 2) & ok("p75_exact", 3)).alias(
            "within_2pct"
        ),
    )


def _recall_summary(exact, approx, floor: float):
    """One-row (n_queries, recall_floor_met) from two top-k frames."""
    hits = approx.select(
        "query_id", F.col("neighbor_id").alias("nb"), F.lit(1).alias("hit")
    )
    marked = exact.select(
        "query_id", F.col("neighbor_id").alias("nb")
    ).join(hits, ["query_id", "nb"], "left")
    return marked.agg(
        F.count_distinct("query_id").alias("n_queries"),
        (
            F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1)) >= floor
        ).alias("recall_floor_met"),
    )


# SRP-LSH ANN recall floor vs the exact top-k (the exact side's
# support — n_queries — is what DuckDB recomputes; the floor gate is
# the operator's semantic contract, also asserted in tests/).
@query(
    "ann_lsh_recall",
    oracle=(
        "SELECT count(*) AS n_queries, true AS recall_floor_met "
        "FROM embeddings WHERE vec_id < 5"
    ),
)
def ann_lsh_recall(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, q, k=5)
    approx = lsh_ann_topk(emb, q, k=5, bits=4, dim=64)
    return _recall_summary(exact, approx, floor=0.25)


# IVF partial-probe recall floor (exhaustive-probe exactness is
# already driver-checked by ann_ivf_full_probe; this covers the
# nprobe<n_cells scale path).
@query(
    "ann_ivf_recall",
    oracle=(
        "SELECT count(*) AS n_queries, true AS recall_floor_met "
        "FROM embeddings WHERE vec_id < 5"
    ),
)
def ann_ivf_recall(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, q, k=5)
    approx = ivf_topk(emb, q, k=5, n_cells=16, nprobe=4)
    return _recall_summary(exact, approx, floor=0.25)


# Product-quantization ANN recall floor (round 7): PQ codes +
# asymmetric-distance sweep + exact re-rank of the top k·8 ADC
# candidates. The memory-compression ANN tier — at 100 TB the sweep
# touches m-byte codes, not 4·dim-byte vectors. Floor 0.5 is a wide
# margin under the measured 0.96 recall at these defaults.
@query(
    "ann_pq_recall",
    oracle=(
        "SELECT count(*) AS n_queries, true AS recall_floor_met "
        "FROM embeddings WHERE vec_id < 5"
    ),
)
def ann_pq_recall(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, q, k=5)
    approx = pq_topk(emb, q, k=5, dim=64)
    return _recall_summary(exact, approx, floor=0.5)


# uniqState/uniqMerge rollup: per-group merged-sketch estimate within
# 5% of the per-group exact distinct the oracle recomputes. Verifies
# the mergeable-rollup shape (partials built per month, merged per
# priority without rescanning rows) group by group.
@query(
    "uniq_rollup_check",
    oracle="""
SELECT o_orderpriority AS priority,
       count(DISTINCT o_custkey) AS exact_custs,
       true AS within_5pct
FROM orders GROUP BY o_orderpriority
""",
)
def uniq_rollup_check(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    exact = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count_distinct("o_custkey").alias("exact_custs")
    )
    partials = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.hll_sketch_agg("o_custkey").alias("sketch"))
    merged = partials.groupBy("priority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_custs")
    )
    rel_err = (
        F.abs(F.col("approx_custs") - F.col("exact_custs"))
        / F.col("exact_custs")
    )
    return exact.join(merged, "priority").select(
        "priority", "exact_custs", (rel_err <= 0.05).alias("within_5pct")
    )


# sum(xxhash64(*)) is only a valid whole-table checksum if it is
# layout-independent — the property the reference relies on when it
# checksums the same data at different replica counts
# (README.md:106-121). Verify it: identical checksum from the natural
# scan and from a repartition(7) of the same rows.
@query(
    "checksum_invariance",
    oracle=(
        "SELECT count(*) AS row_count, true AS layout_invariant "
        "FROM lineitem"
    ),
)
def checksum_invariance(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    a = table_checksum(li).select(
        F.col("checksum").alias("c_a"), F.col("row_count").alias("row_count")
    )
    b = table_checksum(li.repartition(7)).select(
        F.col("checksum").alias("c_b")
    )
    return a.crossJoin(b).select(
        "row_count", (F.col("c_a") == F.col("c_b")).alias("layout_invariant")
    )
