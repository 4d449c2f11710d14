"""Aggregate-function breadth — the ClickHouse aggregate library the
reference delegates wholesale (SURVEY.md §2.C "full scalar/aggregate
function library"): statistical moments, exact percentiles, argMax/
argMin, conditional aggregates (countIf/sumIf ≈ FILTER clause),
collect_list/array_agg, correlation.

Float policy: exact-decimal sums where the input grid is decimal
(2dp money), round(…, 6) for genuinely-iterative statistics (stddev,
corr) whose cross-engine drift is ~1e-10 relative — far below the
rounding quantum.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.queries.registry import query, t


@query(
    "agg_stats_moments",
    oracle="""
SELECT l_returnflag,
       CAST(min(l_quantity) AS DOUBLE) AS min_qty,
       CAST(max(l_quantity) AS DOUBLE) AS max_qty,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       round(stddev_samp(l_quantity), 6) AS stddev_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       count(*) AS cnt
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_stats_moments(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "agg_percentiles",
    oracle="""
SELECT quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS median_qty,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS p25_price,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS p75_price,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99) AS p99_price
FROM lineitem
""",
)
def agg_percentiles(spark, sf_dir):
    # Exact interpolated percentile (CH quantileExact / quantile_cont
    # definition). At 100 TB use approx_percentile instead — exact
    # percentile must co-locate each group on one reducer.
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("p25_price"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("p75_price"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("p99_price"),
    )


# Approximate percentile (CH `quantile` / t-digest class). Algorithm-
# specific values → rows-only check; bounded error asserted in tests/.
@query("agg_percentile_approx")
def agg_percentile_approx(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile_approx(
            "l_extendedprice", F.lit([0.25, 0.5, 0.75]), F.lit(10000)
        ).alias("approx_quartiles")
    )


@query(
    "agg_argmax_argmin",
    oracle="""
SELECT event_type,
       arg_max(event_id, value) AS max_value_event,
       arg_min(event_id, value) AS min_value_event,
       CAST(max(value) AS DOUBLE) AS max_value
FROM events GROUP BY event_type
""",
)
def agg_argmax_argmin(spark, sf_dir):
    # CH argMax/argMin. value is a continuous double → ties have
    # probability ~0, so arg_max is deterministic here.
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", "value").alias("max_value_event"),
        F.min_by("event_id", "value").alias("min_value_event"),
        F.max("value").alias("max_value"),
    )


@query(
    "agg_conditional",
    oracle="""
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
       CAST(sum(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'purchase')
            AS DOUBLE) AS purchase_value,
       count(*) AS n_total
FROM events GROUP BY user_id
""",
)
def agg_conditional(spark, sf_dir):
    # CH countIf/sumIf → ANSI FILTER clause (Spark SQL supports it).
    t(spark, sf_dir, "events").createOrReplaceTempView("__agg_events")
    return spark.sql(
        """
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
               CAST(sum(CAST(value AS DECIMAL(18,4)))
                    FILTER (WHERE event_type = 'purchase') AS DOUBLE)
                 AS purchase_value,
               count(*) AS n_total
        FROM __agg_events GROUP BY user_id
        """
    )


@query(
    "agg_collect_sorted",
    oracle="""
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') AS nations
FROM nation GROUP BY n_regionkey
""",
)
def agg_collect_sorted(spark, sf_dir):
    # CH groupArray + arraySort. collect_list order is
    # nondeterministic; sort_array makes the result canonical, and
    # array_join flattens to a scalar so the driver's row comparator
    # (pandas sort_values, which can't hash list cells) can hash it.
    return (
        t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("n_name")), ","
            ).alias("nations")
        )
    )


@query(
    "agg_correlation",
    oracle="""
SELECT round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
       count(*) AS cnt
FROM lineitem
""",
)
def agg_correlation(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "agg_distinct_multi",
    oracle="""
SELECT count(DISTINCT o_custkey) AS n_custs,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(DISTINCT concat(o_orderstatus, '|', o_orderpriority)) AS n_status_pri
FROM orders
""",
)
def agg_distinct_multi(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count_distinct("o_custkey").alias("n_custs"),
        F.count_distinct("o_orderpriority").alias("n_priorities"),
        F.count_distinct("o_orderstatus", "o_orderpriority").alias(
            "n_status_pri"
        ),
    )


# CH quantileExactWeighted analog: weighted median via cumulative
# weight crossing half the total, per group. Weights are
# integer-valued doubles so cumulative sums are exact (no float-order
# ambiguity at the threshold) and ties in the value column collapse to
# the same answer regardless of intra-tie order — the result is
# engine-deterministic without any tiebreak column. The per-group sort
# is the unavoidable cost of an EXACT weighted quantile; the window
# runs after a narrow (group, value) shuffle and never materializes
# more than a partition.
@query(
    "agg_weighted_median",
    oracle="""
WITH w AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
         CAST(l_quantity AS DOUBLE) AS wt
  FROM lineitem
), c AS (
  SELECT l_returnflag, v,
         sum(wt) OVER (PARTITION BY l_returnflag ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         sum(wt) OVER (PARTITION BY l_returnflag) AS tw
  FROM w
)
SELECT l_returnflag, min(v) AS weighted_median
FROM c WHERE cw >= tw / 2 GROUP BY l_returnflag
""",
)
def agg_weighted_median(spark, sf_dir):
    from pyspark.sql import Window

    w = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("v"),
        F.col("l_quantity").cast("double").alias("wt"),
    )
    cum = Window.partitionBy("l_returnflag").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag",
        "v",
        F.sum("wt").over(cum).alias("cw"),
        F.sum("wt").over(tot).alias("tw"),
    )
    return (
        c.where(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(F.min("v").alias("weighted_median"))
    )


# CH `entropy` aggregate analog: Shannon entropy (log2) of the
# event-type and user distributions. Two tiny aggregations over the
# grouped counts; the global-window total runs over |distinct keys|
# rows, not the fact table.
@query(
    "agg_entropy",
    oracle="""
WITH c AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY event_type
), u AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
)
SELECT
  (SELECT round(sum(-(n / CAST(tot AS DOUBLE))
                * log2(n / CAST(tot AS DOUBLE))), 6)
   FROM c, (SELECT sum(n) AS tot FROM c)) AS type_entropy,
  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_types,
  (SELECT round(sum(-(n / CAST(tot AS DOUBLE))
                * log2(n / CAST(tot AS DOUBLE))), 6)
   FROM u, (SELECT sum(n) AS tot FROM u)) AS user_entropy
""",
)
def agg_entropy(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")

    def entropy(keyed, alias):
        counts = keyed.agg(F.count(F.lit(1)).alias("n"))
        tot = F.sum("n").over(Window.partitionBy())
        p = F.col("n") / tot
        return counts.select((-p * F.log2(p)).alias("h")).agg(
            F.round(F.sum("h"), 6).alias(alias)
        )

    te = entropy(ev.groupBy("event_type"), "type_entropy")
    ue = entropy(ev.groupBy("user_id"), "user_entropy")
    nt = (
        ev.select("event_type")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    )
    return te.crossJoin(nt).crossJoin(ue).select(
        "type_entropy", "n_types", "user_entropy"
    )


# Mergeable distinct-count sketches — the ClickHouse uniqState /
# uniqMerge (AggregatingMergeTree rollup) pattern. Level 1 builds one
# HLL sketch per (order-month, priority) partial; level 2 merges the
# partials per priority WITHOUT rescanning rows. At 100 TB this is the
# materialized-rollup shape: the expensive pass runs once, every
# coarser rollup is a cheap sketch-union over |groups| rows. Estimates
# are approximate -> rows-only driver check; tests assert ≤5% error vs
# the exact twin.
@query("uniq_state_merge_rollup")
def uniq_state_merge_rollup(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    partials = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.hll_sketch_agg("o_custkey").alias("sketch"))
    return (
        partials.groupBy("priority")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "approx_custs"
            )
        )
        .orderBy("priority")
    )


# CH `histogram(bins)(x)` analog with deterministic fixed-width
# buckets (CH's adaptive bin edges are engine-specific; fixed-width
# is the exact, engine-portable twin). One groupBy over a computed
# bucket key — partial-aggregated, single shuffle of |buckets| keys.
@query(
    "agg_histogram",
    oracle="""
SELECT CAST(floor((l_quantity - 1) / 5.0) AS INT) AS bucket,
       count(*) AS n,
       CAST(min(l_quantity) AS DOUBLE) AS lo,
       CAST(max(l_quantity) AS DOUBLE) AS hi
FROM lineitem GROUP BY bucket ORDER BY bucket
""",
)
def agg_histogram(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    bucket = F.floor((F.col("l_quantity") - 1) / 5.0).cast("int")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_quantity").cast("double").alias("lo"),
            F.max("l_quantity").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )
