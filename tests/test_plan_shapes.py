"""Plan-shape regression guards.

Correctness tests prove the values; these prove the PLAN stays the one
that scales — filters reaching the parquet scan, small dimensions
broadcast instead of shuffled, no stray exchanges appearing in ops
that advertise scan-side work. A refactor that silently flips a
broadcast join to sort-merge or drops a pushdown passes every value
check and then falls over at 100 TB; this file is where that noise
becomes a red test.
"""

from __future__ import annotations

import pytest

from bighouse_spark.queries.registry import get
from tests.conftest import SF_CORRECT


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlanShapes:
    def test_tpch_q6_pushdown_and_pruning(self, spark):
        plan = physical_plan(
            get("tpch_q6_forecast_revenue").fn(spark, SF_CORRECT)
        )
        assert "PushedFilters: [" in plan
        # Not `[]` — at least one predicate must reach the scan.
        assert "PushedFilters: []" not in plan
        # Column pruning: the 16-column lineitem scan must read only
        # the 4 columns q6 touches.
        read = plan.split("ReadSchema: ")[1].splitlines()[0]
        assert "l_comment" not in read and "l_orderkey" not in read

    def test_tpch_q3_broadcasts_dimensions(self, spark):
        plan = physical_plan(
            get("tpch_q3_shipping_priority").fn(spark, SF_CORRECT)
        )
        assert plan.count("BroadcastHashJoin") >= 1
        assert "SortMergeJoin" not in plan

    def test_cluster_assign_single_exchange(self, spark):
        plan = physical_plan(
            get("cluster_assign_topics").fn(spark, SF_CORRECT)
        )
        assert plan.count("Exchange") == 1

    def test_exact_dedup_single_shuffle(self, spark):
        plan = physical_plan(
            get("dedup_exact_groups").fn(spark, SF_CORRECT)
        )
        # One hash-partitioning exchange on the fingerprint key; a
        # second would mean the groupBy key diverged from the hash.
        assert plan.count("Exchange hashpartitioning") == 1

    def test_pii_redact_is_scan_side(self, spark):
        plan = physical_plan(get("text_pii_redact").fn(spark, SF_CORRECT))
        # Final one-row aggregate needs its exchange; the redaction
        # itself must add none beyond it.
        assert plan.count("Exchange") <= 1
        assert "BatchEvalPython" not in plan  # no row-at-a-time UDF

    def test_decontaminate_broadcasts_eval_side(self, spark):
        plan = physical_plan(
            get("curation_decontaminate").fn(spark, SF_CORRECT)
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan

    def test_chunking_is_narrow(self, spark):
        """Document chunking advertises zero-shuffle scan-side work:
        no Exchange may appear in its plan."""
        plan = physical_plan(
            get("curation_chunk_documents").fn(spark, SF_CORRECT)
            .limit(10)  # strip the final presentation sort
        )
        # the only allowed exchange is the orderBy's range partitioning;
        # everything before it must be generate/project over the scan
        before_sort = plan.split("Sort", 1)[0]
        assert "Exchange hashpartitioning" not in before_sort

    def test_bigram_fluency_no_cartesian(self, spark):
        plan = physical_plan(
            get("text_bigram_fluency").fn(spark, SF_CORRECT)
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_random_projection_zero_shuffle(self, spark):
        """Row-local integer math: nothing but scan -> project ->
        (presentation sort)."""
        plan = physical_plan(
            get("embedding_random_projection").fn(spark, SF_CORRECT)
        )
        assert "Exchange hashpartitioning" not in plan


class TestRound4PlanShapes:
    def test_gopher_rules_single_pruned_scan(self, spark):
        plan = physical_plan(get("text_gopher_rules").fn(spark, SF_CORRECT))
        assert plan.count("Scan parquet") == 1
        assert "PushedFilters: []" not in plan
        read = plan.split("ReadSchema: ")[1].splitlines()[0]
        assert "lang" not in read and "source" not in read
        assert "Exchange" not in plan  # pure scan-side column math
        assert "BatchEvalPython" not in plan

    def test_domain_cap_rank_pushdown(self, spark):
        """row_number <= N must plan as WindowGroupLimit (partial
        top-K before the shuffle) — the skew defence for hot domains."""
        plan = physical_plan(get("curation_domain_cap").fn(spark, SF_CORRECT))
        assert "WindowGroupLimit" in plan
        assert plan.count("Exchange hashpartitioning") <= 2  # window + agg

    def test_tfidf_single_corpus_scan(self, spark):
        """tf, df, and n_docs all read the ONE persisted (doc, term)
        count table: three InMemoryTableScans over a single cache —
        the parquet text appearing only inside the cached relation's
        child description, which executes once to populate it."""
        from bighouse_spark.operators.caching import release_tracked

        try:
            plan = physical_plan(get("text_tfidf_topk").fn(spark, SF_CORRECT))
            assert plan.count("InMemoryTableScan") == 3
            assert "BroadcastHashJoin" in plan  # df joins broadcast
            assert "SortMergeJoin" not in plan
        finally:
            release_tracked()

    def test_simhash_plan_is_compact(self, spark):
        """The single-pass fold keeps the signature one expression —
        the old per-bit shape exploded into 64 filtered arrays and
        blew codegen; a compact plan has no fallback markers."""
        plan = physical_plan(get("dedup_simhash").fn(spark, SF_CORRECT))
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan

    def test_sink_reread_aggregates_pruned(self, spark):
        plan = physical_plan(
            get("sink_roundtrip_ordered").fn(spark, SF_CORRECT)
        )
        # The re-read scans only the 2 columns the aggregate touches.
        read = plan.split("ReadSchema: ")[1].splitlines()[0]
        assert "o_orderkey" not in read and "o_custkey" not in read

    def test_c4_filters_single_doc_shuffle(self, spark):
        plan = physical_plan(get("text_c4_filters").fn(spark, SF_CORRECT))
        # Line derivation + per-line predicates are scan-side column
        # expressions; only the doc_id aggregation may shuffle (partial
        # + final hash aggregate share one exchange).
        assert plan.count("Exchange hashpartitioning") == 1
        assert "CartesianProduct" not in plan
        read = plan.split("ReadSchema: ")[1].splitlines()[0]
        assert "lang" not in read and "source" not in read

    def test_semantic_dedup_joins_on_cluster_key(self, spark):
        plan = physical_plan(
            get("dedup_semantic_within_cluster").fn(spark, SF_CORRECT)
        )
        # The SemDeDup contract: candidate pairs come from a
        # cluster-key equi-join, never a corpus cross join — and the
        # pairwise step reads the rank-capped (keep-first-by-id)
        # member table, so a degenerate cluster stays bounded.
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "row_number" in plan  # the cluster-size cap window


class TestRound6PlanShapes:
    def test_tuple_in_expansion_reaches_the_scan(self, spark):
        # The field-wise tuple-IN expansion must stay a scan-side
        # filter (DataFilters on the parquet scan, pruned ReadSchema,
        # one aggregation exchange) — not a join or a post-shuffle
        # filter.
        plan = physical_plan(
            get("dialect_tuple_in_roundtrip").fn(spark, SF_CORRECT)
        )
        assert plan.count("Exchange hashpartitioning") == 1
        scan = plan.split("FileScan parquet")[1].splitlines()[0]
        assert "o_orderstatus" in scan and "o_orderpriority" in scan
        assert "1-URGENT" in scan  # the expanded predicate, scan-side
        read = plan.split("ReadSchema: ")[1].splitlines()[0]
        assert "o_totalprice" not in read and "o_custkey" not in read


def _ch_events_plan(spark, sql, view):
    """Transpile a CH-dialect query over the events fixture loaded
    as ``view`` and return its physical plan."""
    from bighouse_spark.dialect.transpile import transpile
    from bighouse_spark.sources.catalog import load_table

    load_table(spark, SF_CORRECT, "events").createOrReplaceTempView(view)
    return physical_plan(spark.sql(transpile(sql).sql))


class TestBehavioralFoldPlanShapes:
    """The windowFunnel/sequenceMatch SQL folds advertise ONE shuffle
    (the GROUP BY) with the condition pre-filter reaching the scan
    side; a refactor that adds a second exchange or lifts the filter
    above the aggregate would pass every value check and die at
    scale."""

    def _plan(self, spark, sql):
        return _ch_events_plan(spark, sql, "__ps_events")

    def test_window_funnel_single_shuffle(self, spark):
        plan = self._plan(
            spark,
            "SELECT user_id, windowFunnel(3600)(ts, "
            "event_type = 'view', event_type = 'click', "
            "event_type = 'purchase') AS lvl "
            "FROM __ps_events GROUP BY user_id",
        )
        assert plan.count("Exchange hashpartitioning") == 1

    def test_sequence_match_reach_fold_single_shuffle(self, spark):
        plan = self._plan(
            spark,
            "SELECT user_id, sequenceMatch('(?1)(?t<600)(?2)')(ts, "
            "event_type = 'view', event_type = 'click') AS m "
            "FROM __ps_events GROUP BY user_id",
        )
        assert plan.count("Exchange hashpartitioning") == 1


class TestFunnelEntryExplodeShapes:
    """Round-10 entry-explode refactor pins: the per-condition
    filter(array(...)) stays inside the aggregate projection (still
    ONE exchange), strict_order's cap-guard count() shares the same
    aggregate (no second exchange), and the strict modes add no
    exchange either."""

    def _plan(self, spark, sql):
        return _ch_events_plan(spark, sql, "__ps_events2")

    def test_strict_order_with_cap_single_shuffle(self, spark):
        plan = self._plan(
            spark,
            "SELECT user_id, windowFunnel(3600, 'strict_order')(ts, "
            "event_type = 'view', event_type = 'click') AS lvl "
            "FROM __ps_events2 GROUP BY user_id",
        )
        assert plan.count("Exchange hashpartitioning") == 1

    def test_strict_modes_composed_single_shuffle(self, spark):
        plan = self._plan(
            spark,
            "SELECT user_id, windowFunnel(3600, 'strict_increase', "
            "'strict_deduplication')(ts, event_type = 'view', "
            "event_type = 'click', event_type = 'purchase') AS lvl "
            "FROM __ps_events2 GROUP BY user_id",
        )
        assert plan.count("Exchange hashpartitioning") == 1
