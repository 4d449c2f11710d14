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
