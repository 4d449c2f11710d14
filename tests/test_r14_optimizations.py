"""Focused regression guards for the round-14 optimizations.

Each optimization that changed an operator's internals gets a pin
here: the catalog relation memo (metadata-only reuse, never results),
the deterministic-key parallelism guard, the single-ArrowEvalPython
IVF corpus side, and the trimmed funnel / pre-aggregated Q13 plan
shapes. Values are proven elsewhere (test_queries_oracle.py); these
prove the *mechanism* survives refactors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.queries.registry import get
from bighouse_spark.sources.catalog import (
    _RELATION_MEMO,
    load_table,
)
from tests.conftest import SF_CORRECT


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestCatalogRelationMemo:
    def test_same_table_returns_memoized_relation(self, spark):
        a = load_table(spark, SF_CORRECT, "orders")
        b = load_table(spark, SF_CORRECT, "orders")
        assert a is b  # the analyzed relation is reused, no re-read

    def test_distinct_tables_and_dirs_miss(self, spark):
        a = load_table(spark, SF_CORRECT, "orders")
        assert load_table(spark, SF_CORRECT, "customer") is not a
        assert load_table(spark, "/root/testdata/sf0.001", "orders") is not a

    def test_memo_is_metadata_only(self, spark):
        """The memo must reuse the PLAN, never rows: no cache node may
        appear — every action re-scans the parquet input (the no-
        result-caching rule of the bench contract)."""
        plan = physical_plan(load_table(spark, SF_CORRECT, "orders"))
        assert "InMemoryTableScan" not in plan
        assert "InMemoryRelation" not in plan
        assert "Scan parquet" in plan

    def test_memo_keyed_per_session(self, spark):
        load_table(spark, SF_CORRECT, "orders")
        assert spark in _RELATION_MEMO
        # keys are (abspath, name) so relative/absolute spellings share
        key_names = {k[1] for k in _RELATION_MEMO[spark]}
        assert "orders" in key_names


class TestParallelismGuardKeyCols:
    def test_key_cols_hash_partitions_deterministically(self, spark):
        from bighouse_spark.operators.parallel import ensure_min_parallelism

        df = spark.range(0, 10_000).withColumn(
            "payload", F.concat(F.lit("x" * 64), F.col("id"))
        ).coalesce(1)
        # small bytes_per_partition so the size cap does not collapse
        # the tiny test table back to one partition
        out = ensure_min_parallelism(df, key_cols=["id"], bytes_per_partition=4096)
        assert out.rdd.getNumPartitions() > 1
        # the repartition key is the deterministic synthetic hash, not
        # round-robin (which pays sortBeforeRepartition per map task)
        plan = physical_plan(out)
        assert "xxhash64" in plan
        assert "REPARTITION_BY_NUM" in plan
        # row set preserved exactly
        assert out.count() == 10_000
        assert (
            out.agg(F.sum("id")).collect()[0][0]
            == df.agg(F.sum("id")).collect()[0][0]
        )

    def test_noop_when_already_split(self, spark):
        from bighouse_spark.operators.parallel import ensure_min_parallelism

        df = spark.range(0, 1000).repartition(256)
        # already above the size-capped target: returned unchanged,
        # no extra exchange at scale (the 100 TB no-op contract)
        assert ensure_min_parallelism(df, key_cols=["id"]) is df


class TestR14PlanShapes:
    def test_ann_ivf_single_corpus_python_eval(self, spark):
        """The corpus-side centroid-assignment pandas UDF must evaluate
        ONCE per vector: Catalyst used to push the join's isnotnull
        filter below the UDF, duplicating the ArrowEvalPython node
        (guide §4.4). Two total = one corpus `cell_of` + one query
        `probe_of`; three means the duplication is back."""
        plan = physical_plan(get("ann_ivf_topk").fn(spark, SF_CORRECT))
        assert plan.count("ArrowEvalPython") == 2
        assert "BatchEvalPython" not in plan

    def test_funnel_trimmed_scan_and_broadcast_count(self, spark):
        """Level-1 aggregation yields the user universe AND t1 in one
        pass; the old plan scanned events separately for `distinct
        user_id` and joined it back (8 scans / 7 broadcasts)."""
        plan = physical_plan(get("funnel_window_3step").fn(spark, SF_CORRECT))
        assert plan.count("Scan parquet") <= 6
        assert plan.count("BroadcastHashJoin") <= 5

    def test_q13_preaggregates_orders_before_join(self, spark):
        """Orders are counted per custkey BEFORE the customer join, so
        the join moves |custkey| partial counts instead of raw order
        rows: the broadcast build side must contain the aggregate."""
        plan = physical_plan(
            get("tpch_q13_customer_distribution").fn(spark, SF_CORRECT)
        )
        assert "SortMergeJoin" not in plan
        build_side = plan.split("BroadcastExchange", 1)[1]
        assert "HashAggregate" in build_side
        assert plan.count("Scan parquet") == 2
