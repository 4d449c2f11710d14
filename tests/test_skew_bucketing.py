"""Skew salting + bucketed co-located joins: result equality with the
naive plan, and plan-shape assertions (salt spreads partitions;
bucketed join has no Exchange)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from bighouse_spark.operators.skew import salted_join, skew_safe_count_distinct
from bighouse_spark.sources.bucketing import bucketed_join, write_bucketed
from bighouse_spark.sources.catalog import load_table
from tests.conftest import SF_CORRECT


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture()
def skewed(spark):
    # 90% of fact rows share key 0 — the classic hot key.
    fact = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 2).alias("payload"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, skewed):
        fact, dim = skewed
        plain = fact.join(dim, "k").groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
        )
        salted = salted_join(fact, dim, "k", salts=8).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_left_join_preserves_unmatched(self, spark, skewed):
        fact, dim = skewed
        only_small_dim = dim.where(F.col("k") < 5)
        plain = fact.join(only_small_dim, "k", "left").where(
            F.col("name").isNull()
        )
        salted = salted_join(fact, only_small_dim, "k", salts=4, how="left").where(
            F.col("name").isNull()
        )
        assert plain.count() == salted.count() > 0

    def test_right_full_rejected(self, spark, skewed):
        # Unmatched dim rows would appear `salts` times under
        # right/full (dim is salt-replicated) — must raise, not
        # silently duplicate.
        fact, dim = skewed
        import pytest as _pytest

        from bighouse_spark.operators.skew import salted_join

        for how in ("right", "full", "right_outer", "full_outer"):
            with _pytest.raises(ValueError, match="salted_join"):
                salted_join(fact, dim, on="k", how=how)

    def test_salt_column_not_leaked(self, spark, skewed):
        fact, dim = skewed
        assert "__salt" not in salted_join(fact, dim, "k").columns


class TestSkewSafeDistinct:
    def test_matches_count_distinct(self, spark):
        ev = load_table(spark, SF_CORRECT, "events")
        plain = {
            (r.user_id, r.n)
            for r in ev.groupBy("user_id")
            .agg(F.countDistinct("event_type").alias("n"))
            .collect()
        }
        safe = {
            (r.user_id, r.n)
            for r in skew_safe_count_distinct(
                ev, "user_id", "event_type", alias="n"
            ).collect()
        }
        assert safe == plain


class TestBucketedJoin:
    def test_no_exchange_and_correct(self, spark):
        orders = load_table(spark, SF_CORRECT, "orders")
        lineitem = load_table(spark, SF_CORRECT, "lineitem")
        write_bucketed(
            orders.select("o_orderkey", "o_totalprice"),
            "t_bkt_orders", "o_orderkey", 8,
        )
        write_bucketed(
            lineitem.select(
                F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
            ),
            "t_bkt_lineitem", "o_orderkey", 8,
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # Disable broadcast so the planner must pick a shuffle-or-
            # bucketed join — the 100 TB fact-fact regime where
            # bucketing matters (neither side broadcastable).
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = bucketed_join(
                spark, "t_bkt_orders", "t_bkt_lineitem", "o_orderkey"
            )
            plan = _plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan, (
                "bucketed join must not shuffle either side"
            )
            expect = (
                orders.join(
                    lineitem, orders.o_orderkey == lineitem.l_orderkey
                ).count()
            )
            assert joined.count() == expect
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
            spark.sql("DROP TABLE IF EXISTS t_bkt_lineitem")
