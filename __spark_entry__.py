"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``bighouse_spark.queries`` — the named-query
registry where every implemented operator from SURVEY.md §2 (plus the
training-data extension ops) lives with its Spark implementation and,
where SQL-expressible, its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from bighouse_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing
    summary (scan → filter → hash-aggregate, the shape the reference's
    headline benchmark exercises — sum()/GROUP BY over a fact table,
    reference README.md:43-50)."""
    from bighouse_spark.queries.registry import get

    return get("tpch_q1_pricing_summary").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for engine-specific
    hash/LSH ops → driver records the weaker rows-only check)."""
    return all_oracles()
