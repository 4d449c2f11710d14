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


def all_queries() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    return {
        name: rq.oracle
        for name, rq in sorted(_REGISTRY.items())
        if rq.oracle is not None
    }


def get(name: str) -> RegisteredQuery:
    return _REGISTRY[name]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand fixture-table loader used by every query module."""
    return load_table(spark, sf_dir, name)
