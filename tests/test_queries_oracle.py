"""The t2-style gate, run locally: every registered query with an
oracle must match DuckDB exactly at sf0.01; oracle-less queries must
at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from bighouse_spark.queries import all_oracles, all_queries
from tests.conftest import SF_CORRECT
from tests.helpers import compare_frames

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    from bighouse_spark.operators.caching import release_tracked

    df = QUERIES[name](spark, SF_CORRECT)
    rel = duck.sql(ORACLES[name])
    try:
        compare_frames(df, rel)
    finally:
        release_tracked()


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, name):
    from bighouse_spark.operators.caching import release_tracked

    df = QUERIES[name](spark, SF_CORRECT)
    try:
        rows = df.collect()
        assert rows is not None
        assert len(df.columns) > 0
    finally:
        release_tracked()


def test_hugeint_lint_catches_uncast_sum(spark, duck):
    """compare_frames must REJECT an oracle whose integer sum was left
    uncast (DuckDB widens it to HUGEINT → driver typed-hash mismatch
    even with equal values; r6's only red row)."""
    df = spark.sql("SELECT CAST(1 AS BIGINT) AS s")
    rel = duck.sql("SELECT CAST(sum(x) AS HUGEINT) AS s FROM (SELECT 1 AS x)")
    with pytest.raises(AssertionError, match="HUGEINT"):
        compare_frames(df, rel)


def _assert_scalar_columns(schema, name: str) -> None:
    """Driver-window queries must export SCALAR columns only: the
    driver canonicalizes with pandas sort_values over all columns,
    which cannot factorize list/dict cells (TypeError: unhashable
    type) — r7's only red row, a0_dialect_summap_roundtrip, was an
    Array export. Flatten with array_join/to_json on BOTH sides."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for field in schema.fields:
        assert not isinstance(field.dataType, (ArrayType, MapType, StructType)), (
            f"DRIVER_WINDOW query {name!r} exports non-scalar column "
            f"{field.name!r} ({field.dataType.simpleString()}); the "
            "driver's pandas canonicalizer cannot sort list cells — "
            "flatten with array_join/to_json in query AND oracle"
        )


@pytest.mark.parametrize(
    "name", sorted(n for n in QUERIES if n.startswith("a0_"))
)
def test_driver_window_scalar_columns_lint(spark, name):
    """No DRIVER_WINDOW query may return an Array/Map/Struct column
    (schema-only check; plan is built, not executed)."""
    from bighouse_spark.operators.caching import release_tracked

    try:
        df = QUERIES[name](spark, SF_CORRECT)
        _assert_scalar_columns(df.schema, name)
    finally:
        release_tracked()


def test_scalar_lint_catches_array_column(spark):
    """The lint must REJECT an intentionally array-returning query."""
    df = spark.sql("SELECT array(1, 2) AS xs, 1 AS n")
    with pytest.raises(AssertionError, match="non-scalar"):
        _assert_scalar_columns(df.schema, "a0_fake_array_query")
    df2 = spark.sql("SELECT map('k', 1) AS m")
    with pytest.raises(AssertionError, match="non-scalar"):
        _assert_scalar_columns(df2.schema, "a0_fake_map_query")


def test_driver_window_rotation_shape():
    """The driver records the first 50 exported names alphabetically;
    the rotation must put exactly the intended 50 there, keep
    queries()/oracle_sql() keys consistent, and never lose a query."""
    from bighouse_spark.queries.registry import (
        _REGISTRY,
        DRIVER_WINDOW,
        exposed_name,
    )

    assert len(DRIVER_WINDOW) == 50
    assert DRIVER_WINDOW <= set(_REGISTRY), "rotation names must exist"
    first50 = sorted(QUERIES)[:50]
    assert all(n.startswith("a0_") for n in first50)
    assert {n[3:] for n in first50} == DRIVER_WINDOW
    # Exported keys map back to the same callables/oracles.
    assert len(QUERIES) == len(_REGISTRY)
    for name, rq in _REGISTRY.items():
        assert QUERIES[exposed_name(name)] is rq.fn
        if rq.oracle is not None:
            assert ORACLES[exposed_name(name)] == rq.oracle
