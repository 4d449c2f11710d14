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
    df = QUERIES[name](spark, SF_CORRECT)
    rel = duck.sql(ORACLES[name])
    compare_frames(df, rel)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
