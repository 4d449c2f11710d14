from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bighouse_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # UI off for the test session: no test reads the web UI, and the
    # per-query SQL-tab bookkeeping costs a measured ~5% of the
    # suite's per-statement floor (interleaved fresh-process A/B,
    # min-of-12 batteries: 1.04/1.69/1.20 s vs 1.21/1.73/1.25 s).
    s = get_spark(
        app_name="bighouse-tests", cpus=8, shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    conn = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    yield conn
    conn.close()
