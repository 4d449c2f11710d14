"""Scoped lifecycle for operator-internal persisted DataFrames.

Operators like ``minhash_lsh_pairs`` persist scratch tables (shingle
sets, signatures, inverted indexes) that multiple branches of one
query plan re-read. Left unreleased, every call through a long-lived
session (the server path, a bench loop, the pytest session) pins more
executor storage — unbounded growth and eviction churn at scale.

``tracked_persist`` registers each persist in a module-level list;
``release_tracked`` unpersists everything registered. Callers that
own a materialization boundary (engine.execute's ``finally``, the
bench loop, the oracle-test fixture) release after the action
completes — unpersist is safe then: collected results never recompute,
and an un-materialized plan simply recomputes without the cache.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for later ``release_tracked()``."""
    df = df.persist()
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame (blocking=False); returns the
    number released. Idempotent; exceptions from already-stopped
    sessions are swallowed — release must never mask a query error."""
    with _LOCK:
        dfs, _TRACKED[:] = _TRACKED[:], []
    n = 0
    for df in dfs:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
