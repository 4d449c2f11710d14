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

# Per-thread tracking: the server handles requests on separate
# threads, and operators persist on the thread that builds the plan —
# so releasing in one request's ``finally`` must not drop a
# concurrent request's scratch caches mid-flight (safe for
# correctness — Spark recomputes dropped blocks — but a silent
# recompute is exactly the perf hazard this module exists to avoid).
_LOCAL = threading.local()


def _tracked() -> list[DataFrame]:
    lst = getattr(_LOCAL, "dfs", None)
    if lst is None:
        lst = _LOCAL.dfs = []
    return lst


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for this thread's next
    ``release_tracked()``."""
    df = df.persist()
    _tracked().append(df)
    return df


def release_tracked() -> int:
    """Unpersist every DataFrame tracked on THIS thread
    (blocking=False); returns the number released. Idempotent;
    exceptions from already-stopped sessions are swallowed — release
    must never mask a query error."""
    lst = _tracked()
    dfs, lst[:] = lst[:], []
    n = 0
    for df in dfs:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
