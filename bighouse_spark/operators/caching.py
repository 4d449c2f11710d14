"""Scoped lifecycle for operator-internal persisted DataFrames.

Operators like ``minhash_lsh_pairs`` persist scratch tables (shingle
sets, signatures, inverted indexes) that multiple branches of one
query plan re-read. Left unreleased, every call through a long-lived
session (the server path, a bench loop, the pytest session) pins more
executor storage — unbounded growth and eviction churn at scale.

``tracked_persist`` registers each persist; ``release_tracked``
unpersists everything registered by the calling thread. Callers that
own a materialization boundary (engine.execute's ``finally``, the
bench loop, the oracle-test fixture) release after the action
completes — unpersist is safe then: collected results never recompute,
and an un-materialized plan simply recomputes without the cache.

Concurrency model: Spark's CacheManager keys cache entries by PLAN,
not by DataFrame object — two server threads running the same
operator over the same table share ONE cache entry. A naive
per-thread ``df.unpersist()`` therefore yanks the shared entry while
the other request is mid-execution (observed as ``CacheManager: Data
has already been cached`` warnings followed by an orphaned
re-materialized RDD that no one releases — a real storage leak caught
by ``test_server.py``'s concurrent stress test). The fix is
process-wide refcounting keyed by the plan's ``semanticHash``: the
first ``tracked_persist`` of a plan persists it, later ones bump a
refcount, and only the LAST ``release_tracked`` referencing the plan
actually unpersists.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

# semanticHash -> list of [DataFrame, refcount] buckets; guarded by
# _REG_LOCK. A LIST per hash because semanticHash is a 32-bit hash,
# not an equality proof: entry reuse additionally requires
# df.sameSemantics(entry df) (the check Spark's own CacheManager
# performs), so a hash collision degrades to a second persist instead
# of silently returning another plan's DataFrame.
_REGISTRY: dict[int, list] = {}
_REG_LOCK = threading.Lock()

# Per-thread list of registry keys this thread's request registered.
_LOCAL = threading.local()


def _tracked() -> list[tuple[int, int]]:
    lst = getattr(_LOCAL, "keys", None)
    if lst is None:
        lst = _LOCAL.keys = []
    return lst


def _callbacks() -> list:
    lst = getattr(_LOCAL, "callbacks", None)
    if lst is None:
        lst = _LOCAL.callbacks = []
    return lst


def tracked_callback(cb) -> None:
    """Register an arbitrary release callback run (once) by this
    thread's next ``release_tracked()``. Used for storage that is NOT
    a plain DataFrame persist — e.g. the RDD behind a
    ``localCheckpoint``, which ``clearCache()`` cannot see and which
    otherwise lingers in executor storage until GC. Callbacks run
    after the DataFrame unpersists; exceptions are swallowed.

    Caveat: a localCheckpoint's lineage is truncated, so its release
    callback must only run after the consumer has materialized its
    result — which is exactly the ``release_tracked()`` contract
    (engine ``finally``, oracle-test ``finally``, bench loop)."""
    _callbacks().append(cb)


def tracked_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` (or join an existing persist of the same plan)
    and register it for this thread's next ``release_tracked()``."""
    try:
        key = df.semanticHash()
    except Exception:
        # No session / analysis failure: fall back to object identity
        # (never shared, so plain refcount-of-one semantics).
        key = id(df)
    with _REG_LOCK:
        buckets = _REGISTRY.setdefault(key, [])
        entry = None
        for b in buckets:
            try:
                if df is b[0] or df.sameSemantics(b[0]):
                    entry = b
                    break
            except Exception:
                continue
        if entry is None:
            df = df.persist()
            entry = [df, 1]
            buckets.append(entry)
        else:
            # Same plan already persisted by a concurrent (or earlier
            # same-thread) request: share its entry — calling persist
            # again would only trip CacheManager warnings.
            entry[1] += 1
            df = entry[0]
    _tracked().append((key, id(entry[0])))
    return df


def release_tracked() -> int:
    """Release every persist tracked on THIS thread; a shared plan is
    only unpersisted when its last referencing request releases.
    Returns the number of actual unpersists. Idempotent; exceptions
    from already-stopped sessions are swallowed — release must never
    mask a query error."""
    lst = _tracked()
    keys, lst[:] = lst[:], []
    cbs = _callbacks()
    callbacks, cbs[:] = cbs[:], []
    n = 0
    with _REG_LOCK:
        for key, df_id in keys:
            buckets = _REGISTRY.get(key)
            if not buckets:
                continue
            entry = next(
                (b for b in buckets if id(b[0]) == df_id), None
            )
            if entry is None:
                continue
            entry[1] -= 1
            if entry[1] <= 0:
                buckets.remove(entry)
                if not buckets:
                    del _REGISTRY[key]
                try:
                    # Blocking: a request boundary is exactly where
                    # deterministic release matters — non-blocking
                    # unpersist leaves blocks (and getPersistentRDDs
                    # entries) draining asynchronously, which reads as
                    # a leak to any observer that checks right after.
                    entry[0].unpersist(blocking=True)
                    n += 1
                except Exception:
                    pass
    for cb in callbacks:
        try:
            cb()
            n += 1
        except Exception:
            pass
    return n
