"""Input-parallelism guard for CPU-bound operators.

Spark parallelizes file scans by splitting files into
``maxPartitionBytes`` chunks — plenty of splits on a 100 TB corpus,
but a small single-file table (the local fixtures) yields ONE input
partition, serializing expression-heavy per-row work (shingling,
minhash, simhash, vector math) onto one core of 32.

``ensure_min_parallelism`` repartitions only when the plan's input
partitioning is below the cluster's default parallelism — a no-op at
scale (no extra shuffle on a well-split 100 TB input), a ~NĂ— speedup
on under-split inputs. Call it on the *narrowest* projection you can
(id + payload) so the shuffle moves minimal bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(
    df: DataFrame,
    factor: int = 2,
    bytes_per_partition: int = 256 << 10,
    key_cols: list[str] | None = None,
    input_stats: tuple[int, int] | None = None,
) -> DataFrame:
    """Repartition iff the DataFrame has fewer partitions than its
    data volume warrants. ``factor`` adds headroom over the default
    parallelism for uneven per-row cost (long docs cluster in one
    chunk).

    ``key_cols`` (r14): when given, repartition by a DETERMINISTIC
    synthetic key — ``xxhash64`` over those columns — instead of
    round-robin. Two wins (guide §2.5): round-robin pays a local sort
    of every map task's input (``sortBeforeRepartition``, required so
    retried tasks reproduce their row→partition assignment), which a
    deterministic hash key does not need; and the hash key stays
    retry-safe by construction. Pick columns that are unique-ish per
    row (an id, or the full projected column set) so the hash spreads
    evenly.

    The target is capped by the optimizer's size estimate: blowing a
    2 000-row table into 64 partitions costs more in task/Python-worker
    launch overhead than the parallelism buys (measured 3x on the IVF
    path, whose Arrow-batched UDF paid 64 worker spin-ups for one
    matmul of work). 256 KiB/partition keeps CPU-heavy per-row work
    (shingling ~1 µs/char) in ~0.25 s tasks — far above the ~10 ms
    task floor, far below a straggler.

    ``input_stats`` (r15): pre-derived ``(input_bytes, partitions)``
    for the df — for a narrow projection/filter of a catalog table,
    ``sources.catalog.table_stats``. When given, the guard makes its
    decision with ZERO extra plan work; without it, it falls back to
    probing the plan per call (an analyze+optimize pass for the size
    estimate plus a physical-plan pass for ``df.rdd``, ~70 ms of
    driver time per query construction — the r14 bench's largest
    per-guard overhead, VERDICT r14 Next #2)."""
    spark = df.sparkSession
    want = spark.sparkContext.defaultParallelism * factor
    if input_stats is not None:
        nbytes, nparts = input_stats
        want = max(1, min(want, -(-int(nbytes) // bytes_per_partition)))
    else:
        try:
            size = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            if 0 <= size < (1 << 40):  # unknown stats default to huge
                want = max(1, min(want, -(-size // bytes_per_partition)))
        except Exception:
            pass  # stats unavailable: keep the parallelism-based target
        nparts = df.rdd.getNumPartitions()
    if nparts < want:
        if key_cols:
            from pyspark.sql import functions as F

            return df.repartition(
                want, F.xxhash64(*[F.col(c) for c in key_cols])
            )
        return df.repartition(want)
    return df
