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


def ensure_min_parallelism(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition iff the DataFrame has fewer partitions
    than the session's default parallelism. ``factor`` adds headroom
    for uneven per-row cost (long docs cluster in one chunk)."""
    spark = df.sparkSession
    want = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want * factor)
    return df
