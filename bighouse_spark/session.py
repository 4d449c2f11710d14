"""SparkSession lifecycle — the engine's "ephemeral cluster".

The reference spins up one ClickHouse cluster per query (Fly machine
fan-out in ``SpawnNodes``, reference
``temporal/workflow_query_executor.go:118-163``) and tears it down
after (``DeleteNodes``, ``:346-355``). Its own benchmarks show that
per-query coordination overhead *regresses* fast queries (reference
``README.md:58,104``), so the Spark-idiomatic mapping is a warm,
shared ``SparkSession`` whose parallelism is tuned per workload via
confs rather than machine counts.

Scale posture (100 TB / 1000-executor design targets):

* AQE on — runtime coalescing of shuffle partitions and skew-join
  splitting replace hand-tuned ``max_parallel_replicas``.
* ``spark.sql.shuffle.partitions`` defaults to cores locally but is a
  per-workload knob; at cluster scale AQE's coalescing makes a high
  initial value safe.
* File-split sizing (``spark.sql.files.maxPartitionBytes``) is left at
  128 MiB so a 100 TB scan fans out to ~800k tasks, which the Spark
  scheduler handles; do NOT collapse scans into fewer, larger splits.
* Arrow enabled for the Pandas-UDF paths used by the dedup /
  similarity / multimodal operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Runtime re-planning: partition coalescing + skew-join handling.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batching for every pandas_udf / mapInPandas operator.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast small dimension tables (region/nation/supplier class).
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    # Columnar writes mirror the reference's LZ4/ZSTD storage codecs
    # (reference ch/config.xml:1128-1144).
    "spark.sql.parquet.compression.codec": "zstd",
    # Timestamps in the fixtures are TZ-naive (CH DateTime semantics);
    # pin the session to UTC so results don't depend on host TZ.
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": "8g",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "bighouse-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Get-or-create the shared session.

    ``cpus``/``shuffle_partitions`` are the Spark analog of the
    reference's ``NumNodes``/``Cores`` request knobs
    (``temporal/workflow_query_executor.go:30-35``).
    """
    cpus = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
    )
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Teardown — the analog of ``DeleteNodes`` (reference
    ``temporal/workflow_query_executor.go:346-355``)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
