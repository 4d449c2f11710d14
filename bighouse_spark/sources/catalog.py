"""Table catalog over parquet directories.

The reference "attaches" shared tables from object storage (ATTACH
over a web disk, reference
``temporal/workflow_query_executor_test.go:85``); the Spark analog is
a catalog of parquet locations registered as temp views so every
query sees the same named tables cluster-wide (``ON CLUSTER`` DDL is
vacuous in Spark — the catalog already is cluster-wide).
"""

from __future__ import annotations

import os
import threading
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as TIMESTAMP(NANOS) in the fixtures. Spark has no
# nanosecond timestamp type; read them as long and truncate to
# microseconds (identical to DuckDB's ns→µs handling).
_NANOS_TS_COLS = {"events": ("ts",)}

# Attach-once relation memo (optimization r14, guide §7.3 — driver-side
# work). Every ``spark.read.parquet`` call runs a schema-inference job
# (footer read) plus py4j plan construction; a query like tpch_q8 loads
# 8 tables, so the bench paid ~8 driver jobs per run re-deriving
# metadata for immutable fixture files. The reference ATTACHes shared
# tables once per cluster (workflow_query_executor_test.go:85) — the
# Spark analog is reusing the analyzed base relation per session.
# ONLY metadata/plan is reused: no rows, no results — every action
# still scans the parquet input. Safe because the catalog serves the
# fixed read-only fixture set exclusively (engine-managed mutable
# tables read their own roots directly, never through here). Keyed
# weakly by session so a stopped session's relations are dropped.
_RELATION_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)
_MEMO_LOCK = threading.Lock()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Parquet is self-describing, so schema
    inference is exact and column pruning / predicate pushdown reach
    the scan (the MergeTree-column-file analog)."""
    # The memo serves the fixed read-only fixture set exclusively
    # (ADVICE r14: an unknown name must not silently capture a stale
    # file listing for some other table family).
    assert name in TABLES, f"unknown catalog table {name!r}"
    key = (os.path.abspath(sf_dir), name)
    with _MEMO_LOCK:
        cached = _RELATION_MEMO.get(spark, {}).get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    with _MEMO_LOCK:
        _RELATION_MEMO.setdefault(spark, {})[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    for c in nanos_cols:
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    # Normalize timestamp flavor: fixture writers vary between
    # nanos-as-long, µs TZ-aware, and µs TZ-naive encodings. The
    # session TZ is pinned UTC, so NTZ→TIMESTAMP is value-preserving,
    # and downstream event-time ops (withWatermark, unix_millis)
    # require TIMESTAMP — mirroring CH's encoding-agnostic DateTime
    # ingestion (temporal/workflow_query_executor_test.go:44,85).
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(
                field.name, F.col(field.name).cast(TimestampType())
            )
    return df


# Scan-layout metadata memo, sibling of the relation memo above and
# under the same attach-once contract (metadata only, immutable fixture
# files, weakly keyed by session). ``ensure_min_parallelism`` used to
# re-derive the input partition count per query construction via
# ``df.rdd.getNumPartitions()`` — a full analyze+optimize+physical-plan
# pass of the subtree, ~70 ms of driver time per guarded query build
# (VERDICT r14 Next #2). A projection/filter over a catalog table has
# exactly the base scan's partitioning, so the count is a property of
# (session confs, table files): derive it once per (session, sf_dir,
# table) and hand it to the guard as a hint.
_STATS_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def table_stats(spark: SparkSession, sf_dir: str, name: str) -> tuple[int, int]:
    """(file_bytes, scan_partitions) for one catalog table.

    ``file_bytes`` is the on-disk parquet size (the same quantity
    Catalyst's relation statistics start from); ``scan_partitions`` is
    the actual partition count of the base scan under this session's
    split confs, probed once per session and memoized. Valid for any
    narrow (filter/project) derivation of the table, which is every
    ``ensure_min_parallelism`` call site."""
    assert name in TABLES, f"unknown catalog table {name!r}"
    key = (os.path.abspath(sf_dir), name)
    with _MEMO_LOCK:
        cached = _STATS_MEMO.get(spark, {}).get(key)
    if cached is not None:
        return cached
    nbytes = os.path.getsize(os.path.join(sf_dir, f"{name}.parquet"))
    parts = load_table(spark, sf_dir, name).rdd.getNumPartitions()
    stats = (nbytes, parts)
    with _MEMO_LOCK:
        _STATS_MEMO.setdefault(spark, {})[key] = stats
    return stats


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql``
    entry points (the ATTACH path, SURVEY.md §2 B5)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
