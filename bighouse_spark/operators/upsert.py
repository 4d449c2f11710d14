"""Partitioned upsert (MERGE) into a parquet directory — the
building block for large-keyspace incremental materialization, where
the complete-mode overwrite of an aggregate MV stops scaling (a
per-user aggregate has billions of keys; rewriting all of them per
refresh is O(table)).

Shape: the target is partitioned by a hash bucket of the merge keys.
An incoming batch touches only its buckets: old rows of those
buckets are anti-joined on the keys (dropping superseded rows), the
union is written back with dynamic partition overwrite, and every
untouched bucket's files are not even read. Refresh cost is
O(batch + touched-bucket rows), independent of table size — with
``n_buckets`` sized so a bucket fits an executor's working set.

This is exactly Delta/Iceberg MERGE's copy-on-write strategy
re-expressed on plain parquet; what the table formats add is
snapshot isolation for concurrent readers (documented single-writer
here, like the engine's mutations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__bh_bucket"


def _with_bucket(df: DataFrame, keys: list[str], n_buckets: int) -> DataFrame:
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")
    )


def upsert_partitioned(
    spark: SparkSession,
    batch: DataFrame,
    target_dir: str,
    keys: list[str],
    n_buckets: int = 64,
) -> dict:
    """MERGE ``batch`` into ``target_dir`` on ``keys``: a key present
    in the batch replaces its target row; new keys append. Returns
    {"buckets_touched", "rows_written"}. Single-writer semantics."""
    import os

    batch = _with_bucket(batch, keys, n_buckets).persist()
    touched = [r[0] for r in batch.select(BUCKET_COL).distinct().collect()]
    # only buckets that already exist on disk need the merge read —
    # a brand-new bucket (or a brand-new table) is a plain write
    existing = [
        p
        for b in touched
        if os.path.isdir(p := f"{target_dir}/{BUCKET_COL}={b}")
    ]
    if existing:
        old = (
            spark.read.option("basePath", target_dir)
            .parquet(*existing)
            .join(batch.select(*keys).distinct(), keys, "left_anti")
        )
        merged = old.unionByName(batch)
    else:
        merged = batch
    n = merged.count()
    (
        merged.repartition(max(1, len(touched)), BUCKET_COL)
        .write.partitionBy(BUCKET_COL)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .save(target_dir)
    )
    batch.unpersist()
    return {"buckets_touched": len(touched), "rows_written": n}


def read_upserted(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the merged table (bucket column dropped)."""
    return spark.read.parquet(target_dir).drop(BUCKET_COL)
