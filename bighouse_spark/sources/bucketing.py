"""Bucketed (pre-partitioned) tables for shuffle-free co-located joins.

The reference's ATTACHed MergeTree table declares ``ORDER BY
(event_type, repo_name, created_at)`` (reference
``temporal/workflow_query_executor_test.go:85``) — a physical layout
chosen for the query pattern. Spark's analog is bucketing: write both
fact tables hash-bucketed on the join key, and a later equi-join on
that key needs NO exchange on either side — the join that would
otherwise shuffle 100 TB twice becomes a zipped per-bucket merge.

The write itself pays one shuffle (that's the point: pay it once at
ingest, not per query). ``sortBy`` within buckets additionally enables
sort-merge without a sort step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table (parquet)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_by)
    writer = writer.sortBy(sort_by or bucket_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.
    With matching bucket counts Catalyst plans a SortMergeJoin with no
    Exchange on either side (verified in tests by plan inspection)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
