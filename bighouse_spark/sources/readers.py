"""Schema-on-read sources — the ``s3()/s3Cluster()/url()/urlCluster()``
capability (reference ``temporal/workflow_query_executor_test.go:41-70``,
``README.md:148-163``).

In the reference these ClickHouse table functions distribute file
splits across cluster nodes; Spark's file sources do that natively
(splits → tasks), so ``s3Cluster``'s ``{cluster}`` macro is vacuous
here. What we provide:

* format-dispatching reader with explicit-or-inferred schema
  (CSVWithNames ≈ ``header=True``; bare CSV schema strings parsed by
  ``dialect.schema``),
* glob support including ``{a..b}`` numeric ranges (expanded by
  ``dialect.globs`` before hitting the Hadoop FS),
* the ``_file`` virtual column (reference groups by it,
  ``workflow_query_executor_test.go:42-49``).

At 100 TB the scan plan matters more than anything else in this file:
always pass an explicit schema for CSV (inference is a full extra
scan), and keep projections/filters on the DataFrame so Catalyst
pushes them into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

FILE_COLUMN = "_file"


def with_file_column(df: DataFrame, column: str = FILE_COLUMN) -> DataFrame:
    """Attach the source-file basename of each row.

    ClickHouse's ``_file`` virtual column is the file name without the
    directory; ``F.input_file_name()`` returns the full URI, so take
    the last path segment. Evaluated at scan time — no shuffle.
    """
    return df.withColumn(
        column, F.element_at(F.split(F.input_file_name(), "/"), -1)
    )


def read_source(
    spark: SparkSession,
    paths: str | list[str],
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    header: bool = True,
    compression: str | None = None,
    add_file_column: bool = False,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read files of ``fmt`` from one or more (glob) paths.

    Maps the reference's table-function matrix:

    * ``s3(url, 'CSVWithNames', schema, 'gzip')`` →
      ``read_source(spark, url, 'csv', schema, header=True,
      compression='gzip')``
    * ``s3Cluster('{cluster}', ...)`` → identical (Spark distributes
      splits natively)
    * parquet with inferred schema → ``read_source(spark, url)``
    """
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read
    if schema is not None:
        if isinstance(schema, str):
            from bighouse_spark.dialect.schema import parse_schema_string

            schema = parse_schema_string(schema)
        reader = reader.schema(schema)
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", str(header).lower())
        if schema is None:
            opts.setdefault("inferSchema", "true")
        if compression:
            opts.setdefault("compression", compression)
    df = reader.format(fmt).options(**opts).load(paths)
    if add_file_column:
        df = with_file_column(df)
    return df
