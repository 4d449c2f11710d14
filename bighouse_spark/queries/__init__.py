"""Named query library — the driver-facing operator inventory.

Every implemented operator from SURVEY.md §2 (plus the training-data
extension ops) registers here as a named query with:

* a Spark implementation ``(spark, sf_dir) -> DataFrame``, and
* (when SQL-expressible) a DuckDB oracle SQL string computing the
  identical result on the same parquet tables.

``__spark_entry__.py`` re-exports this registry to the driver.
"""

from bighouse_spark.queries.registry import all_queries, all_oracles, get

# Side-effect imports: each module registers its queries.
from bighouse_spark.queries import (  # noqa: F401
    pipeline,
    aggregates,
    behavioral,
    checks,
    curation,
    dialectq,
    reference_surface,
    relational,
    relational2,
    sinkq,
    timeseries,
    textops,
    textops2,
    textops3,
    textquality,
    tpch2,
    tpch3,
    vectorops,
    windows2,
)

__all__ = ["all_queries", "all_oracles", "get"]
