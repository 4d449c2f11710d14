"""bighouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
danthegoodman1/BigHouse ("serverless ClickHouse": ephemeral fan-out SQL
over object-storage data returning ``{cols, rows}``) on top of Apache
Spark. The reference delegates all relational work to a stock
ClickHouse server (reference ``ch/Dockerfile:1``); here the same role
is played by Spark SQL / Catalyst / Tungsten, so the engine consists
of:

* a session layer (``session.py``) — the Spark analog of the
  reference's ephemeral Fly.io cluster
  (``temporal/workflow_query_executor.go:118-163``),
* a ClickHouse-dialect frontend (``dialect/``) — table functions,
  schema strings, brace globs, function/type renames,
* source readers with virtual-column support (``sources/``),
* an operator library (``operators/``) covering the reference's SQL
  surface plus large-scale training-data ops (dedup, similarity
  search, text analysis, multimodal plumbing),
* a query lifecycle driver (``engine.py``) mirroring
  ``QueryExecutor`` (``temporal/workflow_query_executor.go:42-100``).
"""

from bighouse_spark.session import get_spark, stop_spark
from bighouse_spark.engine import BigHouseEngine, QueryRequest, QueryResult

__all__ = [
    "get_spark",
    "stop_spark",
    "BigHouseEngine",
    "QueryRequest",
    "QueryResult",
]

__version__ = "0.1.0"
