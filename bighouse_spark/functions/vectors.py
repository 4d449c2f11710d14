"""Vector math over ``array<float>`` embedding columns.

JVM-side column expressions (``zip_with`` + ``aggregate``) — no Python
round-trip — so similarity scans stay inside codegen and scale
linearly with executors. Inputs are cast to double before arithmetic
so results match engines that compute in float64 (the DuckDB oracle).

When inputs are plain column NAMES each helper is built as ONE
``F.expr`` SQL string rather than the Python higher-order-function
DSL: building ``aggregate``/``zip_with`` via ``F.aggregate``/
``F.zip_with`` costs ~100 py4j round trips per lambda
(UnresolvedNamedLambdaVariable plumbing), which dominated ANN query
*construction* time (profiled r15: ~0.5 s per ``ivf_topk`` build of
which cosine_similarity alone was ~0.2 s). The SQL string parses in a
single round trip to the identical expression tree — same semantics,
same physical plan, ~100x less driver chatter per call. Column-object
inputs (no reliable Column→SQL in Spark 4) keep the DSL path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bighouse_spark.functions.identifiers import quote_ident


def _dbl(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def _dbl_sql(name: str) -> str:
    return f"CAST({quote_ident(name)} AS ARRAY<DOUBLE>)"


def dot(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"aggregate(zip_with({_dbl_sql(a)}, {_dbl_sql(b)}, "
            f"(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
        )
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(
            f"sqrt(aggregate({_dbl_sql(a)}, 0.0D, (acc, x) -> acc + x * x))"
        )
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        sa, sb = _dbl_sql(a), _dbl_sql(b)
        return F.expr(
            f"aggregate(zip_with({sa}, {sb}, (x, y) -> x * y), 0.0D, "
            f"(acc, x) -> acc + x) / "
            f"(sqrt(aggregate({sa}, 0.0D, (acc, x) -> acc + x * x)) * "
            f"sqrt(aggregate({sb}, 0.0D, (acc, x) -> acc + x * x)))"
        )
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
