"""Safe splicing of names and literals into parsed SQL strings.

The r15 construction fast paths build ``selectExpr``/``F.expr``
strings instead of column-DSL trees; any USER-SUPPLIED column name
interpolated into such a string must be quoted with embedded
backticks doubled (Spark's identifier escape), and any double value
must render through ``double_lit`` (bare ``repr`` emits ``nan`` /
``inf``, which do not parse) — the DSL forms these strings replaced
handled any name and any float.
"""

from __future__ import annotations

import math


def quote_ident(name: str) -> str:
    """``name`` → `` `name` `` with embedded backticks doubled."""
    return "`" + name.replace("`", "``") + "`"


def double_lit(x: float) -> str:
    """Exact SQL double literal: ``repr`` round-trips finite doubles
    bit-exactly; non-finite values need the cast spelling."""
    x = float(x)
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(x):
        return "CAST('%sInfinity' AS DOUBLE)" % ("-" if x < 0 else "")
    return f"{x!r}D"
