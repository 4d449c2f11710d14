"""Backtick-quoting for column names spliced into parsed SQL strings.

The r15 construction fast paths build ``selectExpr``/``F.expr``
strings instead of column-DSL trees; any USER-SUPPLIED column name
interpolated into such a string must be quoted with embedded
backticks doubled (Spark's identifier escape), or a pathological
name containing a backtick turns into a parse error or resolves to
the wrong identifier — the DSL forms these strings replaced handled
any name.
"""

from __future__ import annotations


def quote_ident(name: str) -> str:
    """``name`` → `` `name` `` with embedded backticks doubled."""
    return "`" + name.replace("`", "``") + "`"
