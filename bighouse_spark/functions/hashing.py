"""Row hashing / whole-table checksums.

The reference's heaviest benchmark is ``SELECT sum(cityHash64(*))`` —
a full-table checksum used to prove scan bandwidth (reference
``README.md:59,106-121``). Capability parity is "any deterministic
64-bit row hash aggregated over the table"; bit-compatibility with
CityHash64 is explicitly out of scope (SURVEY.md §2 B13).

Two flavors:

* ``row_hash`` — ``xxhash64`` over all columns: JVM-side, codegen'd,
  the fast path for checksumming 100 TB (no Python in the loop).
* ``row_md5`` — md5 of a canonical string encoding: slower, but
  reproducible in any engine (DuckDB oracle uses the identical
  expression), used for cross-engine-checkable fingerprints and
  exact dedup keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_hash(df: DataFrame, cols: list[str] | None = None) -> Column:
    """64-bit row hash over ``cols`` (default: every column), the
    ``cityHash64(*)`` capability. Stays inside whole-stage codegen."""
    cols = cols or df.columns
    return F.xxhash64(*[F.col(c) for c in cols])


def row_md5(cols: list[str], sep: str = "|") -> Column:
    """Cross-engine-reproducible row fingerprint: md5 of the
    ``sep``-joined string casts of ``cols``. Keep to int/string/date
    columns — float formatting differs across engines."""
    return F.md5(F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]))


def table_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """``SELECT sum(cityHash64(*))`` analog: one-row checksum of the
    whole table. Sum in unbounded decimal to avoid overflow semantics
    differences (CH wraps UInt64; Spark long would overflow-error under
    ANSI)."""
    h = row_hash(df, cols)
    return df.select(
        F.sum(h.cast("decimal(38,0)")).alias("checksum"),
        F.count(F.lit(1)).alias("row_count"),
    )
