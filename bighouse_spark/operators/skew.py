"""Skew mitigation: salted joins and skew-safe exact distinct.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on
by default in our session) is the FIRST line of defense — it needs no
code and re-splits oversized partitions at runtime. These operators
cover the cases AQE can't:

* ``salted_join`` — when one join key holds a double-digit percentage
  of the fact table (AQE splits partitions, but a single hot KEY still
  lands in one partition per split limit), or in stream-static joins
  where AQE doesn't apply. The dim side is replicated ``salts``×, the
  fact side salted by a content hash; the hot key spreads over
  ``salts`` reducers. Cost: dim side grows ``salts``× — keep the
  replicated side small (it's the same constraint as broadcasting,
  relaxed by a factor of cluster memory / salts).
* ``skew_safe_count_distinct`` — exact per-key distinct via the
  two-level (key, value) → key decomposition: the first shuffle keys
  on (key, value) pairs which distribute even when one key dominates;
  the second aggregates pre-deduped counts. Spark's partial
  aggregation already makes plain sums/counts skew-tolerant; DISTINCT
  is the aggregate that isn't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over ``salts``
    reducers. Output is identical to ``fact.join(dim, on, how)`` for
    ``how`` in {inner, left, left_semi, left_anti}; the salt column
    never escapes.

    right/full joins are rejected: the dim side is replicated
    ``salts``×, so every UNMATCHED dim row would surface ``salts``
    times in right/full output — silently duplicated rows. (Matched
    rows are fine under any ``how``: each fact row carries exactly one
    salt value.)

    The fact-side salt is a content hash (deterministic, no RNG state
    in the plan) — any assignment works for correctness since the dim
    side carries every salt value.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched "
            f"dim-side rows {salts}x (dim is salt-replicated); "
            f"use one of {sorted(allowed)} or a plain join"
        )
    salt_src: list[Column] = [F.col(c) for c in fact.columns]
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.abs(F.xxhash64(*salt_src)), F.lit(salts))
    )
    dim_s = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<bigint>")),
    )
    out = fact_s.join(dim_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def skew_safe_count_distinct(
    df: DataFrame, key: str, value: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact ``count(DISTINCT value) GROUP BY key`` as two keyed
    shuffles, neither of which concentrates a hot key's values on one
    reducer."""
    return (
        df.select(key, value)
        .distinct()  # shuffle 1: (key, value) — spreads hot keys
        .groupBy(key)  # shuffle 2: counts per key (tiny rows)
        .agg(F.count(F.lit(1)).alias(alias))
    )
