"""Approximate-nearest-neighbor search over embedding columns.

Extension surface (nothing comparable in the reference). Two tiers:

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus, score JVM-side, per-query top-k via
  window. At 100 TB the corpus side never shuffles: score+partial-topk
  happen in the scan stage, and only ``queries × k`` candidate rows
  move (AQE sees the window's partial-rank pushdown via the
  ``row_number`` filter).
* ``lsh_ann_topk`` — random-hyperplane (SRP) LSH: corpus is bucketed
  by sign-pattern hash computed scan-side with fixed deterministic
  hyperplanes; queries probe only their own bucket(s). Trades recall
  for touching ~1/2^bits of the corpus — the scale path when the
  query set is itself large.

Hyperplanes are generated from a fixed seed so results are stable
across runs and partitions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bighouse_spark.functions.vectors import cosine_similarity
from bighouse_spark.operators.parallel import ensure_min_parallelism


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for each row of ``queries``.

    Returns (query_id, neighbor_id, rank, sim). Self-matches excluded.
    Similarity is rounded before ranking (ties broken by neighbor id)
    so rankings are reproducible across engines/float orders.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = ensure_min_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
        )
    )
    sim = cosine_similarity(F.col("__cvec"), F.col("__qvec"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def _srp_bucket(vec_col, planes: list[list[float]]):
    """Sign-random-projection bucket id: bit i = sign(v · plane_i).
    Computed with zip_with/aggregate — scan-side, no Python."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(
            F.zip_with(vec_col.cast("array<double>"), plane_arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
    tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: multi-table SRP LSH.

    ``tables`` independent hyperplane sets each bucket the corpus into
    2^bits cells; a (query, vector) pair becomes a candidate if they
    collide in ANY table — recall ≈ 1-(1-p^bits)^tables, the standard
    L-tables recall lever. Each query touches ~tables/2^bits of the
    corpus. Returns (query_id, neighbor_id, rank, sim).

    Scale shape: bucket keys are computed scan-side; the join shuffles
    (table, bucket) keys with the small query side broadcast, and the
    candidate set is deduped before scoring so a pair colliding in
    several tables is scored once.
    """

    def bucket_array(vec):
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    _srp_bucket(
                        vec, _hyperplanes(dim, bits, seed + t)
                    ).alias("bucket"),
                )
                for t in range(tables)
            ]
        )

    c = ensure_min_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
        )
    ).select(
        "neighbor_id",
        "__cvec",
        F.explode(bucket_array(F.col("__cvec"))).alias("__bk"),
    ).select("neighbor_id", "__cvec", "__bk.tbl", "__bk.bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode(bucket_array(F.col(vec_col))).alias("__bk"),
    ).select("query_id", "__qvec", "__bk.tbl", "__bk.bucket")

    cand = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__cvec", "__qvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_similarity(F.col("__cvec"), F.col("__qvec")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
