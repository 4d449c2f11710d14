#!/usr/bin/env python3
"""VERDICT r14 Next #3: settle tpch_q3's parallelism guard with a
back-to-back A/B under steal measurement.

Runs q3 warm (collect path, bench methodology) N times with the guard
as shipped vs with the guard bypassed (identical query minus
ensure_min_parallelism), interleaved A/B/A/B so host drift hits both
arms, and reports min + median per arm plus the steal fraction.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def ticks():
    with open("/proc/stat") as f:
        return [int(v) for v in f.readline().split()[1:]]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    import bighouse_spark.queries  # noqa: F401
    from bighouse_spark.queries.registry import get, t
    from bighouse_spark.queries.relational import _dsum
    from bighouse_spark.session import get_spark

    spark = get_spark(app_name="r15-q3-ab", cpus=32, shuffle_partitions=32)

    def q3_unguarded(spark, sf_dir):
        cust = t(spark, sf_dir, "customer").where(
            F.col("c_mktsegment") == "BUILDING"
        )
        orders = t(spark, sf_dir, "orders").where(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
        )
        li = t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        return (
            li.join(
                orders.join(
                    F.broadcast(cust), orders.o_custkey == cust.c_custkey
                ),
                li.l_orderkey == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey", "o_orderdate")
            .agg(
                _dsum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    "revenue",
                    4,
                )
            )
            .select("l_orderkey", "revenue", "o_orderdate")
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
            .limit(10)
        )

    guarded = get("tpch_q3_shipping_priority").fn
    arms = {"guarded": guarded, "unguarded": q3_unguarded}
    # sanity: identical results
    a = sorted(map(tuple, guarded(spark, sf).collect()))
    b = sorted(map(tuple, q3_unguarded(spark, sf).collect()))
    assert a == b, "ARMS DISAGREE"

    times: dict[str, list[float]] = {k: [] for k in arms}
    before = ticks()
    for _ in range(n):
        for name, fn in arms.items():
            t0 = time.monotonic()
            fn(spark, sf).collect()
            times[name].append(time.monotonic() - t0)
    after = ticks()
    d = [y - x for x, y in zip(before, after)]
    busy = sum(d) - d[3] - d[4]
    steal = 100.0 * d[7] / busy if busy else 0.0
    for name, ts in times.items():
        print(
            f"{name:10s} min={min(ts):.3f} med={statistics.median(ts):.3f}"
            f" all={[round(x, 3) for x in ts]}"
        )
    print(f"steal during A/B: {steal:.1f}% of busy")


if __name__ == "__main__":
    main()
