#!/usr/bin/env python3
"""Same A/B as ab_q3_guard.py but for tpch_q1's input-skew guard."""

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

    spark = get_spark(app_name="r15-q1-ab", cpus=32, shuffle_partitions=32)

    def q1_unguarded(spark, sf_dir):
        li = t(spark, sf_dir, "lineitem")
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge = disc_price * (1 + F.col("l_tax"))
        return (
            li.where(
                F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                _dsum(F.col("l_quantity"), "sum_qty"),
                _dsum(F.col("l_extendedprice"), "sum_base_price"),
                _dsum(disc_price, "sum_disc_price", 4),
                F.sum(charge.cast("decimal(24,6)"))
                .cast("double")
                .alias("sum_charge"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    guarded = get("tpch_q1_pricing_summary").fn
    arms = {"guarded": guarded, "unguarded": q1_unguarded}
    a = sorted(map(tuple, guarded(spark, sf).collect()))
    b = sorted(map(tuple, q1_unguarded(spark, sf).collect()))
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
    for name, ts in times.items():
        print(
            f"{name:10s} min={min(ts):.3f} med={statistics.median(ts):.3f}"
            f" all={[round(x, 3) for x in ts]}"
        )
    print(f"steal during A/B: {100.0 * d[7] / busy if busy else 0:.1f}% of busy")


if __name__ == "__main__":
    main()
