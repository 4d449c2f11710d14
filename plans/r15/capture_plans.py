#!/usr/bin/env python3
"""Round-15 plan capture (guide §1): ``explain("formatted")`` for every
headline query plus optional noop-sink timings (min of N warm runs).

Usage: python plans/r15/capture_plans.py [before|after] [query ...]
Writes plans/r15/<query>_<tag>.txt into THIS repo's plans/r15 (so a
"before" capture can run from a git worktree of the prior round's code
with R15_OUT_DIR pointing here). R15_RUNS=0 skips the noop timings
(plan text only — useful while the host is noisy).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
RUNS = int(os.environ.get("R15_RUNS", 3))
OUT_DIR = os.environ.get(
    "R15_OUT_DIR", os.path.dirname(os.path.abspath(__file__))
)

HEADLINE = [
    "sum_group_by",
    "uniq_approx",
    "checksum_xxhash64",
    "count_star",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "window_topk_per_group",
    "window_session_10m",
    "asof_join_purchase_click",
    "dedup_minhash_lsh",
    "ann_brute_force_topk",
    "ann_ivf_topk",
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "funnel_window_3step",
    "uniq_state_merge_rollup",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE

    import bighouse_spark.queries  # noqa: F401
    from bighouse_spark.operators.caching import release_tracked
    from bighouse_spark.queries.registry import get
    from bighouse_spark.session import get_spark

    spark = get_spark(app_name=f"r15-capture-{tag}", cpus=CPUS,
                      shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    for name in names:
        fn = get(name).fn
        spark.sparkContext.setJobDescription(f"r15:{tag}:{name}")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF_DIR).explain("formatted")
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        release_tracked()
        spark.catalog.clearCache()
        if RUNS > 0:
            samples = []
            for _ in range(RUNS + 1):
                t0 = time.monotonic()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                samples.append(time.monotonic() - t0)
                release_tracked()
                spark.catalog.clearCache()
            timings[name] = round(min(samples[1:]), 3)  # drop the cold run
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"tag": tag, "noop_min_warm": timings,
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))


if __name__ == "__main__":
    main()
