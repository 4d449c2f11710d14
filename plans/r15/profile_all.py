#!/usr/bin/env python3
"""Profile every headline query in one session (guide §1):

For each query, after warmup, measure one collect()-path run and report
  - construct_s : wall to build the DataFrame (py4j DSL + analysis)
  - run_s       : wall of the timed action
  - jobs        : number of Spark jobs the action launched
  - jobs_wall_s : sum of per-job wall (submission→completion)
  - gap_s       : run_s - jobs_wall_s (driver/AQE/py4j time between jobs)
  - cpu_ms      : total executorCpuTime over the run's stages (steal-robust)

Usage: python plans/r15/profile_all.py [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "sum_group_by", "uniq_approx", "checksum_xxhash64", "count_star",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "window_topk_per_group",
    "window_session_10m", "asof_join_purchase_click", "dedup_minhash_lsh",
    "ann_brute_force_topk", "ann_ivf_topk", "tpch_q8_market_share",
    "tpch_q13_customer_distribution", "funnel_window_3step",
    "uniq_state_merge_rollup",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    names = sys.argv[2:] or HEADLINE

    import bighouse_spark.queries  # noqa: F401
    from bighouse_spark.operators.caching import release_tracked
    from bighouse_spark.queries.registry import get
    from bighouse_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(app_name="r15-profile", cpus=cpus,
                      shuffle_partitions=cpus)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def api(path):
        return json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}")
        )

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    results = {}
    for name in names:
        fn = get(name).fn
        for _ in range(2):  # warm
            fn(spark, SF_DIR).collect()
            release_tracked()
            spark.catalog.clearCache()
        before = {j["jobId"] for j in api("jobs")}
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        t1 = time.monotonic()
        df.collect()
        t2 = time.monotonic()
        release_tracked()
        spark.catalog.clearCache()
        new = [j for j in api("jobs") if j["jobId"] not in before]
        jobs_wall = 0.0
        stage_ids = set()
        for j in new:
            stage_ids.update(j["stageIds"])
            if "completionTime" in j:
                jobs_wall += (
                    datetime.strptime(j["completionTime"], fmt)
                    - datetime.strptime(j["submissionTime"], fmt)
                ).total_seconds()
        cpu_ms = 0
        run_ms = 0
        ntasks = 0
        for sid in stage_ids:
            try:
                st = api(f"stages/{sid}")[0]
            except Exception:
                continue
            cpu_ms += st["executorCpuTime"] // 1_000_000
            run_ms += st["executorRunTime"]
            ntasks += st["numCompleteTasks"]
        results[name] = {
            "construct_s": round(t1 - t0, 3),
            "run_s": round(t2 - t1, 3),
            "jobs": len(new),
            "jobs_wall_s": round(jobs_wall, 3),
            "gap_s": round((t2 - t1) - jobs_wall, 3),
            "cpu_ms": cpu_ms,
            "exec_run_ms": run_ms,
            "tasks": ntasks,
        }
        r = results[name]
        print(
            f"{name:34s} cons={r['construct_s']:6.3f} run={r['run_s']:6.3f} "
            f"jobs={r['jobs']:2d} jwall={r['jobs_wall_s']:6.3f} "
            f"gap={r['gap_s']:6.3f} cpu={r['cpu_ms']:6d}ms tasks={r['tasks']}"
        )
    tot = {
        "construct_s": round(sum(r["construct_s"] for r in results.values()), 3),
        "run_s": round(sum(r["run_s"] for r in results.values()), 3),
        "jobs": sum(r["jobs"] for r in results.values()),
        "gap_s": round(sum(r["gap_s"] for r in results.values()), 3),
        "cpu_ms": sum(r["cpu_ms"] for r in results.values()),
    }
    print("TOTAL", json.dumps(tot))
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"queries": results, "total": tot}, f, indent=1)


if __name__ == "__main__":
    main()
