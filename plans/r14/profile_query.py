#!/usr/bin/env python3
"""Per-stage profiling for one headline query (guide §1/§7): runs the
query with the noop sink, then dumps per-job/per-stage wall times and
task metrics from the Spark REST API so optimization targets the
stage that actually costs time.

Usage: python plans/r14/profile_query.py <query> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import bighouse_spark.queries  # noqa: F401
    from bighouse_spark.operators.caching import release_tracked
    from bighouse_spark.queries.registry import get
    from bighouse_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(app_name=f"r14-profile-{name}", cpus=cpus,
                      shuffle_partitions=cpus)
    fn = get(name).fn
    # Warm runs first so JIT/codegen noise is gone.
    for _ in range(runs):
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        release_tracked()
        spark.catalog.clearCache()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    before_jobs = {
        j["jobId"]
        for j in json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
        )
    }
    spark.sparkContext.setJobDescription(f"r14-profile:{name}")
    t0 = time.monotonic()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    total = time.monotonic() - t0
    release_tracked()
    spark.catalog.clearCache()

    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
    )
    new_jobs = sorted(
        (j for j in jobs if j["jobId"] not in before_jobs),
        key=lambda j: j["jobId"],
    )
    print(f"== {name}: measured run {total:.3f}s, {len(new_jobs)} jobs")
    for j in new_jobs:
        sub = j["submissionTime"]
        dur = "?"
        if "completionTime" in j:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            d = datetime.strptime(j["completionTime"], fmt) - datetime.strptime(
                sub, fmt
            )
            dur = f"{d.total_seconds():.3f}s"
        print(
            f"  job {j['jobId']} [{dur}] stages={j['stageIds']} "
            f"tasks={j['numTasks']} desc={j.get('description', '')[:60]}"
        )
        for sid in sorted(j["stageIds"]):
            try:
                st = json.load(
                    urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app_id}/stages/{sid}"
                    )
                )[0]
            except Exception:
                continue
            print(
                f"    stage {sid}: {st['status']} tasks={st['numCompleteTasks']}"
                f" execRunMs={st['executorRunTime']}"
                f" cpuMs={st['executorCpuTime'] // 1_000_000}"
                f" shRead={st['shuffleReadBytes']} shWrite={st['shuffleWriteBytes']}"
                f" input={st['inputBytes']} name={st['name'][:70]}"
            )


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

if __name__ == "__main__":
    main()
