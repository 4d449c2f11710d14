#!/usr/bin/env python3
"""VERDICT r14 Next #4: A/B the LSH hot-bucket cap shapes.

Arm A (shipped): one exchange on (band, bucket) + full sort + window
row_number cap, groupBy reusing the window's partitioning.

Arm B (VERDICT-suggested, lazy): pre-aggregate per-bucket counts,
broadcast the (normally empty) hot-bucket set, anti-join the cold rows
straight into the groupBy and window only the hot rows — removes the
full sort at the price of one extra aggregation pass + a broadcast +
a union. All lazy (no eager existence check — the r14 rejected variant
was eager).

Both arms produce identical verified pairs (asserted). Interleaved
warm runs, steal measured.
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
    from bighouse_spark.operators.caching import release_tracked
    from bighouse_spark.operators.dedup import _lsh_prep
    from bighouse_spark.queries.registry import get
    from bighouse_spark.session import get_spark
    from bighouse_spark.sources.catalog import load_table, table_stats

    spark = get_spark(app_name="r15-lshcap-ab", cpus=32,
                      shuffle_partitions=32)
    CAP = 256

    def docs_input():
        return load_table(spark, sf, "documents").where(
            F.size(F.split("text", " ")) >= 3
        )

    stats = table_stats(spark, sf, "documents")

    def pairs_common(docs, cand, thr):
        d1 = docs.select("id", "shingles").alias("__a")
        d2 = docs.select("id", "shingles").alias("__b")
        return (
            cand.join(d1, cand.id_a == F.col("__a.id"))
            .join(d2, cand.id_b == F.col("__b.id"))
            .selectExpr(
                "id_a", "id_b",
                "size(array_intersect(__a.shingles, __b.shingles)) / "
                "size(array_union(__a.shingles, __b.shingles)) AS jaccard",
            )
            .where(F.col("jaccard") >= thr)
            .selectExpr("id_a", "id_b", "round(jaccard, 6) AS jaccard")
        )

    def arm_window(thr=0.5):
        docs, band_keys = _lsh_prep(
            docs_input(), "text", "doc_id", 32, 16, 3, stats
        )
        capped = band_keys.selectExpr(
            "id", "band", "bucket",
            "row_number() OVER (PARTITION BY band, bucket ORDER BY id)"
            " AS __rn",
        ).where(f"__rn <= {CAP}")
        cand = (
            capped.groupBy("band", "bucket")
            .agg(F.expr("sort_array(collect_list(id))").alias("ids"))
            .where("size(ids) >= 2")
            .selectExpr(
                "explode(flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), "
                "y -> struct(x AS id_a, y AS id_b))))) AS p"
            )
            .selectExpr("p.id_a", "p.id_b")
            .distinct()
        )
        return pairs_common(docs, cand, thr)

    def arm_broadcast_hot(thr=0.5):
        docs, band_keys = _lsh_prep(
            docs_input(), "text", "doc_id", 32, 16, 3, stats
        )
        hot = (
            band_keys.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > CAP)
            .select("band", "bucket")
        )
        cold = band_keys.join(F.broadcast(hot), ["band", "bucket"],
                              "left_anti")
        hot_rows = band_keys.join(F.broadcast(hot), ["band", "bucket"],
                                  "left_semi")
        hot_capped = hot_rows.selectExpr(
            "id", "band", "bucket",
            "row_number() OVER (PARTITION BY band, bucket ORDER BY id)"
            " AS __rn",
        ).where(f"__rn <= {CAP}").select("id", "band", "bucket")
        capped = cold.unionByName(hot_capped)
        cand = (
            capped.groupBy("band", "bucket")
            .agg(F.expr("sort_array(collect_list(id))").alias("ids"))
            .where("size(ids) >= 2")
            .selectExpr(
                "explode(flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), "
                "y -> struct(x AS id_a, y AS id_b))))) AS p"
            )
            .selectExpr("p.id_a", "p.id_b")
            .distinct()
        )
        return pairs_common(docs, cand, thr)

    arms = {"window": arm_window, "bcast_hot": arm_broadcast_hot}
    res = {}
    for name, fn in arms.items():
        res[name] = sorted(map(tuple, fn().collect()))
        release_tracked()
        spark.catalog.clearCache()
    assert res["window"] == res["bcast_hot"], "ARMS DISAGREE"
    print(f"arms agree: {len(res['window'])} pairs")

    times: dict[str, list[float]] = {k: [] for k in arms}
    before = ticks()
    for _ in range(n):
        for name, fn in arms.items():
            t0 = time.monotonic()
            fn().collect()
            times[name].append(time.monotonic() - t0)
            release_tracked()
            spark.catalog.clearCache()
    after = ticks()
    d = [y - x for x, y in zip(before, after)]
    busy = sum(d) - d[3] - d[4]
    print(
        "steal during A/B: "
        f"{100.0 * d[7] / busy if busy else 0:.1f}% of busy"
    )
    for name, ts in times.items():
        print(
            f"{name:10s} min={min(ts):.3f} med={statistics.median(ts):.3f}"
            f" all={[round(x, 3) for x in ts]}"
        )


if __name__ == "__main__":
    main()
