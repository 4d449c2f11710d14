"""Partitioned upsert: MERGE semantics + the only-touched-buckets
I/O guarantee (untouched partition dirs are byte-identical after an
upsert — checked via file listing + mtimes, not just row values)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bighouse_spark.operators.upsert import (
    BUCKET_COL,
    read_upserted,
    upsert_partitioned,
)


def _snapshot(target):
    out = {}
    for d in os.listdir(target):
        if not d.startswith(f"{BUCKET_COL}="):
            continue
        for f in os.listdir(os.path.join(target, d)):
            if f.endswith(".parquet"):
                p = os.path.join(target, d, f)
                out[p] = os.path.getmtime(p)
    return out


def test_upsert_merge_and_bucket_isolation(spark, tmp_path):
    target = str(tmp_path / "acc")
    base = spark.createDataFrame(
        [(i, f"u{i}", i * 10) for i in range(200)], ["uid", "name", "total"]
    )
    r1 = upsert_partitioned(spark, base, target, keys=["uid"], n_buckets=8)
    assert r1["rows_written"] == 200
    before = _snapshot(target)
    assert len({p.split(f"{BUCKET_COL}=")[1].split("/")[0] for p in before}) == 8

    # update 3 existing keys + insert 2 new ones
    batch = spark.createDataFrame(
        [(5, "u5", 999), (17, "u17", 888), (100, "u100", 777),
         (1000, "new1", 1), (1001, "new2", 2)],
        ["uid", "name", "total"],
    )
    r2 = upsert_partitioned(spark, batch, target, keys=["uid"], n_buckets=8)
    assert r2["buckets_touched"] <= 5

    out = read_upserted(spark, target)
    assert out.count() == 202
    got = {r.uid: r.total for r in out.where(
        F.col("uid").isin(5, 17, 100, 1000, 1001, 6)
    ).collect()}
    assert got[5] == 999 and got[17] == 888 and got[100] == 777
    assert got[1000] == 1 and got[1001] == 2
    assert got[6] == 60  # untouched key unchanged

    # buckets NOT touched by the batch kept their exact files
    after = _snapshot(target)
    touched_dirs = set()
    for uid in (5, 17, 100, 1000, 1001):
        row = spark.createDataFrame([(uid,)], ["uid"]).select(
            F.pmod(F.xxhash64("uid"), F.lit(8)).cast("int").alias("b")
        ).collect()[0]
        touched_dirs.add(f"{BUCKET_COL}={row.b}")
    for p, mtime in before.items():
        d = p.split("/")[-2]
        if d not in touched_dirs:
            assert p in after and after[p] == mtime, f"untouched {p} changed"


def test_upsert_into_empty_dir(spark, tmp_path):
    target = str(tmp_path / "fresh")
    df = spark.createDataFrame([(1, 1.0)], ["k", "v"])
    r = upsert_partitioned(spark, df, target, keys=["k"], n_buckets=4)
    assert r["rows_written"] == 1
    assert read_upserted(spark, target).count() == 1
