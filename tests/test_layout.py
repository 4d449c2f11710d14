"""Z-order layout: prove the skipping property, not just the write.

A 256x256 (x, y) grid written as 16 files. Linear sort (x, y) gives
perfect pruning on x but NONE on y (every file spans all y). Z-order
gives useful pruning on BOTH dims. Assertions read real parquet
footer min/max stats via pyarrow — the same statistics Spark's scan
uses to skip row groups.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest


@pytest.fixture
def engine(spark):
    from bighouse_spark.engine import BigHouseEngine

    return BigHouseEngine(spark)


def _files_hit(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo,hi], total files)."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if min(mins) <= hi and max(maxs) >= lo:
            hit += 1
    return hit, len(files)


def test_zorder_prunes_on_both_dims(spark, tmp_path):
    from bighouse_spark.sources.layout import zorder_key

    from pyspark.sql import functions as F

    grid = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).cast("int").alias("x"),
            (F.col("id") / 256).cast("int").alias("y"),
        )
    )
    lin = str(tmp_path / "linear")
    (
        grid.repartitionByRange(16, "x", "y")
        .sortWithinPartitions("x", "y")
        .write.parquet(lin)
    )
    zd = str(tmp_path / "zordered")
    z = zorder_key(grid, ["x", "y"], bits=8)
    (
        grid.withColumn("__z", z)
        .repartitionByRange(16, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.parquet(zd)
    )

    # Thin slice on x: linear layout prunes perfectly, z-order well.
    lin_x, lin_n = _files_hit(lin, "x", 100, 107)
    z_x, z_n = _files_hit(zd, "x", 100, 107)
    # Thin slice on y: linear layout reads EVERYTHING, z-order prunes.
    lin_y, _ = _files_hit(lin, "y", 100, 107)
    z_y, _ = _files_hit(zd, "y", 100, 107)

    assert lin_n == 16 and z_n == 16
    assert lin_x <= 2          # prefix dim: near-perfect for linear
    assert lin_y == 16         # non-prefix dim: no pruning at all
    # 16 files = 64x64 z-blocks; a width-8 slice crosses <= 5 block
    # rows/cols, and range-partition boundaries can straddle one more
    # block — still a ~40% read vs linear's 100% on the y dim.
    assert z_x <= 10 and z_y <= 10
    # and the data is identical
    import pyspark.sql.functions as FF

    a = spark.read.parquet(lin).agg(FF.sum("x"), FF.sum("y")).collect()[0]
    b = spark.read.parquet(zd).agg(FF.sum("x"), FF.sum("y")).collect()[0]
    assert list(a) == list(b)


def test_zorder_key_validation(spark):
    from bighouse_spark.sources.layout import zorder_key

    df = spark.range(4).selectExpr("id AS a", "id AS b", "id AS c", "id AS d")
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="overflows"):
        zorder_key(df, ["a", "b", "c", "d"], bits=16)


def test_engine_sink_zorder(engine, tmp_path):
    out = str(tmp_path / "zsink")
    meta = engine.execute_to_sink(
        "SELECT number AS x, intDiv(number, 100) AS y FROM numbers(10000)",
        path=out,
        zorder_by=["x", "y"],
    )
    assert meta["path"] == out
    df = engine.spark.read.parquet(out)
    assert df.count() == 10000
    with pytest.raises(ValueError, match="exclusive"):
        engine.execute_to_sink(
            "SELECT 1 AS a", path=str(tmp_path / "bad"),
            order_by=["a"], zorder_by=["a"],
        )


def test_sink_bloom_filters_written(engine, tmp_path):
    """bloom_filter_by materializes real bloom filter bytes: the
    bloomed file is measurably larger than the identical data written
    plain (this pyarrow build doesn't expose bloom offsets, so the
    assertion is on the physical artifact), and the data reads back
    identically."""
    q = (
        "SELECT number AS id, concat('u', CAST(number AS String)) AS uid "
        "FROM numbers(20000)"
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    engine.execute_to_sink(q, path=plain)
    engine.execute_to_sink(q, path=bloomed, bloom_filter_by=["uid"])

    import os

    def total(p):
        return sum(
            os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet")
        )

    delta = total(bloomed) - total(plain)
    assert delta > 10_000, f"bloom bytes missing (delta={delta})"
    a = engine.spark.read.parquet(plain).orderBy("id").collect()
    b = engine.spark.read.parquet(bloomed).orderBy("id").collect()
    assert a == b
    with pytest.raises(ValueError, match="requires parquet"):
        engine.execute_to_sink(
            "SELECT 1 AS a", path=str(tmp_path / "bad"), fmt="csv",
            bloom_filter_by=["a"],
        )


def test_zorder_key_string_dim_clusters_equal_values(spark):
    from pyspark.sql import functions as F

    from bighouse_spark.sources.layout import zorder_key

    df = spark.createDataFrame(
        [(i, ["alpha", "beta", "gamma"][i % 3]) for i in range(90)],
        "id long, kind string",
    )
    z = df.withColumn("z", zorder_key(df, ["id", "kind"], bits=8))
    # Equal strings must land on ONE quantization level: for a fixed
    # id, rows differing only by kind get distinct z keys, and each
    # kind maps to exactly one key per id.
    # kind occupies the odd interleave positions (dim index 1): mask
    # out the id bits and every row of one kind shares the remainder.
    kind_bits = (
        z.withColumn("kb", F.col("z").bitwiseAND(F.lit(-6148914691236517206)))
        .groupBy("kind")
        .agg(F.countDistinct("kb").alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in kind_bits)
    assert len({r.kind for r in kind_bits}) == 3
