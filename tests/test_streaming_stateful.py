"""Stateful streaming e2e: applyInPandasWithState running stats must
converge (after all micro-batches) to the batch groupBy answer, and
state must actually carry across micro-batches (forced via
maxFilesPerTrigger=1 over a multi-file source)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bighouse_spark.sources.catalog import load_table
from bighouse_spark.streaming.stateful import (
    running_user_stats,
    streaming_dedup,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stateful_events"))
    ev = load_table(spark, SF_SMOKE, "events").where(F.col("user_id") < 20)
    ev.repartition(3).write.mode("overwrite").parquet(d)
    return d


def _read_stream(spark, d, one_file_per_batch=False):
    reader = spark.readStream.schema(spark.read.parquet(d).schema)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    return reader.parquet(d)


def test_running_stats_converges_to_batch(spark, stream_dir):
    batch = {
        (r.user_id, r.n, round(r.s, 6))
        for r in spark.read.parquet(stream_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    # >1 file + maxFilesPerTrigger=1 → multiple micro-batches, so the
    # final emitted row per key proves state carried across batches.
    src = _read_stream(spark, stream_dir, one_file_per_batch=True)
    q = (
        running_user_stats(src)
        .writeStream.format("memory")
        .queryName("t_running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # memory sink in update mode appends every emission; keep the last
    # emission per key (max n_events — monotone by construction).
    out = spark.sql(
        """
        SELECT user_id, n_events, sum_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY n_events DESC) AS rn
          FROM t_running_stats) WHERE rn = 1
        """
    )
    streamed = {
        (r.user_id, r.n_events, round(r.sum_value, 6)) for r in out.collect()
    }
    assert streamed == batch


def test_running_stats_mean(spark, stream_dir):
    src = _read_stream(spark, stream_dir)
    q = (
        running_user_stats(src)
        .writeStream.format("memory")
        .queryName("t_running_mean")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM t_running_mean").collect()
    assert rows
    for r in rows:
        assert abs(r.mean_value - r.sum_value / r.n_events) < 1e-9


def test_streaming_dedup_drops_in_stream_duplicates(spark, tmp_path):
    d = str(tmp_path / "dup_events")
    ev = load_table(spark, SF_SMOKE, "events").where(F.col("user_id") < 10)
    # Duplicate every row, then stream; exact dedup must halve it.
    ev.union(ev).repartition(2).write.mode("overwrite").parquet(d)
    n_unique = ev.select("event_id").distinct().count()

    src = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    q = (
        streaming_dedup(src, keys=["event_id"], watermark="365 days")
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0].n == n_unique


def test_streaming_dedup_batch_fallback(spark, stream_dir):
    ev = spark.read.parquet(stream_dir)
    assert (
        streaming_dedup(ev.union(ev), keys=["event_id"]).count()
        == ev.select("event_id").distinct().count()
    )


def test_streaming_funnel_converges_to_batch(spark, tmp_path):
    """Two TIME-SPLIT files (older mtime = earlier events) forced
    into separate micro-batches: the anchor vector must carry across
    batches and the final per-user level must equal the batch
    windowFunnel fold over the same rows."""
    import os
    import time

    from bighouse_spark.engine import BigHouseEngine
    from bighouse_spark.streaming.stateful import streaming_funnel

    ev = load_table(spark, SF_SMOKE, "events").where(
        F.col("user_id") < 20
    )
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS DOUBLE), 0.5) AS c"
    ).collect()[0][0]
    d = str(tmp_path / "funnel_stream")
    os.makedirs(d)
    ev.where(F.col("ts").cast("double") <= cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    time.sleep(1.2)  # distinct mtimes: file source triggers oldest first
    ev.where(F.col("ts").cast("double") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    conds = [
        "event_type = 'view'",
        "event_type = 'click'",
        "event_type = 'purchase'",
    ]
    eng = BigHouseEngine(spark)
    spark.read.parquet(d).createOrReplaceTempView("__sf_ev")
    batch = {
        (row[0], row[1])
        for row in eng.execute(
            "SELECT user_id, windowFunnel(3600)(CAST(ts AS "
            "TIMESTAMP), event_type = 'view', event_type = 'click', "
            "event_type = 'purchase') AS lvl "
            "FROM __sf_ev GROUP BY user_id"
        ).rows
    }

    src = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        streaming_funnel(src, conds, 3600.0)
        .writeStream.format("memory")
        .queryName("t_stream_funnel")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode appends one emission per key per touching batch;
    # the level is monotone per key, so the max is the final state
    out = {
        (r.user_id, r.lvl)
        for r in spark.sql(
            "SELECT user_id, max(level) AS lvl FROM t_stream_funnel "
            "GROUP BY user_id"
        ).collect()
    }
    assert out == batch
    # and state genuinely crossed batches: at least one user's chain
    # needs events from both halves, so a single-file-only fold of
    # the SECOND half must differ somewhere
    assert len(out) > 0


def test_streaming_retention_converges_to_batch(spark, tmp_path):
    import os
    import time

    from bighouse_spark.streaming.stateful import streaming_retention

    ev = load_table(spark, SF_SMOKE, "events").where(
        F.col("user_id") < 20
    )
    d = str(tmp_path / "ret_stream")
    os.makedirs(d)
    ev.where("event_id % 2 = 0").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    time.sleep(1.2)
    ev.where("event_id % 2 = 1").coalesce(1).write.mode(
        "append"
    ).parquet(d)

    batch = {
        (r[0], r[1], r[2], r[3])
        for r in spark.read.parquet(d)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("f1"),
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("f2"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1)
                .otherwise(0)
            ).alias("f3"),
        )
        .selectExpr(
            "user_id", "f1 AS r1",
            "CAST(f1 = 1 AND f2 = 1 AS INT) AS r2",
            "CAST(f1 = 1 AND f3 = 1 AS INT) AS r3",
        )
        .collect()
    }
    src = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        streaming_retention(
            src,
            ["event_type = 'view'", "event_type = 'click'",
             "event_type = 'purchase'"],
        )
        .writeStream.format("memory")
        .queryName("t_stream_ret")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = {
        (r[0], r[1], r[2], r[3])
        for r in spark.sql(
            "SELECT user_id, max(r1), max(r2), max(r3) FROM "
            "t_stream_ret GROUP BY user_id"
        ).collect()
    }
    assert out == batch


def test_streaming_sequence_match_converges_to_batch(spark, tmp_path):
    import os
    import time

    from bighouse_spark.engine import BigHouseEngine
    from bighouse_spark.streaming.stateful import (
        streaming_sequence_match,
    )

    ev = load_table(spark, SF_SMOKE, "events").where(
        F.col("user_id") < 20
    )
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS DOUBLE), 0.5) AS c"
    ).collect()[0][0]
    d = str(tmp_path / "sm_stream")
    os.makedirs(d)
    ev.where(F.col("ts").cast("double") <= cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    time.sleep(1.2)
    ev.where(F.col("ts").cast("double") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    eng = BigHouseEngine(spark)
    spark.read.parquet(d).createOrReplaceTempView("__sm_ev")
    batch = {
        (row[0], bool(row[1]))
        for row in eng.execute(
            "SELECT user_id, sequenceMatch('(?1).*(?2)')(CAST(ts AS "
            "TIMESTAMP), event_type = 'view', "
            "event_type = 'purchase') AS m "
            "FROM __sm_ev GROUP BY user_id"
        ).rows
    }
    src = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        streaming_sequence_match(
            src, ["event_type = 'view'", "event_type = 'purchase'"]
        )
        .writeStream.format("memory")
        .queryName("t_stream_sm")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = {
        (r[0], bool(r[1]))
        for r in spark.sql(
            "SELECT user_id, max(CAST(matched AS INT)) FROM "
            "t_stream_sm GROUP BY user_id"
        ).collect()
    }
    assert out == batch


def test_streaming_funnel_strict_modes_converge(spark, tmp_path):
    """The streaming twin's strict modes (round-10 entry-walk
    parity): per-user final levels under strict_deduplication and
    strict_order must equal the batch SQL fold over the same
    time-split files."""
    import os
    import time

    from bighouse_spark.engine import BigHouseEngine
    from bighouse_spark.streaming.stateful import streaming_funnel

    ev = load_table(spark, SF_SMOKE, "events").where(
        F.col("user_id") < 20
    )
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS DOUBLE), 0.5) AS c"
    ).collect()[0][0]
    d = str(tmp_path / "funnel_strict_stream")
    os.makedirs(d)
    ev.where(F.col("ts").cast("double") <= cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    time.sleep(1.2)
    ev.where(F.col("ts").cast("double") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    conds = [
        "event_type = 'view'",
        "event_type = 'click'",
        "event_type = 'purchase'",
    ]
    eng = BigHouseEngine(spark)
    spark.read.parquet(d).createOrReplaceTempView("__sf_ev_strict")

    for mode in ("strict_deduplication", "strict_order"):
        batch = {
            (row[0], row[1])
            for row in eng.execute(
                f"SELECT user_id, windowFunnel(3600, '{mode}')("
                "CAST(ts AS TIMESTAMP), event_type = 'view', "
                "event_type = 'click', event_type = 'purchase') AS "
                "lvl FROM __sf_ev_strict GROUP BY user_id"
            ).rows
        }
        src = (
            spark.readStream.schema(spark.read.parquet(d).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = streaming_funnel(src, conds, 3600.0, modes=(mode,))
        q = (
            out.writeStream.format("memory")
            .queryName(f"__sf_strict_{mode[:12]}")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # last emission per user (update mode emits once per touched
        # batch; levels only move forward, and a dedup truncation
        # emits its final ret)
        final = {
            (r[0], r[1])
            for r in spark.sql(
                "SELECT user_id, max_by(level, rn) FROM (SELECT *, "
                "monotonically_increasing_id() AS rn FROM "
                f"__sf_strict_{mode[:12]}) GROUP BY user_id"
            ).collect()
        }
        assert final == batch, f"mode {mode}: {final ^ batch}"


def test_streaming_sequence_match_pattern_converges(spark, tmp_path):
    """The pattern-mode streaming twin (adjacency + time constraint
    via the per-prefix reachability DP) must match the batch
    sequenceMatch fold over the same time-split files — the
    previous-position flags must survive the batch boundary."""
    import os
    import time

    from bighouse_spark.engine import BigHouseEngine
    from bighouse_spark.streaming.stateful import (
        streaming_sequence_match,
    )

    ev = load_table(spark, SF_SMOKE, "events").where(
        F.col("user_id") < 20
    )
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS DOUBLE), 0.5) AS c"
    ).collect()[0][0]
    d = str(tmp_path / "seq_pattern_stream")
    os.makedirs(d)
    ev.where(F.col("ts").cast("double") <= cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    time.sleep(1.2)
    ev.where(F.col("ts").cast("double") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    conds = ["event_type = 'view'", "event_type = 'click'"]
    eng = BigHouseEngine(spark)
    spark.read.parquet(d).createOrReplaceTempView("__sm_ev_pat")

    for pat in ["(?1)(?2)", "(?1)(?t<600)(?2)", "(?1).*(?t>60)(?2)"]:
        batch = {
            (row[0], bool(row[1]))
            for row in eng.execute(
                f"SELECT user_id, sequenceMatch('{pat}')("
                "CAST(ts AS TIMESTAMP), event_type = 'view', "
                "event_type = 'click') AS m "
                "FROM __sm_ev_pat GROUP BY user_id"
            ).rows
        }
        src = (
            spark.readStream.schema(spark.read.parquet(d).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = streaming_sequence_match(
            src, conds, pattern=pat
        )
        qn = f"__sm_pat_{abs(hash(pat)) % 10**6}"
        q = (
            out.writeStream.format("memory")
            .queryName(qn)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        final = {
            (r[0], bool(r[1]))
            for r in spark.sql(
                "SELECT user_id, max_by(matched, rn) FROM (SELECT *,"
                " monotonically_increasing_id() AS rn FROM "
                f"{qn}) GROUP BY user_id"
            ).collect()
        }
        assert final == batch, f"pattern {pat}: {final ^ batch}"


def test_streaming_folds_skip_null_timestamps(spark, tmp_path):
    """NULL timestamps are invisible to the streaming folds, like
    the batch folds' notnull filter — a NaN entry must not clobber
    anchors or DP state."""
    from bighouse_spark.streaming.stateful import (
        streaming_funnel,
        streaming_sequence_match,
    )

    rows = [
        (1, 100.0, "view"),
        (1, None, "view"),
        (1, 150.0, "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts double, event_type string")
    d = str(tmp_path / "null_ts")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    src = spark.readStream.schema(df.schema).parquet(d)
    conds = ["event_type = 'view'", "event_type = 'click'"]

    q = (
        streaming_funnel(src, conds, 3600.0)
        .writeStream.format("memory")
        .queryName("t_null_ts_funnel")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql(
        "SELECT max(level) FROM t_null_ts_funnel"
    ).collect()[0][0] == 2

    src2 = spark.readStream.schema(df.schema).parquet(d)
    q2 = (
        streaming_sequence_match(src2, conds, pattern="(?1).*(?2)")
        .writeStream.format("memory")
        .queryName("t_null_ts_seq")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.sql(
        "SELECT max(matched) FROM t_null_ts_seq"
    ).collect()[0][0] is True


def test_streaming_sequence_next_node_converges(spark, tmp_path):
    """The round-11 fourth behavioral twin: all four direction x base
    pairings of sequenceNextNode must converge to the batch builder's
    answer over the same rows, with the two halves of the event log
    forced into separate micro-batches (state crosses the boundary:
    ring buffers, frozen results, last-match candidates)."""
    import os
    import time

    from bighouse_spark.engine import BigHouseEngine
    from bighouse_spark.streaming.stateful import (
        streaming_sequence_next_node,
    )

    ev = load_table(spark, SF_SMOKE, "events").where(
        F.col("user_id") < 25
    )
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS DOUBLE), 0.5) AS c"
    ).collect()[0][0]
    d = str(tmp_path / "snn_stream")
    os.makedirs(d)
    ev.where(F.col("ts").cast("double") <= cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    time.sleep(1.2)
    ev.where(F.col("ts").cast("double") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    eng = BigHouseEngine(spark)
    spark.read.parquet(d).createOrReplaceTempView("__snn_ev")
    conds_sql = "event_type = 'view', event_type = 'click'"
    conds = ["event_type = 'view'", "event_type = 'click'"]

    for i, (direction, base) in enumerate(
        [
            ("forward", "head"),
            ("forward", "first_match"),
            ("forward", "last_match"),
            ("backward", "tail"),
            ("backward", "first_match"),
            ("backward", "last_match"),
        ]
    ):
        batch = {
            (row[0], row[1])
            for row in eng.execute(
                f"SELECT user_id, sequenceNextNode('{direction}', "
                f"'{base}')(CAST(ts AS TIMESTAMP), event_type, "
                f"value >= 0, {conds_sql}) AS nxt "
                "FROM __snn_ev GROUP BY user_id"
            ).rows
        }
        src = (
            spark.readStream.schema(spark.read.parquet(d).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        qname = f"t_snn_{i}"
        q = (
            streaming_sequence_next_node(
                src, direction, base, "event_type", "value >= 0",
                conds,
            )
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # final answer per key = the row with the max emits counter
        out = {
            (r.user_id, r.next_node)
            for r in spark.sql(
                f"SELECT user_id, max_by(next_node, emits) AS "
                f"next_node FROM {qname} GROUP BY user_id"
            ).collect()
        }
        assert out == batch, (direction, base)


def test_streaming_sequence_next_node_checkpoint_restart(
    spark, tmp_path
):
    """Round-12 seam probe: the sequenceNextNode state must survive a
    full STOP + RESUME from checkpoint (not just a micro-batch
    boundary inside one run). foreachBatch is the sink — Spark's
    memory sink cannot recover from a checkpoint. Two pairings cover
    both ring directions; the convergence test above covers all six
    pairings' semantics."""
    import os
    import time

    from bighouse_spark.engine import BigHouseEngine
    from bighouse_spark.streaming.stateful import (
        streaming_sequence_next_node,
    )

    ev = load_table(spark, SF_SMOKE, "events").where(
        F.col("user_id") < 20
    )
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS DOUBLE), 0.5) AS c"
    ).collect()[0][0]
    eng = BigHouseEngine(spark)
    conds = ["event_type = 'view'", "event_type = 'click'"]

    for i, (direction, base) in enumerate(
        [("forward", "head"), ("backward", "tail")]
    ):
        d = str(tmp_path / f"snn_ck_{i}" / "data")
        ck = str(tmp_path / f"snn_ck_{i}" / "ckpt")
        os.makedirs(d)
        out: list = []
        ev.where(F.col("ts").cast("double") <= cut).coalesce(
            1
        ).write.mode("append").parquet(d)

        def sink(df, epoch):
            out.extend(
                (r.user_id, r.next_node, r.emits)
                for r in df.collect()
            )

        def run():
            src = (
                spark.readStream.schema(spark.read.parquet(d).schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
            )
            q = (
                streaming_sequence_next_node(
                    src, direction, base, "event_type",
                    "value >= 0", conds,
                )
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        run()  # first half, then the query STOPS
        time.sleep(1.0)
        ev.where(F.col("ts").cast("double") > cut).coalesce(
            1
        ).write.mode("append").parquet(d)
        run()  # RESUME from checkpoint: ring state must carry over

        final: dict = {}
        for uid, nxt, emits in out:
            if uid not in final or emits >= final[uid][1]:
                final[uid] = (nxt, emits)
        got = {(k, v[0]) for k, v in final.items()}
        spark.read.parquet(d).createOrReplaceTempView("__snn_ck")
        batch = {
            (row[0], row[1])
            for row in eng.execute(
                f"SELECT user_id, sequenceNextNode('{direction}', "
                f"'{base}')(CAST(ts AS TIMESTAMP), event_type, "
                "value >= 0, event_type = 'view', "
                "event_type = 'click') AS nxt "
                "FROM __snn_ck GROUP BY user_id"
            ).rows
        }
        assert got == batch, (direction, base)
