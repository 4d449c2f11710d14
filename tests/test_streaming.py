"""Structured Streaming e2e: the window builders must produce the
same results when fed a file stream as in batch (they're the same
code — this proves the streaming path actually runs: watermarks,
state store, availableNow trigger)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from bighouse_spark.sources.catalog import load_table
from bighouse_spark.streaming.windows import (
    session_window_agg,
    tumbling_window_agg,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_stream_dir(tmp_path_factory):
    # Re-write events as a clean micro-batch source dir (the fixture
    # parquet has nanos timestamps which load_table already fixes —
    # write the fixed form for readStream).
    d = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(d, ignore_errors=True)
    return d


def _prepare(spark, d):
    ev = load_table(spark, SF_SMOKE, "events")
    ev.coalesce(2).write.mode("overwrite").parquet(d)
    return ev


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_matches_batch(spark, event_stream_dir):
    ev = _prepare(spark, event_stream_dir)
    batch = {
        (r.window_start, r.n_events, r.sum_value)
        for r in tumbling_window_agg(ev, window="1 hour").collect()
    }
    stream_src = spark.readStream.schema(
        spark.read.parquet(event_stream_dir).schema
    ).parquet(event_stream_dir)
    out = _run_stream(
        spark, tumbling_window_agg(stream_src, window="1 hour"), "t_tumble"
    )
    streamed = {
        (r.window_start, r.n_events, r.sum_value) for r in out.collect()
    }
    assert streamed == batch


def test_session_stream_matches_batch(spark, event_stream_dir):
    ev = _prepare(spark, event_stream_dir)
    batch = {
        (r.user_id, r.session_start, r.n_events)
        for r in session_window_agg(ev, gap="10 minutes").collect()
    }
    stream_src = spark.readStream.schema(
        spark.read.parquet(event_stream_dir).schema
    ).parquet(event_stream_dir)
    out = _run_stream(
        spark,
        session_window_agg(stream_src, gap="10 minutes"),
        "t_session",
    )
    streamed = {
        (r.user_id, r.session_start, r.n_events) for r in out.collect()
    }
    assert streamed == batch


def test_watermark_applied_only_when_streaming(spark, event_stream_dir):
    ev = _prepare(spark, event_stream_dir)
    # Batch: no watermark node, runs fine.
    assert tumbling_window_agg(ev).count() > 0
    # Streaming: watermark present in the logical plan.
    stream_src = spark.readStream.schema(
        spark.read.parquet(event_stream_dir).schema
    ).parquet(event_stream_dir)
    plan = tumbling_window_agg(stream_src)._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" in plan


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """interval_join produces identical pairs fed as two file streams
    (watermarked stream-stream join, append mode) or as batch DFs."""
    from bighouse_spark.streaming.joins import interval_join

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    views = ev.where(F.col("event_type") == "view")
    buys = ev.where(F.col("event_type") == "purchase")
    # Late sentinel rows (distinct user) push the end-of-stream
    # watermark past every real event so append mode flushes fully.
    far = ev.agg(
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts")
    ).collect()[0]["ts"]
    sentinel = spark.createDataFrame(
        [(-1, far, -999, "x")], ev.schema
    )
    vdir, bdir = str(tmp_path / "views"), str(tmp_path / "buys")
    views.unionByName(sentinel).coalesce(2).write.parquet(vdir)
    buys.unionByName(sentinel).coalesce(2).write.parquet(bdir)

    def run(v, b):
        out = interval_join(
            v, b, on=["user_id"], lower_s=0, upper_s=1800,
            watermark_s=60,
        ).where(F.col("user_id") != -999)
        if not out.isStreaming:
            return {(r.event_id, r.event_id_r) for r in out.collect()}
        q = (
            out.writeStream.format("memory").queryName("ssj")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(180)
        return {
            (r.event_id, r.event_id_r)
            for r in spark.sql("SELECT * FROM ssj").collect()
        }

    batch = run(spark.read.parquet(vdir), spark.read.parquet(bdir))
    assert batch, "fixture must produce view->purchase pairs"
    schema = spark.read.parquet(vdir).schema
    stream = run(
        spark.readStream.schema(schema).parquet(vdir),
        spark.readStream.schema(schema).parquet(bdir),
    )
    assert stream == batch


def test_streaming_corpus_quality_filter_matches_batch(spark, tmp_path):
    """Corpus quality filtering is stream-safe: the Gopher/C4-style
    per-document column expressions are stateless projections, so the
    identical code path runs over readStream and emits exactly the
    batch result — the shape of a continuously-ingesting training-data
    pipeline (filter on arrival, no re-scans)."""
    from pyspark.sql import functions as F

    from bighouse_spark.functions.text import tokens

    d = str(tmp_path / "docs_stream")
    load_table(spark, SF_SMOKE, "documents").coalesce(2).write.mode(
        "overwrite"
    ).parquet(d)
    schema = spark.read.parquet(d).schema

    def quality_filter(df):
        toks = tokens("text")
        n = F.size(toks)
        mean_len = F.aggregate(
            toks, F.lit(0), lambda a, x: a + F.length(x)
        ) / n.cast("double")
        return (
            df.select("doc_id", n.alias("n_words"),
                      F.round(mean_len, 6).alias("mean_word_len"))
            .where((F.col("n_words") >= 10) & mean_len.between(2, 12))
        )

    batch = quality_filter(spark.read.parquet(d)).collect()
    q = (
        quality_filter(spark.readStream.schema(schema).parquet(d))
        .writeStream.format("memory")
        .queryName("corpus_qf")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM corpus_qf").collect()
    assert len(got) > 0
    assert sorted((r.doc_id, r.n_words, r.mean_word_len) for r in got) \
        == sorted((r.doc_id, r.n_words, r.mean_word_len) for r in batch)


def test_streaming_url_canonical_dedup_matches_batch(spark, tmp_path):
    """URL-canonicalization dedup is stream-safe end-to-end: the
    canonicalizer is a stateless projection and the keep-first rule
    is streaming dropDuplicates keyed on the canonical URL — the
    shape of a continuously-ingesting crawl pipeline (dedup on
    arrival). Batch keep-set == streamed keep-set. (At cluster scale
    the state is bounded with a watermark on the ingest timestamp;
    availableNow here drains the fixture completely.)"""
    from pyspark.sql import functions as F

    d = str(tmp_path / "docs_url_stream")
    load_table(spark, SF_SMOKE, "documents").coalesce(2).write.mode(
        "overwrite"
    ).parquet(d)
    schema = spark.read.parquet(d).schema

    def canonicalize(df):
        url = F.concat(
            F.lit("HTTPS://WWW."), F.col("source"),
            F.lit(".Example.com/item/"),
            (F.col("doc_id") % 50).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(
                F.lit("")
            ),
        )
        canon = F.regexp_replace(
            F.regexp_replace(
                F.lower(F.regexp_replace(url, r"\?.*$", "")),
                r"^https://www\.", "https://",
            ),
            "/$", "",
        )
        return df.select("doc_id", "source", canon.alias("canonical"))

    batch_keys = {
        (r.source, r.canonical)
        for r in canonicalize(spark.read.parquet(d))
        .dropDuplicates(["source", "canonical"]).collect()
    }
    q = (
        canonicalize(spark.readStream.schema(schema).parquet(d))
        .dropDuplicates(["source", "canonical"])
        .writeStream.format("memory")
        .queryName("url_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT source, canonical FROM url_dedup_stream"
    ).collect()
    assert len(got) == len(batch_keys) > 0
    assert {(r.source, r.canonical) for r in got} == batch_keys
