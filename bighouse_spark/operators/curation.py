"""Corpus-curation operators a large-scale training pipeline needs
beyond dedup/similarity: benchmark decontamination, deterministic
stratified sampling, weighted dataset mixing, and token-budget
sequence packing.

Extension surface beyond the reference (which delegates all relational
work to ClickHouse SQL); everything here is DataFrame composition —
no Python in any hot path — and every operator has a closed-form
definition a SQL oracle can replicate exactly.

Scale shapes (100 TB posture):

* **decontaminate** — the eval/benchmark side is small by nature
  (thousands of docs); its shingle set broadcasts, so the corpus is
  filtered in a single scan + broadcast anti-join. No corpus shuffle.
* **hash_sample / stratified_sample** — sampling by a content hash of
  the id, not ``rand()``: deterministic across runs/retries (critical
  for reproducible training mixes), no RNG state in the plan, pure
  scan-side filter. No shuffle, no driver.
* **weighted mixture** — per-source hash-sampling fractions + a
  source tag; union of scans, each filter pushed to its own scan.
* **pack_sequences** — contiguous greedy packing into token-budget
  bins, sharded: a windowed cumulative sum PER SHARD assigns bins, so
  the only wide op is a per-shard sort — shards are independent and
  the global window bottleneck (one reducer) never appears. Bins are
  named (shard, bin) — exactly how a 1000-executor packing job would
  emit shards of packed sequences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bighouse_spark.functions.text import token_count, with_shingles


def md5_bucket(col: Column, buckets: int) -> Column:
    """Deterministic bucket in [0, buckets) from a 60-bit md5-derived
    integer — the same expression DuckDB computes as
    ``('0x'||substr(md5(x),1,15))::BIGINT % buckets``, so any sampling
    decision built on it is oracle-checkable bit-for-bit."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
    return h.cast("long") % buckets


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Drop corpus documents sharing ANY ``shingle_n``-gram with the
    eval/benchmark set — the standard guard against benchmark leakage
    into training data.

    The eval shingle vocabulary is distinct-ed and broadcast; corpus
    docs are dropped via a broadcast left-anti join from their
    exploded shingles. Returns the clean corpus (original columns).
    """
    eval_shingles = (
        with_shingles(eval_set, text_col=text_col, n=shingle_n)
        .select(F.explode("shingles").alias("__sh"))
        .distinct()
    )
    contaminated = (
        with_shingles(corpus, text_col=text_col, n=shingle_n)
        .select(
            F.col(id_col).alias("__cid"),
            F.explode("shingles").alias("__sh"),
        )
        .join(F.broadcast(eval_shingles), "__sh", "left_semi")
        .select("__cid")
        .distinct()
    )
    return corpus.join(
        contaminated, corpus[id_col] == F.col("__cid"), "left_anti"
    )


def hash_sample(
    df: DataFrame,
    fraction_pct: int,
    id_col: str = "doc_id",
    buckets: int = 100,
) -> DataFrame:
    """Deterministic ``fraction_pct``/``buckets`` sample by content
    hash of the id. Reproducible across runs and engines (md5-based),
    zero shuffle."""
    return df.where(md5_bucket(F.col(id_col), buckets) < fraction_pct)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, int],
    default_pct: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps stratum
    value → percentage kept (0-100). Strata absent from the map keep
    ``default_pct``. One scan, filter pushed down, no shuffle."""
    pct = F.lit(default_pct)
    for value, p in sorted(fractions.items()):
        pct = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(pct)
    return df.where(md5_bucket(F.col(id_col), 100) < pct)


def pack_sequences(
    df: DataFrame,
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 32,
) -> DataFrame:
    """Contiguous greedy packing of documents into token-budget bins,
    sharded for scale.

    Documents are assigned to ``n_shards`` deterministic shards
    (md5 of id), ordered by id within each shard, and a windowed
    cumulative token count assigns bin ids: a new bin starts whenever
    the running total crosses the budget — ``bin = floor((cumsum -
    tokens) / budget)``, i.e. a doc that straddles a boundary opens
    the next bin. Deterministic, SQL-expressible (oracle-checkable),
    and the window partitions by shard so no global sort exists.

    Returns (shard, bin, doc_id, n_tokens).
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            md5_bucket(F.col(id_col), n_shards).alias("shard"),
            F.col(id_col),
            token_count(F.col(text_col)).alias("n_tokens"),
        )
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .select(
            "shard",
            F.floor((F.col("__cum") - F.col("n_tokens")) / token_budget)
            .cast("bigint")
            .alias("bin"),
            id_col,
            "n_tokens",
        )
    )
