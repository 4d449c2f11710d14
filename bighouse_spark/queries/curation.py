"""Corpus-curation queries over the ``documents`` fixture:
benchmark decontamination, deterministic stratified sampling,
weighted source mixing, token-budget sequence packing.

All four are exact and oracle-checked: sampling and packing decisions
derive from the md5_60 bucket hash (``operators/curation.md5_bucket``)
that DuckDB reproduces bit-for-bit, so there is no RNG anywhere in
the pipeline — re-running a mix reproduces it exactly, which is the
property a training-data pipeline actually needs from its sampler.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.operators.curation import (
    decontaminate,
    hash_sample,
    pack_sequences,
    stratified_sample,
)
from bighouse_spark.queries.registry import query, t

# DuckDB twin of functions.text.word_shingles (incl. the short-doc
# fallback: a doc with fewer than n words contributes its full text
# as one shingle).
_SH3 = """
CASE WHEN len(string_split(text, ' ')) >= 3
     THEN list_distinct(list_transform(
            range(1, len(string_split(text, ' ')) - 2 + 1),
            i -> array_to_string(
                   list_slice(string_split(text, ' '), i, i + 2), ' ')))
     ELSE [text] END
"""

# DuckDB twin of operators.curation.md5_bucket.
def _bucket(expr: str, buckets: int) -> str:
    return (
        f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"
        f" % {buckets})"
    )


# Benchmark decontamination: docs with id < 20 act as the held-out
# eval set; the remaining corpus drops every doc sharing any 3-gram
# with it. Output = the surviving corpus ids (the thing a pipeline
# writes onward).
@query(
    "curation_decontaminate",
    oracle=f"""
WITH ev AS (
  SELECT DISTINCT unnest({_SH3}) AS sh FROM documents WHERE doc_id < 20
), corpus AS (
  SELECT doc_id, {_SH3} AS shs FROM documents WHERE doc_id >= 20
), dirty AS (
  SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(shs) AS sh FROM corpus) c
  JOIN ev USING (sh)
)
SELECT doc_id FROM corpus
WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
""",
)
def curation_decontaminate(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    eval_set = docs.where(F.col("doc_id") < 20)
    corpus = docs.where(F.col("doc_id") >= 20)
    return decontaminate(corpus, eval_set, shingle_n=3).select("doc_id")


# Deterministic stratified sampling by language: en kept at 80%,
# others per the map / 10% default. Content-hash sampling — the same
# rows come back on every run and in the oracle.
@query(
    "curation_stratified_sample",
    oracle=f"""
SELECT doc_id, lang FROM documents
WHERE {_bucket('doc_id', 100)} <
      (CASE WHEN lang = 'en' THEN 80
            WHEN lang = 'de' THEN 50
            WHEN lang = 'es' THEN 50
            ELSE 10 END)
""",
)
def curation_stratified_sample(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", {"en": 80, "de": 50, "es": 50}, default_pct=10
    ).select("doc_id", "lang")


# Weighted source mixture: per-source keep fractions (a 75/25-style
# training mix), reported as per-source doc/token totals.
@query(
    "curation_mixture_weighted",
    oracle=f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents
WHERE ({_bucket('doc_id', 100)} <
       (CASE WHEN source = 'src0' THEN 75 ELSE 25 END))
GROUP BY source
ORDER BY source
""",
)
def curation_mixture_weighted(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    mixed = hash_sample(docs.where(F.col("source") == "src0"), 75).unionAll(
        hash_sample(docs.where(F.col("source") != "src0"), 25)
    )
    from bighouse_spark.functions.text import token_count

    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
        )
        .orderBy("source")
    )


# Token-budget sequence packing: contiguous greedy bins of 512 tokens
# within 8 deterministic shards; per-bin stats.
@query(
    "curation_pack_sequences",
    oracle=f"""
WITH toks AS (
  SELECT {_bucket('doc_id', 8)} AS shard, doc_id,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), packed AS (
  SELECT shard, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
)
SELECT shard, CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
FROM packed
GROUP BY shard, bin
ORDER BY shard, bin
""",
)
def curation_pack_sequences(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (
        pack_sequences(docs, token_budget=512, n_shards=8)
        .groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("shard", "bin")
    )


# Incremental snapshot dedup: an incoming batch (sources src3+) is
# ingested against an existing snapshot (src0-src2); any incoming doc
# whose normalized fingerprint already exists in the snapshot is
# dropped, and exact duplicates inside the batch keep one
# representative (min doc_id). This is the day-2 ingestion shape: the
# snapshot side reduces to distinct fixed-width fingerprints, the
# anti-join shuffles on that uniform key, and nothing ever compares
# documents pairwise. At 100 TB the snapshot fingerprint set is
# orders of magnitude smaller than the snapshot itself and both sides
# partition-prune on the hash key.
@query(
    "curation_incremental_dedup",
    oracle="""
WITH fp AS (
  SELECT doc_id, source,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
), snap AS (
  SELECT DISTINCT fp FROM fp WHERE source IN ('src0', 'src1', 'src2')
), batch AS (
  SELECT * FROM fp WHERE source NOT IN ('src0', 'src1', 'src2')
), fresh AS (
  SELECT b.fp, min(b.doc_id) AS keep_id
  FROM batch b LEFT JOIN snap s ON b.fp = s.fp
  WHERE s.fp IS NULL
  GROUP BY b.fp
)
SELECT CAST((SELECT count(*) FROM batch) AS BIGINT) AS batch_docs,
       CAST((SELECT count(*) FROM fresh) AS BIGINT) AS kept_docs,
       CAST((SELECT count(*) FROM batch) - (SELECT count(*) FROM fresh)
            AS BIGINT) AS dropped_docs,
       CAST((SELECT coalesce(sum(keep_id), 0) FROM fresh) AS BIGINT)
         AS kept_id_checksum
""",
)
def curation_incremental_dedup(spark, sf_dir):
    from bighouse_spark.functions.text import fingerprint

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", fingerprint("text").alias("fp")
    )
    snapshot_sources = ["src0", "src1", "src2"]
    snap = (
        docs.where(F.col("source").isin(snapshot_sources))
        .select("fp")
        .distinct()
    )
    batch = docs.where(~F.col("source").isin(snapshot_sources))
    fresh = (
        batch.join(snap, "fp", "left_anti")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    n_batch = batch.agg(
        F.count(F.lit(1)).cast("bigint").alias("batch_docs")
    )
    stats = fresh.agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_docs"),
        F.coalesce(F.sum("keep_id"), F.lit(0))
        .cast("bigint")
        .alias("kept_id_checksum"),
    )
    return n_batch.crossJoin(stats).select(
        "batch_docs",
        "kept_docs",
        (F.col("batch_docs") - F.col("kept_docs")).alias("dropped_docs"),
        "kept_id_checksum",
    )


# Data-quality constraint validation (Deequ-style): completeness,
# key uniqueness, and range checks computed in ONE aggregate pass and
# unpivoted to a (check, observed, passed) report — the pre-training
# gate a corpus/warehouse job runs before shipping a snapshot. At
# 100 TB this stays a single scan: every metric is a sum/count over
# the same pass, and stack() is a projection of the one-row result.
@query(
    "quality_constraint_report",
    oracle="""
WITH m AS (
  SELECT count(*) AS n,
         count(l_orderkey) AS n_ok,
         count(DISTINCT (l_orderkey, l_linenumber)) AS n_pk,
         sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
                  THEN 1 ELSE 0 END) AS n_qty,
         sum(CASE WHEN l_extendedprice > 0 THEN 1 ELSE 0 END) AS n_price
  FROM lineitem
)
SELECT check_name, observed, observed >= 1.0 AS passed FROM (
  SELECT 'orderkey_complete' AS check_name,
         round(CAST(n_ok AS DOUBLE) / n, 6) AS observed FROM m
  UNION ALL
  SELECT 'linenumber_pk_unique', round(CAST(n_pk AS DOUBLE) / n, 6) FROM m
  UNION ALL
  SELECT 'quantity_in_1_50', round(CAST(n_qty AS DOUBLE) / n, 6) FROM m
  UNION ALL
  SELECT 'price_positive', round(CAST(n_price AS DOUBLE) / n, 6) FROM m
)
""",
)
def quality_constraint_report(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_orderkey").alias("n_ok"),
        F.count_distinct("l_orderkey", "l_linenumber").alias("n_pk"),
        F.sum(
            F.when(
                (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50), 1
            ).otherwise(0)
        ).alias("n_qty"),
        F.sum(
            F.when(F.col("l_extendedprice") > 0, 1).otherwise(0)
        ).alias("n_price"),
    )
    report = m.selectExpr(
        """stack(4,
             'orderkey_complete',    round(CAST(n_ok AS DOUBLE) / n, 6),
             'linenumber_pk_unique', round(CAST(n_pk AS DOUBLE) / n, 6),
             'quantity_in_1_50',     round(CAST(n_qty AS DOUBLE) / n, 6),
             'price_positive',       round(CAST(n_price AS DOUBLE) / n, 6)
           ) AS (check_name, observed)"""
    )
    return report.withColumn("passed", F.col("observed") >= 1.0)


# Deterministic train/val/test split (80/10/10): the doc_id's md5
# bucket decides the split, so assignment is stable across runs,
# engines, retried tasks, and future corpus versions (a doc keeps its
# split when new docs arrive — no RNG, no global shuffle; pure
# scan-side assignment, one tiny rollup).
@query(
    "curation_train_val_test_split",
    oracle=f"""
WITH s AS (
  SELECT source,
         CASE WHEN {_bucket('doc_id', 100)} < 80 THEN 'train'
              WHEN {_bucket('doc_id', 100)} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs
FROM s GROUP BY source, split
ORDER BY source, split
""",
)
def curation_train_val_test_split(spark, sf_dir):
    from bighouse_spark.operators.curation import md5_bucket

    docs = t(spark, sf_dir, "documents")
    b = md5_bucket(F.col("doc_id"), 100)
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("source", "split")
    )


# Overlapping token-window chunking (context-window prep): chunk i
# covers tokens [i*24, i*24+32) — size 32, overlap 8. Every chunk row
# carries a content md5 so the oracle verifies chunk CONTENT, not
# just counts, without shipping chunk text through the comparator.
@query(
    "curation_chunk_documents",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         len(string_split(text, ' ')) AS n
  FROM documents
), counted AS (
  SELECT doc_id, tk,
         CASE WHEN n <= 32 THEN 1
              ELSE CAST(ceil((n - 32) / 24.0) AS INT) + 1 END AS n_chunks
  FROM toks
)
SELECT doc_id, CAST(u.i AS INT) AS chunk_id,
       CAST(len(list_slice(tk, u.i * 24 + 1, u.i * 24 + 32)) AS INT)
         AS n_chunk_tokens,
       md5(array_to_string(list_slice(tk, u.i * 24 + 1, u.i * 24 + 32), ' '))
         AS chunk_md5
FROM counted, unnest(range(0, n_chunks)) AS u(i)
ORDER BY doc_id, chunk_id
""",
)
def curation_chunk_documents(spark, sf_dir):
    from bighouse_spark.operators.chunking import chunk_documents

    docs = t(spark, sf_dir, "documents")
    return (
        chunk_documents(docs, size=32, overlap=8)
        .select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_md5")
        .orderBy("doc_id", "chunk_id")
    )
