"""Corpus-quality operators beyond the basic text stats: Gopher-style
repetition signals and PII scrubbing.

Both are exact (shared tokenization / regex contracts with the DuckDB
oracle) and shuffle-light: repetition aggregates explode-grouped token
counts (two narrow-keyed shuffles over (doc_id, token), the shape that
scales linearly with executors); PII redaction is a pure scan — chained
global regexp_replace inside whole-stage codegen, no UDF, no shuffle
before the final one-row aggregate.

The fixture text carries no PII, so the PII query derives a
contact-bearing column from fixture data with the same closed-form
expression in Spark and in the oracle — the plumbing under test is the
redaction scan, not the synthesis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.functions.text import pii_count, redact_pii, tokens
from bighouse_spark.queries.registry import query, t


# Gopher-style repetition filters (duplicate-word ratio, top-word
# fraction, duplicate-2gram ratio) for docs 0..99. Thresholds in
# pass_gopher are applied to the already-rounded ratios so the boolean
# is engine-independent.
@query(
    "text_repetition_scores",
    oracle="""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE doc_id < 100
), wc AS (
  SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word
), d1 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         count(*) AS n_distinct, max(c) AS top_c
  FROM wc GROUP BY doc_id
), g AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 1, 0) + 1),
           i -> array_to_string(
                  list_slice(string_split(text, ' '), i, i + 1), ' ')
         )) AS gram
  FROM documents WHERE doc_id < 100 AND len(string_split(text, ' ')) >= 2
), gc AS (
  SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram
), d2 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         count(*) AS n_gram_distinct
  FROM gc GROUP BY doc_id
), j AS (
  SELECT d1.doc_id, n_words,
         round(1 - n_distinct / CAST(n_words AS DOUBLE), 6)
           AS dup_word_ratio,
         round(top_c / CAST(n_words AS DOUBLE), 6) AS top_word_frac,
         round(1 - n_gram_distinct / CAST(n_grams AS DOUBLE), 6)
           AS dup_2gram_ratio
  FROM d1 JOIN d2 ON d1.doc_id = d2.doc_id
)
SELECT doc_id, n_words, dup_word_ratio, top_word_frac, dup_2gram_ratio,
       (dup_word_ratio <= 0.9 AND top_word_frac <= 0.25
        AND dup_2gram_ratio <= 0.75) AS pass_gopher
FROM j
""",
)
def text_repetition_scores(spark, sf_dir):
    docs = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select("doc_id", tokens("text").alias("w"))
    )
    words = docs.select("doc_id", F.explode("w").alias("tok"))
    d1 = (
        words.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
    )
    # Non-distinct 2-grams (word_shingles dedups, repetition must not).
    grams = docs.where(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, 2)),
            )
        ).alias("gram"),
    )
    d2 = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.count(F.lit(1)).alias("n_gram_distinct"),
        )
    )
    dup_w = F.round(1 - F.col("n_distinct") / F.col("n_words"), 6)
    top_w = F.round(F.col("top_c") / F.col("n_words"), 6)
    dup_g = F.round(1 - F.col("n_gram_distinct") / F.col("n_grams"), 6)
    return (
        d1.join(d2, "doc_id")
        .select(
            "doc_id",
            "n_words",
            dup_w.alias("dup_word_ratio"),
            top_w.alias("top_word_frac"),
            dup_g.alias("dup_2gram_ratio"),
        )
        .withColumn(
            "pass_gopher",
            (F.col("dup_word_ratio") <= 0.9)
            & (F.col("top_word_frac") <= 0.25)
            & (F.col("dup_2gram_ratio") <= 0.75),
        )
    )


# PII scrub over a derived contact-bearing column (fixture text has no
# PII; synthesis formula is identical in both engines). Counts per
# kind, bytes removed, and a residual-scan proof that the redacted
# text is clean.
@query(
    "text_pii_redact",
    oracle=r"""
WITH d AS (
  SELECT doc_id,
         text || ' contact ' || source || '@example.com from 10.0.'
           || CAST(doc_id % 256 AS VARCHAR) || '.7 call 555-867-'
           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t2
  FROM documents
), r AS (
  SELECT doc_id, t2,
         regexp_replace(
           regexp_replace(
             regexp_replace(t2,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS red
  FROM d
)
SELECT count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(t2,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT)
         AS n_emails,
       CAST(sum(len(regexp_extract_all(t2,
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) AS BIGINT) AS n_ips,
       CAST(sum(len(regexp_extract_all(t2,
         '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))) AS BIGINT) AS n_phones,
       CAST(sum(length(t2) - length(red)) AS BIGINT) AS chars_removed,
       CAST(sum(len(regexp_extract_all(red,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
         + len(regexp_extract_all(red,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
         + len(regexp_extract_all(red,
           '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))) AS BIGINT) = 0 AS all_clean
FROM r
""",
)
def text_pii_redact(spark, sf_dir):
    derived = F.concat(
        F.col("text"),
        F.lit(" contact "),
        F.col("source"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 call 555-867-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    d = t(spark, sf_dir, "documents").select(
        "doc_id", derived.alias("t2")
    )
    r = d.select(
        "t2",
        redact_pii("t2").alias("red"),
        pii_count("t2", "email").alias("k_email"),
        pii_count("t2", "ipv4").alias("k_ip"),
        pii_count("t2", "phone").alias("k_phone"),
    )
    residual = (
        pii_count("red", "email")
        + pii_count("red", "ipv4")
        + pii_count("red", "phone")
    )
    return r.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("k_email").alias("n_emails"),
        F.sum("k_ip").alias("n_ips"),
        F.sum("k_phone").alias("n_phones"),
        F.sum(F.length("t2") - F.length("red")).alias("chars_removed"),
        (F.sum(residual) == 0).alias("all_clean"),
    )


# Corpus-trained bigram-LM fluency score — the perplexity-filter
# shape of a training-data pipeline (score each doc by how predictable
# its bigrams are under a model fit on the corpus itself), kept in
# EXACT integer arithmetic so the DuckDB oracle matches bit-for-bit:
# per-bigram probability as (1e6 * c(w1,w2)) DIV c(w1) ppm, per-doc
# average as (sum_ppm * 1e6) DIV n — no floating point anywhere.
# Scale shape: two count aggregations (unigram, bigram) + a re-join
# of the exploded bigram stream on its (w1, w2) key — all uniform
# hash keys; the unigram side is vocabulary-sized and broadcasts
# under AQE when small.
@query(
    "text_bigram_fluency",
    oracle="""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 2
), grams AS (
  SELECT doc_id, w[u.i] AS w1, w[u.i + 1] AS w2
  FROM docs, unnest(range(1, len(w))) AS u(i)
), uni AS (
  SELECT tok, count(*) AS cu
  FROM (SELECT unnest(w) AS tok FROM docs) GROUP BY tok
), big AS (
  SELECT w1, w2, count(*) AS cb FROM grams GROUP BY w1, w2
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum((1000000 * cb) // cu) AS BIGINT) AS sum_ppm,
       CAST((sum((1000000 * cb) // cu) * 1000000) // count(*) AS BIGINT)
         AS avg_ppm_micro
FROM grams g
JOIN big USING (w1, w2)
JOIN uni ON uni.tok = g.w1
GROUP BY g.doc_id
ORDER BY g.doc_id
""",
)
def text_bigram_fluency(spark, sf_dir):
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 2)
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), "
                "i -> struct(element_at(w, i) AS w1, "
                "element_at(w, i + 1) AS w2))"
            )
        ).alias("g"),
    ).select("doc_id", "g.w1", "g.w2")
    uni = (
        docs.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    big = (
        grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    )
    ppm = F.expr("(1000000 * cb) div cu")
    return (
        grams.join(big, ["w1", "w2"])
        .join(uni, grams.w1 == uni.tok)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(ppm).cast("bigint").alias("sum_ppm"),
            F.expr(
                "CAST((sum((1000000 * cb) div cu) * 1000000) "
                "div count(*) AS BIGINT)"
            ).alias("avg_ppm_micro"),
        )
        .orderBy("doc_id")
    )
