"""End-to-end training-corpus preparation pipeline over ``documents``
— the composite flow a 100 TB data-curation job runs, expressed as ONE
declarative plan so Catalyst fuses it:

  quality-score → language-ID → quality gate → exact dedup (normalized
  fingerprint, keep min doc_id) → per-language corpus stats.

Everything is deterministic closed-form column math (the score,
langid, and fingerprint formulas are the oracle-checked ones from
``functions/text.py``), so the WHOLE pipeline is DuckDB-checkable —
the integration proof that stages compose without drift, not just
pass individually.

Scale shape: one scan computes score+lang+fingerprint map-side; the
dedup is one shuffle on the 32-byte fingerprint (uniform key); the
stats are a partial-aggregated groupBy on ~5 language keys. Three
wide dependencies total for the full curation pass.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bighouse_spark.functions.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)
from bighouse_spark.queries.registry import query, t

_ORACLE = """
WITH scored AS (
  SELECT doc_id, text,
    round(least(len(string_split(text, ' ')) / 50.0, 1.0) * 0.4
      + (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
         / length(text)) * 0.3
      + least((len(list_filter(string_split(text, ' '),
          w -> list_contains(['the','a','an','and','or','of','to','in',
                              'is','it','that','for','on','with','as',
                              'at','by','from'], w)))
          / len(string_split(text, ' '))) * 5.0, 1.0) * 0.3, 6) AS quality,
    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
    len(string_split(text, ' ')) AS n_tok,
    len(list_intersect(list_distinct(string_split(text,' ')),
        ['der','die','und','das','ein'])) AS s_de,
    len(list_intersect(list_distinct(string_split(text,' ')),
        ['the','and','of','to','a'])) AS s_en,
    len(list_intersect(list_distinct(string_split(text,' ')),
        ['la','el','de','que','y'])) AS s_es,
    len(list_intersect(list_distinct(string_split(text,' ')),
        ['le','la','de','et','un'])) AS s_fr,
    len(list_intersect(list_distinct(string_split(text,' ')),
        ['的','是','了','在','我'])) AS s_zh
  FROM documents
), langed AS (
  SELECT *, CASE
    WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
    WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
    WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
    WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
    ELSE 'zh' END AS lang
  FROM scored
), gated AS (
  SELECT * FROM langed WHERE quality >= 0.5 AND lang <> 'und'
), deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM gated) WHERE rn = 1
)
SELECT lang,
       CASE WHEN quality >= 0.7 THEN 'high'
            WHEN quality >= 0.6 THEN 'mid'
            ELSE 'low' END AS quality_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(avg(quality), 6) AS avg_quality
FROM deduped
GROUP BY lang, quality_band
ORDER BY lang, quality_band
"""


@query("pipeline_training_corpus", oracle=_ORACLE)
def pipeline_training_corpus(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        quality_score("text").alias("quality"),
        language_id("text").alias("lang"),
        fingerprint("text").alias("fp"),
        token_count("text").alias("n_tok"),
    )
    gated = docs.where((F.col("quality") >= 0.5) & (F.col("lang") != "und"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    band = (
        F.when(F.col("quality") >= 0.7, "high")
        .when(F.col("quality") >= 0.6, "mid")
        .otherwise("low")
        .alias("quality_band")
    )
    return (
        deduped.groupBy("lang", band)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("lang", "quality_band")
    )
