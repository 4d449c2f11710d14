"""Round-4 corpus-curation additions: Gopher-style structural quality
rules, per-source domination caps, and TF-IDF keyword extraction —
three standard stages of a web-scale (Common-Crawl-class) training
pipeline that were missing from the query inventory.

Scale shapes:

* ``text_gopher_rules`` — pure column expressions over one scan (mean
  word length, alpha-word fraction, symbol-to-word ratio, stopword
  hits); zero shuffles before the final filter/order. The thresholds
  follow the published Gopher rules (Rae et al. 2021, §A1.1), applied
  to rounded ratios so the booleans are engine-independent.
* ``curation_domain_cap`` — one window shuffle on ``source`` (the
  domain analog): rank docs per source by quality and keep top-N, the
  anti-domination cap every CC pipeline applies so one mirror site
  can't swamp the mixture. Skew note: a hot domain is exactly one
  window partition; at 100 TB cap hot partitions with a pre-aggregated
  count + sampled cut instead of a full sort if one domain exceeds
  executor memory.
* ``text_tfidf_topk`` — explode → (term, doc) counts → document
  frequency join → per-doc top-k by tf-idf. Two narrow-keyed shuffles
  (doc_id×term, then term) plus one window on doc_id; the df table is
  corpus-vocabulary-sized and broadcastable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bighouse_spark.functions.text import tokens
from bighouse_spark.queries.registry import query, t

_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


@query(
    "text_gopher_rules",
    oracle=f"""
WITH w AS (
  SELECT doc_id,
         string_split(text, ' ') AS toks
  FROM documents WHERE doc_id < 200
), s AS (
  SELECT doc_id,
         len(toks) AS n_words,
         round(list_sum(list_transform(toks, x -> length(x)))
               / CAST(len(toks) AS DOUBLE), 6) AS mean_word_len,
         round(len(list_filter(toks,
               x -> regexp_matches(x, '^[a-zA-Z]+$')))
               / CAST(len(toks) AS DOUBLE), 6) AS alpha_word_frac,
         round(length(regexp_replace(
               list_aggregate(toks, 'string_agg', ' '),
               '[^#%&$@*^~|<>]', '', 'g'))
               / CAST(len(toks) AS DOUBLE), 6) AS symbol_ratio,
         len(list_intersect(list_distinct(toks),
             {_STOPWORDS!r})) AS stop_hits
  FROM w
)
SELECT doc_id, n_words, mean_word_len, alpha_word_frac, symbol_ratio,
       stop_hits,
       (n_words BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3 AND 10
        AND alpha_word_frac >= 0.8
        AND symbol_ratio <= 0.1
        AND stop_hits >= 2) AS pass_gopher_rules
FROM s
""",
)
def text_gopher_rules(spark, sf_dir):
    """Gopher structural-quality rules (Rae et al. 2021 §A1.1) as one
    scan of pure column expressions — doc length bounds, mean word
    length window, alpha-word fraction, symbol-to-word ratio, minimum
    distinct stopwords."""
    toks = tokens("text")
    n_words = F.size(toks)
    joined = F.array_join(toks, " ")
    out = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            n_words.alias("n_words"),
            F.round(
                F.aggregate(
                    toks, F.lit(0), lambda a, x: a + F.length(x)
                )
                / n_words.cast("double"),
                6,
            ).alias("mean_word_len"),
            F.round(
                F.size(F.filter(toks, lambda x: x.rlike("^[a-zA-Z]+$")))
                / n_words.cast("double"),
                6,
            ).alias("alpha_word_frac"),
            F.round(
                F.length(F.regexp_replace(joined, "[^#%&$@*^~|<>]", ""))
                / n_words.cast("double"),
                6,
            ).alias("symbol_ratio"),
            F.size(
                F.array_intersect(
                    F.array_distinct(toks),
                    F.array(*[F.lit(s) for s in _STOPWORDS]),
                )
            ).alias("stop_hits"),
        )
    )
    return out.withColumn(
        "pass_gopher_rules",
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("stop_hits") >= 2),
    )


@query(
    "curation_domain_cap",
    oracle="""
WITH scored AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
)
SELECT source, count(*) AS kept,
       CAST(sum(n_chars) AS BIGINT) AS kept_chars
FROM scored WHERE rk <= 40
GROUP BY source
""",
)
def curation_domain_cap(spark, sf_dir):
    """Per-source domination cap: keep the best N docs per source
    (quality proxy: length, deterministic doc_id tiebreak) — one
    window shuffle on the source key, then a per-source report."""
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 40)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )


@query(
    "text_tfidf_topk",
    oracle="""
WITH docs AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS terms
  FROM documents WHERE doc_id < 300
), n AS (
  SELECT count(*) AS n_docs FROM docs
), tf AS (
  SELECT d.doc_id, u.term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents WHERE doc_id < 300) AS u
  JOIN docs d ON d.doc_id = u.doc_id
  GROUP BY d.doc_id, u.term
), df AS (
  SELECT term, count(*) AS df
  FROM (SELECT doc_id, unnest(terms) AS term FROM docs)
  GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, term, tfidf, rk FROM ranked WHERE rk <= 3
""",
)
def text_tfidf_topk(spark, sf_dir):
    """Top-3 TF-IDF terms per document, from ONE corpus scan: the
    (doc_id, term) count table is materialized once (the standard
    inverted-index persist — tracked, released at the request
    boundary), and BOTH document frequency (count per term: tf has
    exactly one row per (doc, term)) and the document count derive
    from it instead of rescanning the corpus. Deterministic term
    tiebreak keeps it oracle-exact. The plan lives in
    ``operators/tfidf.py`` so the ``tfidfTopK()`` SQL table function
    runs the identical shape."""
    from bighouse_spark.operators.tfidf import tfidf_topk

    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return tfidf_topk(docs, id_col="doc_id", text_col="text", k=3)
