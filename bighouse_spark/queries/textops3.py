"""Round-5 corpus-curation additions: C4-style line-level cleaning
(Raffel et al. 2020, the standard Common-Crawl page filter) and
SemDeDup-style within-cluster semantic dedup (Abbas et al. 2023).

Scale shapes:

* ``text_c4_filters`` — one corpus scan; the per-line predicates are
  pure column expressions over an exploded derived-line stream, and
  the page verdict is a single groupBy(doc_id). One narrow shuffle on
  doc_id; no UDF anywhere. The fixture text has no newlines or
  punctuation, so (exactly like ``text_pii_redact``) the lines are
  DERIVED with a closed-form shared by Spark and the oracle — lines
  of 8 tokens, with terminal punctuation, a "javascript" token, a
  curly-brace line, and a "lorem ipsum" line injected on deterministic
  doc_id/line-index conditions. The plumbing under test is the filter
  scan, not the synthesis.
* ``dedup_semantic_within_cluster`` — the SemDeDup contract: dedup
  only WITHIN a cluster (here the fixture ``label``), never across the
  corpus, so the join key is the cluster id and the all-pairs blowup
  is bounded by the largest cluster, not the corpus. At 100 TB the
  cluster count is chosen so n/k rows fit an executor (SemDeDup uses
  k ~ sqrt(n)). A DEGENERATE cluster (k-means collapse, constant
  embeddings) is additionally capped: only the first
  ``max_cluster_size`` members by id enter the pairwise step
  (deterministic keep-first subsample, same rule as the LSH
  hot-bucket cap), bounding any one cluster's pair count at
  N·(N−1)/2 no matter how many rows share the label; members beyond
  the cap are kept verbatim (never compared, never dropped). The cap
  (512) exceeds every fixture cluster, so the exact SQL oracle is
  unaffected. Representative selection is the deterministic min-id
  greedy rule (a vec is dropped iff a smaller-id neighbor in its
  cluster clears the threshold), which is exactly SQL-expressible,
  so the oracle is exact. θ=0.3 is calibrated to the fixture
  geometry (the synthetic embeddings carry no ≥0.95 twins).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.functions.text import tokens
from bighouse_spark.queries.registry import query, t

_LINE_W = 8  # tokens per derived line


@query(
    "text_c4_filters",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id < 300 AND len(string_split(text, ' ')) >= 1
), lined AS (
  SELECT doc_id,
         list_concat(list_concat(
           list_transform(
             range(0, CAST(ceil(len(w) / {_LINE_W}.0) AS BIGINT)),
             i -> (CASE WHEN (doc_id + i) % 11 = 0
                        THEN 'javascript ' ELSE '' END)
                  || array_to_string(
                       list_slice(w, i * {_LINE_W} + 1,
                                  i * {_LINE_W} + {_LINE_W}), ' ')
                  || (CASE WHEN (doc_id + i) % 3 != 0
                           THEN '.' ELSE '' END)),
           CASE WHEN doc_id % 13 = 0
                THEN ['function() {{'] ELSE [] END),
           CASE WHEN doc_id % 17 = 0
                THEN ['lorem ipsum dolor sit amet.'] ELSE [] END
         ) AS lines
  FROM d
), ln AS (
  SELECT doc_id, unnest(lines) AS line FROM lined
), scored AS (
  SELECT doc_id, line,
         len(string_split(line, ' ')) AS wc,
         right(line, 1) IN ('.', '!', '?', '"') AS ends_punct,
         contains(lower(line), 'javascript') AS has_js,
         contains(lower(line), 'lorem ipsum') AS is_lorem,
         contains(line, '{{') AS has_brace
  FROM ln
), agg AS (
  SELECT doc_id,
         count(*) AS n_lines,
         CAST(count(*) FILTER (ends_punct AND wc >= 3 AND NOT has_js)
              AS BIGINT) AS n_kept_lines,
         CAST(coalesce(sum(wc) FILTER
              (ends_punct AND wc >= 3 AND NOT has_js), 0)
              AS BIGINT) AS kept_words,
         bool_or(is_lorem) AS has_lorem,
         bool_or(has_brace) AS has_curly
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_lines, n_kept_lines, kept_words, has_lorem, has_curly,
       (NOT has_lorem AND NOT has_curly AND n_kept_lines >= 5) AS pass_c4
FROM agg
""",
)
def text_c4_filters(spark, sf_dir):
    """C4 page cleaning (Raffel et al. 2020 §2.2): keep lines ending
    in terminal punctuation with ≥3 words and no "javascript"; drop
    pages containing "lorem ipsum" or a curly brace or fewer than 5
    retained lines. Pure column expressions; one shuffle on doc_id."""
    w = _LINE_W
    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 300)
        .select("doc_id", tokens("text").alias("w"))
        .where(F.size("w") >= 1)
    )
    body = F.expr(
        f"""transform(
              sequence(0, cast(ceil(size(w) / {w}.0) as bigint) - 1),
              i -> concat(
                CASE WHEN (doc_id + i) % 11 = 0
                     THEN 'javascript ' ELSE '' END,
                array_join(slice(w, cast(i * {w} + 1 as int), {w}), ' '),
                CASE WHEN (doc_id + i) % 3 != 0 THEN '.' ELSE '' END))"""
    )
    brace = F.when(
        F.col("doc_id") % 13 == 0, F.array(F.lit("function() {"))
    ).otherwise(F.array().cast("array<string>"))
    lorem = F.when(
        F.col("doc_id") % 17 == 0,
        F.array(F.lit("lorem ipsum dolor sit amet.")),
    ).otherwise(F.array().cast("array<string>"))
    lines = d.select(
        "doc_id",
        F.explode(F.concat(body, brace, lorem)).alias("line"),
    )
    wc = F.size(F.split(F.col("line"), " "))
    keep = (
        F.substring(F.col("line"), -1, 1).isin(".", "!", "?", '"')
        & (wc >= 3)
        & ~F.lower(F.col("line")).contains("javascript")
    )
    agg = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(keep.cast("bigint")).alias("n_kept_lines"),
        F.sum(F.when(keep, wc).otherwise(0)).cast("bigint").alias(
            "kept_words"
        ),
        F.bool_or(F.lower(F.col("line")).contains("lorem ipsum")).alias(
            "has_lorem"
        ),
        F.bool_or(F.col("line").contains("{")).alias("has_curly"),
    )
    return agg.withColumn(
        "pass_c4",
        ~F.col("has_lorem")
        & ~F.col("has_curly")
        & (F.col("n_kept_lines") >= 5),
    )


SEMDEDUP_MAX_CLUSTER = 512


@query(
    "dedup_semantic_within_cluster",
    oracle="""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id < 2000
), dropped AS (
  SELECT DISTINCT a.vec_id
  FROM v a JOIN v b
    ON a.label = b.label AND a.vec_id > b.vec_id
  WHERE list_cosine_similarity(a.e, b.e) >= 0.3
)
SELECT v.label,
       count(*) AS n_vecs,
       CAST(count(dropped.vec_id) AS BIGINT) AS n_dropped,
       CAST(count(*) - count(dropped.vec_id) AS BIGINT) AS n_kept
FROM v LEFT JOIN dropped ON v.vec_id = dropped.vec_id
GROUP BY v.label
""",
)
def dedup_semantic_within_cluster(
    spark, sf_dir, max_cluster_size: int = SEMDEDUP_MAX_CLUSTER
):
    """SemDeDup (Abbas et al. 2023): semantic dedup scoped to a
    cluster — a vector is dropped iff a SMALLER-ID vector in the same
    cluster has cosine ≥ θ (deterministic greedy keep-first). Join key
    is (label), so candidate pairs are bounded per-cluster, never
    corpus-all-pairs — and a degenerate cluster is further bounded by
    ``max_cluster_size``: only its first N members by id enter the
    pairwise step (keep-first, like the LSH hot-bucket cap), so one
    collapsed cluster costs at most N²/2 cosine pairs instead of
    going quadratic in its own size."""
    from pyspark.sql import Window

    from bighouse_spark.functions.vectors import cosine_similarity
    from bighouse_spark.operators.caching import tracked_persist

    v = (
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 2000)
        .select("vec_id", "label", "embedding")
    )
    # The rank window shuffles on exactly the key the self-join
    # hashes on; both join sides consume the capped table, so
    # materialize it once (same measured argument as the LSH cap,
    # operators/dedup.py).
    w = Window.partitionBy("label").orderBy("vec_id")
    capped = tracked_persist(
        v.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= max_cluster_size)
        .drop("__rk")
    )
    a = capped.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("la"),
        F.col("embedding").alias("ea"),
    )
    b = capped.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("eb"),
    )
    dropped = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("id_a") > F.col("id_b")))
        .where(cosine_similarity("ea", "eb") >= 0.3)
        .select(F.col("id_a").alias("vec_id"))
        .distinct()
    )
    return (
        v.join(dropped.withColumn("is_dup", F.lit(1)), "vec_id", "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
            (
                F.count(F.lit(1))
                - F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            )
            .cast("bigint")
            .alias("n_kept"),
        )
    )


@query(
    "text_boilerplate_lines",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS w
  FROM documents WHERE len(string_split(text, ' ')) >= 1
), lined AS (
  SELECT doc_id, source,
         list_concat(list_concat(
           ['copyright ' || source || ' all rights reserved'],
           list_transform(
             range(0, CAST(ceil(len(w) / {_LINE_W}.0) AS BIGINT)),
             i -> array_to_string(
                    list_slice(w, i * {_LINE_W} + 1,
                               i * {_LINE_W} + {_LINE_W}), ' '))),
           ['subscribe to ' || source || ' newsletter']
         ) AS lines
  FROM d
), ln AS (
  SELECT doc_id, source, unnest(lines) AS line FROM lined
)
SELECT line,
       count(DISTINCT doc_id) AS n_docs,
       count(DISTINCT source) AS n_sources
FROM ln GROUP BY line HAVING count(DISTINCT doc_id) >= 5
""",
)
def text_boilerplate_lines(spark, sf_dir):
    """Boilerplate detection (the CCNet/C4 header-footer pass): lines
    shared by ≥5 distinct documents are boilerplate, reported with
    their document and source spread. The fixture text carries no real
    headers, so (same contract as the C4/PII queries) per-source
    header/footer lines are DERIVED with a closed form shared with the
    oracle; the detector itself — explode lines, group by line text,
    distinct-doc counting — is the operator under test. One shuffle on
    the line key; at 100 TB hash the line to a fixed-width key first
    (same md5 trick as exact dedup) to keep shuffle rows narrow."""
    w = _LINE_W
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "source", tokens("text").alias("w"))
        .where(F.size("w") >= 1)
    )
    chunks = F.expr(
        f"""transform(
              sequence(0, cast(ceil(size(w) / {w}.0) as bigint) - 1),
              i -> array_join(slice(w, cast(i * {w} + 1 as int), {w}), ' '))"""
    )
    hdr = F.array(
        F.concat(F.lit("copyright "), F.col("source"),
                 F.lit(" all rights reserved"))
    )
    ftr = F.array(
        F.concat(F.lit("subscribe to "), F.col("source"),
                 F.lit(" newsletter"))
    )
    lines = d.select(
        "doc_id", "source",
        F.explode(F.concat(hdr, chunks, ftr)).alias("line"),
    )
    return (
        lines.groupBy("line")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        )
        .where(F.col("n_docs") >= 5)
    )


@query(
    "dedup_url_canonical",
    oracle="""
WITH d AS (
  SELECT doc_id, source,
         'HTTPS://WWW.' || source || '.Example.com/item/'
           || CAST(doc_id % 50 AS VARCHAR)
           || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
           || '?utm_source=s' || CAST(doc_id % 4 AS VARCHAR)
           || '&ref=r' || CAST(doc_id % 7 AS VARCHAR) AS url
  FROM documents
), c AS (
  SELECT doc_id, source,
         regexp_replace(
           regexp_replace(
             lower(regexp_replace(url, '\\?.*$', '')),
             '^https://www\\.', 'https://'),
           '/$', '') AS canonical
  FROM d
), g AS (
  SELECT source, canonical, count(*) AS n_urls,
         min(doc_id) AS keep_doc
  FROM c GROUP BY source, canonical
)
SELECT source,
       CAST(sum(n_urls) AS BIGINT) AS n_docs,
       count(*) AS n_canonical,
       CAST(sum(n_urls) - count(*) AS BIGINT) AS n_dropped
FROM g GROUP BY source
""",
)
def dedup_url_canonical(spark, sf_dir):
    """URL-canonicalization dedup (the first pass of every web-corpus
    pipeline): strip the query string (tracking params), lowercase,
    drop a leading ``www.`` and a trailing slash, then keep one doc
    per canonical URL (min doc_id). URLs are DERIVED (fixture docs
    carry none) with the shared closed form; the canonicalizer and the
    group-dedup are the operators under test. Pure column regexps +
    one aggregation keyed (source, canonical) — narrow uniform keys."""
    url = F.concat(
        F.lit("HTTPS://WWW."), F.col("source"), F.lit(".Example.com/item/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=s"), (F.col("doc_id") % 4).cast("string"),
        F.lit("&ref=r"), (F.col("doc_id") % 7).cast("string"),
    )
    canonical = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_replace(url, r"\?.*$", "")),
            r"^https://www\.", "https://",
        ),
        "/$", "",
    )
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", canonical.alias("canonical")
    )
    g = d.groupBy("source", "canonical").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.min("doc_id").alias("keep_doc"),
    )
    return g.groupBy("source").agg(
        F.sum("n_urls").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).alias("n_canonical"),
        (F.sum("n_urls") - F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_dropped"),
    )


@query(
    "text_html_extract",
    oracle=r"""
WITH d AS (
  SELECT doc_id,
         '<html><head><style>p {color: red}</style></head><body><h1>'
           || source || '</h1><p>' || text
           || ' &amp; more</p><script>var x = 1;</script></body></html>'
           AS html,
         text, source
  FROM documents WHERE doc_id < 200
), e AS (
  SELECT doc_id, text, source,
         trim(regexp_replace(regexp_replace(regexp_replace(html,
           '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
           '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS stripped
  FROM d
), f AS (
  SELECT doc_id,
         replace(stripped, '&amp;', '&') AS extracted,
         source || ' ' || text || ' & more' AS expected
  FROM e
)
SELECT count(*) AS n_docs,
       CAST(sum(length(extracted)) AS BIGINT) AS total_chars,
       bool_and(extracted = expected) AS all_exact
FROM f
""",
)
def text_html_extract(spark, sf_dir):
    """HTML → text extraction through the dialect's
    ``extractTextFromHTML`` expression (script/style removal, tag
    stripping, entity decode, whitespace collapse) — the first pass of
    every web-corpus pipeline. Fixture docs carry no markup, so the
    HTML is DERIVED with the shared closed form; the proof is that
    extraction recovers exactly the original text (headline + body +
    decoded entity). Pure column regexps; one scan, zero UDFs."""
    from bighouse_spark.dialect.transpile import transpile

    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    docs.createOrReplaceTempView("__bh_html_docs")
    sql = transpile(
        "SELECT doc_id, "
        "extractTextFromHTML(concat("
        "'<html><head><style>p {color: red}</style></head><body><h1>', "
        "source, '</h1><p>', text, "
        "' &amp; more</p><script>var x = 1;</script></body></html>'"
        ")) AS extracted, "
        "concat(source, ' ', text, ' & more') AS expected "
        "FROM __bh_html_docs",
        spark,
    ).sql
    f = spark.sql(sql)
    return f.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("extracted")).cast("bigint").alias("total_chars"),
        F.bool_and(F.col("extracted") == F.col("expected")).alias(
            "all_exact"
        ),
    )
