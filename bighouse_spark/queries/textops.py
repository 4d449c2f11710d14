"""Training-data text pipeline over the ``documents`` fixture:
deduplication (exact, fingerprint, n-gram Jaccard, MinHash-LSH,
SimHash) and text analysis (language ID, quality scoring, token
stats, fingerprinting).

Oracle-checked where the computation is SQL-expressible; the LSH
variants are engine-specific (xxhash64 signatures) and get rows-only
driver checks plus semantic tests in tests/.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_features,
    quality_score,
    token_count,
)
from bighouse_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from bighouse_spark.queries.registry import query, t


# Exact dedup groups: content-hash groupBy, keep min doc_id.
@query(
    "dedup_exact_groups",
    oracle="""
SELECT md5(text) AS dup_key, min(doc_id) AS keep_id,
       count(*) AS group_size
FROM documents GROUP BY md5(text)
""",
)
def dedup_exact_groups(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("dup_key"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


# Fingerprint dedup: whitespace/case-normalized md5.
@query(
    "dedup_fingerprint",
    oracle="""
SELECT count(DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))))
         AS n_unique,
       count(*) AS n_docs
FROM documents
""",
)
def dedup_fingerprint(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.agg(
        F.count_distinct(fingerprint("text")).alias("n_unique"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# Exact n-gram (3-word shingle) Jaccard near-dup pairs via inverted
# index — the oracle-checkable exact variant.
@query(
    "dedup_ngram_jaccard",
    oracle="""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
         )) AS sh
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), sizes AS (
  SELECT doc_id, len(sh) AS n_sh FROM d
), inv AS (
  SELECT doc_id, unnest(sh) AS s FROM d
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.6
""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").where(
        F.size(F.split("text", " ")) >= 3
    )
    from bighouse_spark.sources.catalog import table_stats

    return ngram_jaccard_pairs(
        docs, shingle_n=3, threshold=0.6,
        input_stats=table_stats(spark, sf_dir, "documents"),
    )


# MinHash + LSH near-dup pairs — the 100 TB scale path. The output is
# candidate pairs verified by EXACT Jaccard ≥ threshold, so it is a
# subset of the exact all-pairs result, short only of pairs the
# banding missed; 32 hashes / 16 bands puts the s-curve's ~99% recall
# point at J=0.5, and at the fixture scales recall is exactly 1.0
# (asserted by the oracle match below and the recall tests), so the
# driver can hash-compare against the DuckDB exact twin.
@query(
    "dedup_minhash_lsh",
    oracle="""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
         )) AS sh
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), sizes AS (
  SELECT doc_id, len(sh) AS n_sh FROM d
), inv AS (
  SELECT doc_id, unnest(sh) AS s FROM d
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
""",
)
def dedup_minhash_lsh(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").where(
        F.size(F.split("text", " ")) >= 3
    )
    from bighouse_spark.sources.catalog import table_stats

    return minhash_lsh_pairs(
        docs, num_hashes=32, bands=16, shingle_n=3, jaccard_threshold=0.5,
        input_stats=table_stats(spark, sf_dir, "documents"),
    )


# SimHash near-dup pairs (Hamming <= 3). The registry entry uses the
# md5_60 hash family: 60-bit per-shingle hashes from the first 15 hex
# chars of md5, which DuckDB computes bit-identically — and the
# 4-band pigeonhole makes Hamming<=3 recall exactly 1.0, so the whole
# pipeline (signature, banding, verify) is oracle-checked, not
# rows-only. The xxhash64 family stays the scale default in
# operators/dedup.py. The oracle's 60-term bit-majority expression is
# generated below.
_SIMHASH_SIG_EXPR = "\n      + ".join(
    f"(CASE WHEN 2 * len(list_filter(hs, h -> ((h >> {b}) & 1) = 1)) "
    f"> len(hs) THEN (1::BIGINT << {b}) ELSE 0 END)"
    for b in range(60)
)


@query(
    "dedup_simhash",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 1, 0) + 1),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' ')
         )) AS sh
  FROM documents
  WHERE len(string_split(text, ' ')) >= 2
), h AS (
  SELECT doc_id,
         list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs
  FROM d
), s AS (
  SELECT doc_id, {_SIMHASH_SIG_EXPR} AS sig FROM h
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
""",
)
def dedup_simhash(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").where(
        F.size(F.split("text", " ")) >= 2
    )
    from bighouse_spark.sources.catalog import table_stats

    return simhash_pairs(
        docs, shingle_n=2, max_hamming=3, hash_fn="md5_60",
        input_stats=table_stats(spark, sf_dir, "documents"),
    )


# Language ID: stopword-marker argmax (ties → alphabetically first,
# no hits → 'und'). The oracle replicates the heuristic exactly.
@query(
    "text_language_id",
    oracle="""
WITH scored AS (
  SELECT doc_id,
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
)
SELECT pred_lang, count(*) AS n_docs FROM (
  SELECT CASE
    WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
    WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
    WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
    WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
    ELSE 'zh' END AS pred_lang
  FROM scored) x
GROUP BY pred_lang
""",
)
def text_language_id(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(language_id("text").alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# Per-document quality features + composite score (C4/Gopher-style
# heuristics). All closed-form; oracle replicates operand-for-operand.
@query(
    "text_quality_scores",
    oracle="""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
        / length(text), 6) AS alpha_ratio,
  round(len(list_filter(string_split(text, ' '),
        w -> list_contains(['the','a','an','and','or','of','to','in','is',
                            'it','that','for','on','with','as','at','by',
                            'from'], w)))
        / len(string_split(text, ' ')), 6) AS stopword_ratio,
  round(least(len(string_split(text, ' ')) / 50.0, 1.0) * 0.4
        + (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
           / length(text)) * 0.3
        + least((len(list_filter(string_split(text, ' '),
            w -> list_contains(['the','a','an','and','or','of','to','in',
                                'is','it','that','for','on','with','as',
                                'at','by','from'], w)))
            / len(string_split(text, ' '))) * 5.0, 1.0) * 0.3, 6)
    AS quality
FROM documents
""",
)
def text_quality_scores(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    f = quality_features("text")
    return docs.select(
        "doc_id",
        f["n_tokens"].cast("bigint").alias("n_tokens"),
        F.round(f["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(f["stopword_ratio"], 6).alias("stopword_ratio"),
        quality_score("text").alias("quality"),
    )


# Corpus token statistics: whitespace + BPE-ish counts.
@query(
    "text_token_stats",
    oracle="""
SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
       (SELECT count(DISTINCT w) FROM
         (SELECT unnest(string_split(text, ' ')) AS w FROM documents) u)
         AS distinct_tokens,
       CAST(sum(list_sum(list_transform(string_split(text, ' '),
                 w -> CAST(ceil(length(w) / 4.0) AS INT)))) AS BIGINT)
         AS bpe_ish_tokens
FROM documents
""",
)
def text_token_stats(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    stats = docs.agg(
        F.sum(token_count("text").cast("bigint")).alias("total_tokens"),
        F.max(token_count("text").cast("bigint")).alias("max_tokens"),
        F.sum(bpe_ish_token_count("text").cast("bigint")).alias(
            "bpe_ish_tokens"
        ),
    )
    distinct = words.agg(F.count_distinct("w").alias("distinct_tokens"))
    return stats.crossJoin(distinct).select(
        "total_tokens", "max_tokens", "distinct_tokens", "bpe_ish_tokens"
    )


# Document fingerprint profile: distinct normalized fingerprints.
@query(
    "text_fingerprints",
    oracle="""
SELECT count(DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))))
         AS n_fingerprints,
       min(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))))
         AS min_fp,
       max(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))))
         AS max_fp
FROM documents
""",
)
def text_fingerprints(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    fp = fingerprint("text")
    return docs.agg(
        F.count_distinct(fp).alias("n_fingerprints"),
        F.min(fp).alias("min_fp"),
        F.max(fp).alias("max_fp"),
    )


# Long-window substring dedup (the Lee et al. "deduplicating training
# data makes language models better" shape, proxied at the 20-token
# granularity): any two documents sharing a 20-token window are
# near-certain partial copies. Inverted index on the window's md5 —
# a fixed-width uniform key, so the candidate join shuffles hashes,
# never text; windows unique to one doc drop out map-side via the
# HAVING gate. At 100 TB this is the standard substring-contamination
# sweep: one explode (~n_tokens rows/doc), one count aggregate, one
# self-join on the surviving (rare) duplicate windows.
@query(
    "dedup_substring_20gram",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 20
), wins AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(list_slice(w, u.i, u.i + 19), ' ')) AS h
  FROM toks, unnest(range(1, len(w) - 19 + 1)) AS u(i)
), dup AS (
  SELECT h FROM wins GROUP BY h HAVING count(*) > 1
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS shared_windows
FROM wins a JOIN dup USING (h) JOIN wins b USING (h)
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY id_a, id_b
""",
)
def dedup_substring_20gram(spark, sf_dir):
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 20)
    )
    wins = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, size(w) - 19), "
                "i -> md5(array_join(slice(w, i, 20), ' '))))"
            )
        ).alias("h"),
    )
    dup = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .select("h")
    )
    pairs = (
        wins.join(dup, "h")
        .alias("a")
        .join(wins.join(dup, "h").alias("b"), "h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_windows"))
        .orderBy("id_a", "id_b")
    )
    return pairs


# Ranked keyword retrieval — the keyword side of hybrid search as a
# real scorer, not just a filter. TF x inverse-DF with the inverse
# document frequency held as an integer ppm ((1e6 * N) DIV df), so
# scores are exact integers in both engines (the log-idf variant is
# rank-similar but float; a training-data pipeline cares that the
# selected set is reproducible, which integers guarantee). Shape:
# one token explode, one DF rollup over the corpus, one broadcast-
# size term list, one per-doc aggregate — the inverted-index scan
# every search engine runs, expressed relationally.
@query(
    "text_keyword_search",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), n_docs AS (SELECT count(*) AS n FROM documents),
dfreq AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM words
  WHERE tok IN ('vector', 'hash', 'merge') GROUP BY tok
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM words
  WHERE tok IN ('vector', 'hash', 'merge') GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(sum(tf * ((1000000 * n) // df)) AS BIGINT) AS score,
       CAST(count(*) AS BIGINT) AS n_terms
FROM tf JOIN dfreq USING (tok) CROSS JOIN n_docs
GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 10
""",
)
def text_keyword_search(spark, sf_dir):
    terms = ["vector", "hash", "merge"]
    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok").isin(terms))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    dfreq = words.groupBy("tok").agg(
        F.count_distinct("doc_id").alias("df")
    )
    tf = words.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("tf * ((1000000 * n) div df)"))
            .cast("bigint").alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


@query(
    "dedup_cross_corpus_lsh",
    oracle="""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
         )) AS sh
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), sizes AS (
  SELECT doc_id, len(sh) AS n_sh FROM d
), inv AS (
  SELECT doc_id, unnest(sh) AS s FROM d
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM inv a JOIN inv b
    ON a.s = b.s AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
""",
)
def dedup_cross_corpus_lsh(spark, sf_dir):
    """Contamination detection: bipartite MinHash/LSH between two
    corpora (here the even/odd doc_id halves of ``documents`` stand
    in for training data vs a benchmark set). Candidates come from an
    equi-join of the two sides' band buckets — never a within-corpus
    self-join — and every emitted pair is verify-joined to exact
    shingle Jaccard, so the oracle is the true cross-pair set."""
    from bighouse_spark.operators.dedup import minhash_lsh_pairs_between

    docs = t(spark, sf_dir, "documents")
    from bighouse_spark.sources.catalog import table_stats

    stats = table_stats(spark, sf_dir, "documents")
    return minhash_lsh_pairs_between(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        jaccard_threshold=0.5,
        input_stats_a=stats,
        input_stats_b=stats,
    )


# BM25 ranked retrieval — the saturating cousin of
# text_keyword_search's integer TF-IDF. Okapi BM25 with k1=1.2,
# b=0.75 and the Robertson-Sparck-Jones idf ln((N-df+0.5)/(df+0.5)+1):
# term-frequency saturation plus document-length normalization, the
# scorer most retrieval stacks default to. Scale shape identical to
# the TF-IDF query (the one every-search-engine plan): token explode
# filtered to the query terms at the scan, one doc-keyed aggregate;
# df (3 rows) and the corpus stats (1 row) broadcast. Scores are
# DOUBLE, rounded to 6 places in BOTH engines and used as the sort
# key post-rounding so the top-10 selection is engine-invariant
# (doc_id breaks ties deterministically).
@query(
    "text_bm25_rank",
    oracle="""
WITH docs AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM docs
), words AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, dl, tok, count(*) AS tf FROM words
  WHERE tok IN ('vector', 'hash', 'merge') GROUP BY doc_id, dl, tok
), dfreq AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM words
  WHERE tok IN ('vector', 'hash', 'merge') GROUP BY tok
)
SELECT doc_id,
       round(sum(ln((n - df + 0.5) / (df + 0.5) + 1)
                 * tf * (1.2 + 1)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))),
             6) AS bm25,
       CAST(count(*) AS BIGINT) AS n_terms
FROM tf JOIN dfreq USING (tok) CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT 10
""",
)
def text_bm25_rank(spark, sf_dir):
    terms = ["vector", "hash", "merge"]
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size("w")).alias("avgdl")
    )
    words = docs.select(
        "doc_id", F.size("w").alias("dl"), F.explode("w").alias("tok")
    ).where(F.col("tok").isin(terms))
    tf = words.groupBy("doc_id", "dl", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = words.groupBy("tok").agg(
        F.count_distinct("doc_id").alias("df")
    )
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.expr(
                        "ln((n - df + 0.5) / (df + 0.5) + 1) "
                        "* tf * (1.2 + 1) "
                        "/ (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))"
                    )
                ),
                6,
            ).alias("bm25"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )
