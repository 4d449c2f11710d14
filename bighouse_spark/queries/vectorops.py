"""Similarity search over the ``embeddings`` fixture + multimodal
binary-column plumbing over ``documents``.

Brute-force cosine top-k is the exact baseline (oracle: DuckDB
``list_cosine_similarity``); the SRP-LSH variant is the scale path
(rows-only check; recall vs brute force asserted in tests/).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bighouse_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
)
from bighouse_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_ann_topk,
)
from bighouse_spark.queries.registry import query, t


# Exact cosine top-5 neighbors for query vectors vec_id < 5.
# Similarities rounded to 6 dp before ranking so rank order is
# reproducible across engines; ties break on neighbor_id.
@query(
    "ann_brute_force_topk",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(cv, qv), 6) AS sim
  FROM c, q WHERE neighbor_id != query_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS BIGINT)
           AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5
""",
)
def ann_brute_force_topk(spark, sf_dir):
    from bighouse_spark.sources.catalog import table_stats

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = brute_force_topk(
        emb, queries, k=5,
        corpus_stats=table_stats(spark, sf_dir, "embeddings"),
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "sim"
    )


# SRP-LSH bucketed ANN — touches ~1/2^bits of the corpus per query.
# Bucket assignment depends on generated hyperplanes → rows-only check.
@query("ann_lsh_topk")
def ann_lsh_topk(spark, sf_dir):
    from bighouse_spark.sources.catalog import table_stats

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = lsh_ann_topk(
        emb, queries, k=5, bits=4, dim=64,
        corpus_stats=table_stats(spark, sf_dir, "embeddings"),
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "sim"
    )


# IVF ANN — spherical-kmeans cells on a seeded sample; queries probe
# nprobe nearest cells. Centroids are data/seed-deterministic but not
# SQL-expressible → rows-only check; recall vs brute force asserted in
# tests/test_operators.py.
@query("ann_ivf_topk")
def ann_ivf_topk(spark, sf_dir):
    from bighouse_spark.sources.catalog import table_stats

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = ivf_topk(
        emb, queries, k=5, n_cells=16, nprobe=4,
        corpus_stats=table_stats(spark, sf_dir, "embeddings"),
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "sim"
    )


# The same IVF machinery with the probe knob at exhaustive
# (nprobe = n_cells): every stage of the scale path runs — centroid
# training, scan-side cell assignment, cell-key candidate join, JVM
# scoring — while the result is provably the exact top-k, so the
# driver hash-checks the whole pipeline against the brute-force
# oracle. Together with ann_ivf_topk (partial probe, recall-floor
# tests) this makes the IVF operator driver-verifiable.
@query(
    "ann_ivf_full_probe",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(cv, qv), 6) AS sim
  FROM c, q WHERE neighbor_id != query_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS BIGINT)
           AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5
""",
)
def ann_ivf_full_probe(spark, sf_dir):
    from bighouse_spark.sources.catalog import table_stats

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = ivf_topk(
        emb, queries, k=5, n_cells=16, nprobe=16,
        corpus_stats=table_stats(spark, sf_dir, "embeddings"),
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "sim"
    )


# Embedding-based near-duplicate detection: pairs with cosine ≥ 0.95
# (the embedding-cosine dedup flavor; exact, oracle-checked).
@query(
    "dedup_embedding_cosine",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.e, b.e), 6) AS sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.95
""",
)
def dedup_embedding_cosine(spark, sf_dir):
    from bighouse_spark.functions.vectors import cosine_similarity

    emb = t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.col("embedding")
    )
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
    )
    sim = cosine_similarity("ea", "eb")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where(sim >= 0.95)
        .select("id_a", "id_b", F.round(sim, 6).alias("sim"))
    )


# Multimodal plumbing: wrap documents as binary media, run the
# Arrow-batched mapInPandas feature extractor, aggregate. The byte
# counts and payload hashes are real; the codec is the documented stub.
@query(
    "multimodal_features",
    oracle="""
SELECT count(*) AS n_media,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       count(DISTINCT md5(text)) AS n_unique_payloads
FROM documents
""",
)
def multimodal_features(spark, sf_dir):
    media = documents_as_media(t(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.count_distinct("payload_hash").alias("n_unique_payloads"),
    )


# Video frame-sampling plumbing over fake media blobs (codec stubbed,
# Spark-side mapInPandas shape real). Frame counts/hashes derive
# deterministically from payload bytes -> DuckDB-checkable.
@query(
    "multimodal_frame_sample",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_frames,
       CAST(count(DISTINCT media_id) AS BIGINT) AS n_videos,
       CAST(max(frame_idx) AS BIGINT) AS max_frame_idx
FROM (
  SELECT doc_id AS media_id,
         unnest(range(0, CAST(greatest(octet_length(encode(text)) // 1024, 1)
                AS BIGINT), 10)) AS frame_idx
  FROM documents)
""",
)
def multimodal_frame_sample(spark, sf_dir):
    from bighouse_spark.operators.multimodal import frame_sample

    media = documents_as_media(t(spark, sf_dir, "documents"))
    frames = frame_sample(media, every_n=10)
    return frames.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.count_distinct("media_id").cast("bigint").alias("n_videos"),
        F.max("frame_idx").cast("bigint").alias("max_frame_idx"),
    )


# Image-resize plumbing over fake media blobs: payloads rewritten to
# the (stub-)resized form through the schema-preserving mapInPandas
# pass. The stub truncates to target_bytes, so byte counts and
# payload hashes are closed-form over the ASCII fixture text
# (chars == bytes) -> DuckDB-checkable.
@query(
    "multimodal_resize",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_media,
       CAST(sum(least(length(text), 4096)) AS BIGINT) AS resized_bytes,
       CAST(count(DISTINCT md5(left(text, 4096))) AS BIGINT)
         AS n_unique_resized,
       bool_and(resized_flag = '4096') AS all_annotated
FROM (SELECT text, '4096' AS resized_flag FROM documents)
""",
)
def multimodal_resize(spark, sf_dir):
    from bighouse_spark.operators.multimodal import resize_media

    media = documents_as_media(t(spark, sf_dir, "documents"))
    resized = resize_media(media, target_bytes=4096)
    return resized.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum(F.octet_length("payload")).cast("bigint").alias(
            "resized_bytes"
        ),
        F.count_distinct(F.md5("payload")).cast("bigint").alias(
            "n_unique_resized"
        ),
        F.bool_and(
            F.element_at(F.col("meta"), "resized_to") == "4096"
        ).alias("all_annotated"),
    )


# MinHash pairs -> connected components -> per-cluster sizes: the
# full near-dup grouping flow (LSH candidates, exact verify, graph
# clustering). The verified pair set equals the exact all-pairs
# Jaccard>=0.4 result at fixture scale (16-band recall 1.0), and the
# component id is defined as the min member id, so the whole flow is
# reproducible in SQL: the oracle rebuilds the exact pair graph and
# takes its transitive closure with a recursive CTE.
@query(
    "dedup_minhash_clusters",
    oracle="""
WITH RECURSIVE d AS (
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
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.4
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), labels AS (
  SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a
)
SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
FROM labels GROUP BY component
ORDER BY cluster_size DESC, component ASC
""",
)
def dedup_minhash_clusters(spark, sf_dir):
    from bighouse_spark.operators.components import connected_components
    from bighouse_spark.operators.dedup import minhash_lsh_pairs

    docs = t(spark, sf_dir, "documents").where(
        F.size(F.split("text", " ")) >= 3
    )
    from bighouse_spark.sources.catalog import table_stats

    pairs = minhash_lsh_pairs(
        docs, num_hashes=32, bands=16, shingle_n=3, jaccard_threshold=0.4,
        input_stats=table_stats(spark, sf_dir, "documents"),
    )
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cluster_size"))
        .orderBy(F.col("cluster_size").desc(), F.col("component").asc())
    )


# Topic-clustering assignment step: every embedding goes to its
# nearest of K=8 fixed centroids (the first 8 vectors — deterministic
# and SQL-expressible, unlike trained k-means centroids). The plan is
# the one a 100 TB assignment wants: centroids ride along as a literal
# array (driver collects exactly K rows, same bounded contract as IVF
# training), the argmax runs per-row inside codegen with ZERO
# pre-aggregation shuffle, and the only exchange is the final 8-key
# rollup. Ties break to the smaller centroid id in both engines.
@query(
    "cluster_assign_topics",
    oracle="""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 8
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), scored AS (
  SELECT v.vec_id, c.cid,
         round(list_cosine_similarity(v.e, c.cv), 6) AS sim
  FROM v, c
), best AS (
  SELECT vec_id, cid, sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, cid ASC) AS rn
  FROM scored
)
SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
       round(avg(sim), 6) AS avg_sim
FROM best WHERE rn = 1 GROUP BY cid
""",
)
def cluster_assign_topics(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    cents = (
        emb.where(F.col("vec_id") < 8)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("cv"))
        .collect()
    )
    # The centroid literals (8 x 64 doubles) as ONE SQL string: the
    # F.array/F.struct/F.lit DSL form costs ~520 py4j round trips per
    # build (~1 s measured warm, r15); the string parses to the same
    # literal tree in one. double_lit renders repr for finite values
    # (the shortest exact round-trip form; the D suffix keeps Spark
    # from reading a bare decimal as DECIMAL) and the cast spelling
    # for NaN/Infinity, which bare repr cannot parse.
    from bighouse_spark.functions.identifiers import double_lit

    cent_sql = "array(%s)" % ", ".join(
        "named_struct('cid', %dL, 'cv', array(%s))"
        % (int(r.vec_id), ", ".join(double_lit(x) for x in r.cv))
        for r in cents
    )
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cos = (
        "aggregate(zip_with(e, c.cv, (x, y) -> x * y), 0.0D, "
        "(acc, x) -> acc + x) / "
        "(sqrt(aggregate(e, 0.0D, (acc, x) -> acc + x * x)) * "
        "sqrt(aggregate(c.cv, 0.0D, (acc, x) -> acc + x * x)))"
    )
    scored = F.expr(
        f"transform({cent_sql}, c -> named_struct("
        f"'sim', round({cos}, 6), 'negid', -c.cid, 'cid', c.cid))"
    )
    # array_max on (sim, negid, cid) structs = lexicographic argmax:
    # highest sim, then smallest cid.
    best = base.select("vec_id", F.array_max(scored).alias("b"))
    return best.groupBy(F.col("b.cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
        F.round(F.avg("b.sim"), 6).alias("avg_sim"),
    )


# Symmetric int8 quantization of the embedding column — the storage/
# bandwidth path for vectors at 100 TB (4x smaller, SIMD-dot-able).
# Pure per-row column math (zero shuffle before the row-level
# projection); scale, quantized checksum, and max reconstruction
# error are all exactly reproducible in DuckDB because every step is
# element-local (no float summation-order ambiguity; q_sum is an
# integer sum).
@query(
    "embedding_quantize_int8",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id < 100
), s AS (
  SELECT vec_id, e,
         list_max(list_transform(e, x -> abs(x))) AS scale
  FROM v
), q AS (
  SELECT vec_id, e, scale,
         list_transform(e, x -> CAST(round(x * 127.0 / scale) AS INT))
           AS qv
  FROM s WHERE scale > 0
)
SELECT vec_id,
       round(scale, 6) AS scale_r,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       round(list_max(list_transform(range(1, len(e) + 1),
         i -> abs(e[i] - qv[i] * scale / 127.0))), 6) AS max_err
FROM q
""",
)
def embedding_quantize_int8(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    e = F.col("embedding").cast("array<double>")
    scale = F.array_max(F.transform(e, lambda x: F.abs(x)))
    base = emb.select("vec_id", e.alias("e"), scale.alias("scale")).where(
        F.col("scale") > 0
    )
    q = F.transform(
        F.col("e"),
        lambda x: F.round(x * 127.0 / F.col("scale")).cast("int"),
    )
    qd = base.select("vec_id", "e", "scale", q.alias("qv"))
    recon_err = F.array_max(
        F.zip_with(
            F.col("e"),
            F.col("qv"),
            lambda x, qi: F.abs(x - qi * F.col("scale") / 127.0),
        )
    )
    return qd.select(
        "vec_id",
        F.round("scale", 6).alias("scale_r"),
        F.aggregate(
            "qv", F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("q_sum"),
        F.round(recon_err, 6).alias("max_err"),
    )


# Hybrid retrieval: keyword-filter the documents, then exact cosine
# top-k over only the surviving embeddings — the filter-then-rank
# flow of a retrieval pipeline. doc_id and vec_id are aligned in the
# fixtures. Fully deterministic -> DuckDB oracle.
@query(
    "hybrid_keyword_ann",
    oracle="""
WITH hits AS (
  SELECT doc_id FROM documents WHERE text LIKE '%data%'
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 3
), c AS (
  SELECT e.vec_id AS neighbor_id, CAST(e.embedding AS DOUBLE[]) AS cv
  FROM embeddings e JOIN hits h ON e.vec_id = h.doc_id
), scored AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(cv, qv), 6) AS sim
  FROM c, q WHERE neighbor_id != query_id
)
SELECT query_id, neighbor_id, sim,
       CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, neighbor_id ASC) AS rn
  FROM scored) x
WHERE rn <= 5
""",
)
def hybrid_keyword_ann(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    hits = docs.where(F.col("text").like("%data%")).select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = emb.join(hits, "vec_id")
    queries = emb.where(F.col("vec_id") < 3)
    out = brute_force_topk(corpus, queries, k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        "sim",
        F.col("rank").cast("bigint").alias("rank"),
    )


# Achlioptas sparse random projection (64 -> 8 dims): matrix entries
# in {-1, 0, +1} with prob {1/6, 2/3, 1/6}, derived from md5 of the
# (out_dim, in_dim) pair — generated ONCE here and embedded as
# literals in BOTH the Spark expression and the DuckDB oracle, so the
# projection is identical by construction. Input vectors are int8-
# quantized first (the proven-deterministic embedding_quantize_int8
# formula), making every dot product pure integer arithmetic — no
# float summation-order ambiguity anywhere. Scale shape: zero-shuffle
# row-local math; at 100 TB this is the cheap-projection front of an
# ANN/cluster pipeline (4x bandwidth cut from int8, 8x from dims).
def _achlioptas_matrix(out_dims: int = 8, in_dims: int = 64):
    import hashlib

    def entry(j: int, i: int) -> int:
        h = int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:15], 16) % 6
        return 1 if h == 0 else (-1 if h == 1 else 0)

    return [[entry(j, i) for i in range(in_dims)] for j in range(out_dims)]


_RP_M = _achlioptas_matrix()
_RP_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id < 200
), s AS (
  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS scale
  FROM v
), q AS (
  SELECT vec_id,
         list_transform(e, x -> CAST(round(x * 127.0 / scale) AS BIGINT))
           AS qv
  FROM s WHERE scale > 0
)
SELECT vec_id,
{",".join(
    f"       CAST(list_sum(list_transform(range(1, 65), "
    f"i -> qv[i] * ({_RP_M[j]})[i])) AS BIGINT) AS p{j}"
    for j in range(8)
)}
FROM q ORDER BY vec_id
"""


@query("embedding_random_projection", oracle=_RP_ORACLE)
def embedding_random_projection(spark, sf_dir):
    # Every expression as ONE selectExpr string: the DSL form (8
    # aggregates over zip_with against 64-literal arrays) cost ~1.7 s
    # of py4j round trips per build (measured warm, r15); the strings
    # parse to the identical trees in a handful of round trips.
    emb = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    base = (
        emb.selectExpr(
            "vec_id",
            "CAST(embedding AS ARRAY<DOUBLE>) AS e",
            "array_max(transform(CAST(embedding AS ARRAY<DOUBLE>), "
            "x -> abs(x))) AS scale",
        )
        .where(F.col("scale") > 0)
        .selectExpr(
            "vec_id",
            "transform(e, x -> CAST(round(x * 127.0D / scale) AS BIGINT))"
            " AS qv",
        )
    )
    projs = [
        "aggregate(zip_with(qv, array(%s), (a, b) -> a * b), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x) AS p%d"
        % (", ".join(f"CAST({x} AS BIGINT)" for x in _RP_M[j]), j)
        for j in range(8)
    ]
    return base.selectExpr("vec_id", *projs).orderBy("vec_id")


# Executor-side closures live here: ship this module's code by value
# so workers need not import the package (see functions/_shipping.py).
import sys as _sys

from bighouse_spark.functions._shipping import ship_by_value as _ship

_ship(_sys.modules[__name__])
