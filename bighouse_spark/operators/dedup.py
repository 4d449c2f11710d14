"""Deduplication operators for document-scale training pipelines.

Extension surface beyond the reference (which ships no dedup of its
own — delegation to ClickHouse SQL only). Everything is expressed as
DataFrame compositions so Catalyst owns the physical plan; the shapes
are chosen for 100 TB:

* **exact**: groupBy on a content hash — one shuffle on a
  high-cardinality, well-distributed key. No skew by construction
  (md5 keys are uniform).
* **MinHash + LSH**: per-doc signature computed scan-side (one
  projection, no shuffle), banded into (band, band-hash) bucket keys,
  exploded, and self-joined on bucket. The candidate join is the only
  shuffle, and it shuffles *bucket keys*, not documents² — the whole
  point of LSH. Verification (exact Jaccard) runs only on candidate
  pairs.
* **SimHash**: 64-bit signature scan-side; candidates = identical
  16-bit bands (4-band split ⇒ finds all pairs within Hamming
  distance 3); verify by Hamming distance.
* **n-gram Jaccard**: exact pairwise similarity restricted to
  candidate buckets (cheap prefix key) — the brute-force oracle-
  checkable variant.

All hash functions derive from ``xxhash64(shingle, seed)`` with fixed
integer seeds → fully deterministic across runs/partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bighouse_spark.functions.identifiers import quote_ident
from bighouse_spark.functions.text import fingerprint, with_shingles
from bighouse_spark.operators.caching import tracked_persist
from bighouse_spark.operators.parallel import ensure_min_parallelism


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per exact text value.

    Single shuffle on md5(text); at 100 TB prefer this over
    ``dropDuplicates([text_col])`` because the shuffle key is a fixed
    32-byte hash, not the full document payload.
    """
    key = F.md5(F.col(text_col))
    w = Window.partitionBy(key).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def fingerprint_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup after whitespace/case normalization (md5 rolling
    fingerprint from ``functions.text.fingerprint``)."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _minhash_signature(shingle_hashes: Column, num_hashes: int) -> Column:
    """MinHash signature over PRE-HASHED shingles: for seed i, min over
    h of xxhash64(h, i) where h = xxhash64(shingle) was materialized
    once upstream. Hashing the variable-length shingle string is the
    expensive step; doing it once and seed-mixing the resulting longs
    cuts signature CPU ~num_hashes×. Built as ``F.array`` of
    independent min-hash expressions — NOT ``transform(sequence(...))``
    — so that downstream ``element_at(sig, k)`` references
    constant-fold to the single k-th expression (Catalyst's
    SimplifyExtractValueOps); with an opaque transform every band-key
    reference would recompute all ``num_hashes`` mins (measured 7×
    slower end-to-end). Pure column expressions → computed in the scan
    stage, no Python.

    NOTE the seed must be captured via a closure FACTORY, not a
    defaulted second lambda parameter: a two-parameter lambda is
    PySpark's (element, index) transform signature, so ``lambda h,
    i=i`` silently binds i to the ARRAY INDEX — every signature
    position then computes the identical min and the whole signature
    collapses to one Bernoulli trial (round-1 bug, caught when a
    J=0.9 pair missed all 16 bands)."""

    def seeded_mix(seed: int):
        return lambda h: F.xxhash64(h, F.lit(seed))

    return F.array(
        *[
            F.array_min(F.transform(shingle_hashes, seeded_mix(i)))
            for i in range(num_hashes)
        ]
    )


def _minhash_signature_sql(hashes_col: str, num_hashes: int) -> str:
    """Value-identical twin of ``_minhash_signature`` (position i =
    min over h of xxhash64(h, i); checksum-verified equal on the
    fixtures) as ONE SQL string: a single-pass ``aggregate`` folding
    each shingle hash into a running element-wise ``least`` via
    ``zip_with``. Why this shape: (a) one ``F.expr`` parse instead of
    ~2 s of py4j round-trips building the 32-wide Python DSL tree
    (measured at sf0.1); (b) one traversal of the hash array instead
    of ``num_hashes``; (c) O(1) generated-code size. The lambda var
    ``i`` from ``sequence`` is an IntegerType value, so
    ``xxhash64(h, i)`` hashes the same (long, int) pair as
    ``F.xxhash64(h, F.lit(seed))`` did. The aggregate is opaque to
    Catalyst (no per-element constant folding), so consumers MUST
    read a materialized ``sig`` column — see the persist below."""
    return (
        f"aggregate({hashes_col}, "
        f"array_repeat(9223372036854775807L, {num_hashes}), "
        f"(acc, h) -> zip_with(acc, "
        f"transform(sequence(0, {num_hashes - 1}), i -> xxhash64(h, i)), "
        f"(a, m) -> least(a, m)))"
    )


def _lsh_prep(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    input_stats: tuple[int, int] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared MinHash/LSH front half: (docs(id, shingles, sig),
    band_keys(id, band, bucket)).

    ONE persisted table carries both the shingle sets (read by the
    verify join) and the minhash signature (read by the band-key
    projection) — r14 fused what used to be two sequential cache
    materializations (docs, then sigs built by re-reading docs) into
    a single pass, removing one cache-fill job and the interim
    ``__sh_hashes`` column from storage. At cluster scale this is the
    standard signature-table materialization (MEMORY_AND_DISK spills
    instead of OOMing on wide corpora). Shingling is the CPU-heavy
    step → guard input parallelism before it (no-op on a well-split
    big input; ~N× on a single-file local table). The persist stays
    mandatory: the one-pass signature aggregate is opaque to
    Catalyst, so an unmaterialized ``sig`` would be recomputed in
    full by every band reference."""
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"
    docs = (
        ensure_min_parallelism(
            df.selectExpr(
                f"{quote_ident(id_col)} AS id",
                f"{quote_ident(text_col)} AS `__t`",
            ),
            # Shingling + per-shingle seed mixes cost ~100x more per
            # byte than a columnar scan: size parallelism accordingly.
            # Basis is COMPRESSED parquet bytes (catalog table_stats);
            # 16 KiB compressed ~ 50-60 KiB of text ~ 50-100 ms of
            # shingling per task (A/B at sf0.1: 16 KiB beat both the
            # 8 KiB over-fan and the 48 KiB under-fan).
            bytes_per_partition=16 << 10,
            key_cols=["id"],
            input_stats=input_stats,
        )
        .transform(lambda d: with_shingles(d, text_col="__t", n=shingle_n))
        # The interim shingle-hash array is inlined into the signature
        # aggregate (Catalyst's CollapseProject did the same to the
        # old withColumn form) and the whole projection is ONE parsed
        # expression — construction is a single py4j round trip.
        .selectExpr(
            "id",
            "shingles",
            _minhash_signature_sql(
                "transform(shingles, s -> xxhash64(s))", num_hashes
            )
            + " AS sig",
        )
    )
    # The empty-shingle guard is applied ABOVE the persist: placed
    # before it, Catalyst pushed `size(shingles) > 0` through the
    # repartition down to the scan, where it re-evaluated the whole
    # NGram shingling UDF on the (locally single-task) scan side —
    # every document was shingled twice, once serialized (found in the
    # r14/r15 plan dumps: Filter(4) carried the UDF below Exchange(6)).
    # Filtering the persisted table reads the materialized column
    # instead; the row set (and every consumer's result) is unchanged.
    docs = tracked_persist(docs).where("size(shingles) > 0")
    # Band bucket = xxhash64 over the signature SLICE itself (longs),
    # not over a concat_ws string of the elements: the string shape
    # cost 2 long→string conversions + a string hash per band per doc
    # (measured ~260 ms/task on the sf0.1 band stage); hashing the
    # long-array slice is pure primitive work. Bucket VALUES are
    # engine-internal partition keys; equal slices map to equal
    # buckets, so the candidate set (and the verified output) is
    # unchanged. The band array is a LITERAL array of per-band
    # expressions, not transform(sequence(...)): higher-order
    # functions are interpreted per element (no codegen) and burned
    # ~4 s of CPU on the sf0.1 band stage (r15 profile); the literal
    # form is O(bands) expression size and fully codegen'd, with
    # identical values.
    slices = ", ".join(
        f"xxhash64(slice(sig, {b * rows_per_band + 1}, {rows_per_band}))"
        for b in range(bands)
    )
    band_keys = docs.selectExpr(
        "id", f"posexplode(array({slices})) AS (band, bucket)"
    )
    return docs, band_keys


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 256,
    input_stats: tuple[int, int] | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash signatures + LSH banding.

    Returns (id_a, id_b, jaccard) with id_a < id_b and exact verified
    Jaccard ≥ threshold. With 32 hashes / 8 bands the LSH s-curve
    crosses ~50% recall at J≈0.7; tune (num_hashes, bands) per corpus.

    Scale shape: signatures and band keys are computed map-side; the
    only shuffles are (1) explode+self-join on band buckets and (2)
    the verify join to fetch shingle sets for candidates. Bucket skew
    (a boilerplate signature band shared by millions of docs) is the
    known failure mode: an uncapped bucket of n members emits
    n·(n−1)/2 candidate pairs — quadratic blowup concentrated in ONE
    join partition. ``max_bucket_size`` caps membership per
    (band, bucket) at N before the self-join (deterministic: the N
    lowest ids win), bounding any bucket's contribution to N·(N−1)/2
    pairs. Buckets at or under the cap — every bucket in a
    non-degenerate corpus — are untouched, so normal-corpus results
    are identical; docs dropped from a hot bucket can still pair in
    their other ``bands − 1`` buckets. ``None`` disables the cap.
    """
    docs, band_keys = _lsh_prep(
        df, text_col, id_col, num_hashes, bands, shingle_n, input_stats
    )
    if max_bucket_size is not None:
        # Hot-bucket cap: rank members within each (band, bucket) and
        # keep the first N. The window shuffles on the bucket keys,
        # and — because the window's output partitioning already
        # satisfies the groupBy below — the capped members regroup
        # WITHOUT a second exchange into ≤N-element bucket lists from
        # which candidate pairs expand in place. This replaces the
        # uncapped path's band-key self-join (two more exchanges) and
        # its persist (band_keys is consumed once now): measured at
        # parity warm at sf0.1 (min-of-5 1.52 s vs 1.53 s, noise-
        # dominated on this host) with two fewer exchanges and no
        # cache materialization — the structural win shows at
        # cluster scale, not at 60 k docs. Per-bucket state is
        # bounded by the cap (≤N ids), so the collect_list cannot
        # blow up on a degenerate bucket. NOTE a
        # data-dependent variant (pre-count buckets, window only when
        # one exceeds the cap) was measured SLOWER at sf0.1 (5.1 s vs
        # 1.9 s warm): the existence check is an extra eager job that
        # costs more than the per-bucket sort it tries to skip.
        capped = band_keys.selectExpr(
            "id",
            "band",
            "bucket",
            "row_number() OVER (PARTITION BY band, bucket ORDER BY id)"
            " AS __rn",
        ).where(f"__rn <= {int(max_bucket_size)}")
        cand = (
            capped.groupBy("band", "bucket")
            .agg(F.expr("sort_array(collect_list(id))").alias("ids"))
            .where("size(ids) >= 2")
            .selectExpr(
                "explode(flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), "
                "y -> struct(x AS id_a, y AS id_b))))) AS p"
            )
            .selectExpr("p.id_a", "p.id_b")
            .distinct()
        )
    else:
        cand = (
            band_keys.alias("a")
            .join(
                band_keys.alias("b"),
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.bucket") == F.col("b.bucket"),
                    F.col("a.id") < F.col("b.id"),
                ],
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )

    # Both verify joins read the SAME projection of the persisted docs
    # table (rename/alias applied ABOVE the join, not below): the two
    # docs-side subtrees are then canonically identical, so whenever
    # both joins exchange the docs side (the sort-merge shape a large
    # corpus takes — at sf0.1 the first join broadcasts the tiny
    # candidate set instead, so only one docs broadcast exists either
    # way) Spark's ReuseExchange materializes that exchange once.
    # r14's shape renamed columns BELOW the join (sh_a/sh_b, id2),
    # making the two subtrees canonically distinct — never reusable —
    # and projecting the cache through two different alias maps.
    d1 = docs.select("id", "shingles").alias("__bh_va")
    d2 = docs.select("id", "shingles").alias("__bh_vb")
    verified = (
        cand.join(d1, cand.id_a == F.col("__bh_va.id"))
        .join(d2, cand.id_b == F.col("__bh_vb.id"))
        .selectExpr(
            "id_a",
            "id_b",
            "size(array_intersect(__bh_va.shingles, __bh_vb.shingles)) / "
            "size(array_union(__bh_va.shingles, __bh_vb.shingles))"
            " AS jaccard",
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .selectExpr("id_a", "id_b", "round(jaccard, 6) AS jaccard")
    )
    return verified


def minhash_lsh_pairs_between(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 256,
    input_stats_a: tuple[int, int] | None = None,
    input_stats_b: tuple[int, int] | None = None,
) -> DataFrame:
    """CROSS-corpus near-duplicate pairs — the bipartite LSH used for
    contamination detection: which documents of corpus A (training
    data) near-duplicate documents of corpus B (a benchmark set).

    Returns (id_a, id_b, jaccard) with id_a from ``df_a``, id_b from
    ``df_b``, exact verified Jaccard ≥ threshold. Unlike the
    within-corpus self-join, candidates come from an EQUI-JOIN of the
    two sides' band buckets — A-side band keys never pair with each
    other, so cost is |A∩bucket|·|B∩bucket| per bucket, not
    quadratic in either corpus. ``max_bucket_size`` caps each SIDE's
    membership per (band, bucket) at N (keep-first by id), bounding
    any bucket at N² pairs — the same boilerplate-bucket defence as
    the within-corpus cap. At 100 TB × small benchmark the B side is
    tiny; Catalyst broadcast-joins it under the threshold and the A
    side never shuffles on the bucket keys at all."""
    docs_a, bk_a = _lsh_prep(
        df_a, text_col, id_col, num_hashes, bands, shingle_n, input_stats_a
    )
    docs_b, bk_b = _lsh_prep(
        df_b, text_col, id_col, num_hashes, bands, shingle_n, input_stats_b
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window as _W

        w = _W.partitionBy("band", "bucket").orderBy("id")
        bk_a, bk_b = (
            bk.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_bucket_size)
            .drop("__rn")
            for bk in (bk_a, bk_b)
        )
    cand = (
        bk_a.alias("a")
        .join(
            bk_b.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(
            docs_a.select(
                F.col("id").alias("__ida"),
                F.col("shingles").alias("sh_a"),
            ),
            cand.id_a == F.col("__ida"),
        )
        .join(
            docs_b.select(
                F.col("id").alias("__idb"),
                F.col("shingles").alias("sh_b"),
            ),
            cand.id_b == F.col("__idb"),
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def simhash(
    shingles: Column | str, bits: int = 64, hash_fn: str = "xxhash64"
) -> Column:
    """SimHash from shingle hashes: bit b of the signature is 1 iff
    the count of shingles whose hash has bit b set exceeds half the
    shingle count. Implemented as ONE ``aggregate`` pass over the
    hash array folding into a per-bit popcount vector (the same
    single-traversal shape as ``_minhash_signature_sql``), then one
    ``zip_with`` against a constant bit-value array to assemble the
    signature — all JVM-side, O(1) generated-code size, emitted as a
    single parsed SQL string (the HOF DSL cost ~100 py4j round trips
    per lambda; r15). The long-ago previous shape built ``bits``
    separate filtered arrays (O(bits × shingles) materializations).

    ``hash_fn``:
      * ``"xxhash64"`` (default) — fastest, engine-specific.
      * ``"md5_60"`` — 60-bit hash from the first 15 hex chars of
        md5(shingle); bit-identical in DuckDB via
        ``('0x'||substr(md5(s),1,15))::BIGINT``, which makes the
        whole simhash pipeline oracle-checkable (pass bits=60).
    """
    if isinstance(shingles, str):
        sh = quote_ident(shingles)
    else:
        # Spark 4's JVM Column exposes no nullary name()/expr(); the
        # classic session's expression bridge is the one way back to
        # parseable SQL text for an arbitrary Column, keeping the
        # public Column flavor of this API working (internal callers
        # all use the string fast path).
        from pyspark.sql import SparkSession

        session = SparkSession.getActiveSession()
        if session is None:
            raise TypeError(
                "simhash(Column) needs an active SparkSession to "
                "render the column as SQL; pass the column name as a "
                "string instead"
            )
        sh = (
            "(" + session._jsparkSession.expression(shingles._jc).sql() + ")"
        )
    if hash_fn == "md5_60":
        hashes = (
            f"transform({sh}, s -> "
            f"CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT))"
        )
    else:
        hashes = f"transform({sh}, s -> xxhash64(s))"
    # Signed-long bit values: bit 63 is the sign bit, so its "value"
    # is long-min; summing distinct bit values can never overflow
    # (every partial sum stays a valid 64-bit pattern). shiftleft on
    # 1L yields the same constants (including long-min at b=63)
    # without a -9223372036854775808 literal, which SQL cannot parse
    # as a long.
    bit_values = "array(" + ", ".join(
        f"{1 << b}L" if b < 63 else "shiftleft(CAST(1 AS BIGINT), 63)"
        for b in range(bits)
    ) + ")"
    counts = (
        f"aggregate({hashes}, "
        f"array_repeat(CAST(0 AS BIGINT), {bits}), "
        f"(acc, h) -> zip_with(acc, "
        f"transform(sequence(0, {bits - 1}), "
        f"i -> CAST(getbit(h, i) AS BIGINT)), (a, b) -> a + b))"
    )
    return F.expr(
        f"aggregate(zip_with({counts}, {bit_values}, "
        f"(c, v) -> CASE WHEN c * 2 > size({sh}) THEN v "
        f"ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (s, v) -> s + v)"
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
    input_stats: tuple[int, int] | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash banding.

    Splitting the signature into 4 bands (16 bits for xxhash64's 64,
    15 for md5_60's 60) guarantees any pair within Hamming distance 3
    shares at least one exact band (pigeonhole), so candidates =
    equality join per band — the same bucket-shuffle shape as MinHash
    LSH — and recall at max_hamming<=3 is exactly 1.0, not
    probabilistic. Verify with popcount of XOR.
    """
    bits = 60 if hash_fn == "md5_60" else 64
    band_width = bits // 4
    band_mask = (1 << band_width) - 1
    docs = (
        ensure_min_parallelism(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
            # Shingling + per-shingle seed mixes cost ~100x more per
            # byte than a columnar scan: size parallelism accordingly.
            # Basis is COMPRESSED parquet bytes (catalog table_stats);
            # 16 KiB compressed ~ 50-60 KiB of text ~ 50-100 ms of
            # shingling per task (A/B at sf0.1: 16 KiB beat both the
            # 8 KiB over-fan and the 48 KiB under-fan).
            bytes_per_partition=16 << 10,
            key_cols=["id"],
            input_stats=input_stats,
        )
        .transform(lambda d: with_shingles(d, text_col="__t", n=shingle_n))
        .select("id", "shingles")
    )
    # Persist signatures: referenced by both sides of the band
    # self-join, and the per-bit-count expression is wide. The
    # empty-shingle guard rides along as a materialized count and is
    # applied ABOVE the persist — placed below, Catalyst pushed it to
    # the scan where it re-evaluated the shingling UDF serialized
    # before the exchange (same plan defect as _lsh_prep, r15).
    sigs = tracked_persist(
        docs.select(
            "id",
            simhash("shingles", bits, hash_fn).alias("sig"),
            F.size("shingles").alias("__nsh"),
        )
    ).where("__nsh > 0").select("id", "sig")

    bands = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("sig", b * band_width)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.key")

    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.key") == F.col("b.key"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.6,
    max_df_fraction: float = 0.5,
    input_stats: tuple[int, int] | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle
    index (no LSH approximation — this is the oracle-checkable exact
    variant).

    Shape: explode doc→shingle, self-join on shingle to count
    intersections, join back doc shingle counts, filter on
    |A∩B| / (|A|+|B|−|A∩B|) ≥ t. The shuffle key is the shingle, so a
    boilerplate shingle present in most docs makes the self-join
    quadratic; ``max_df_fraction`` caps that: shingles whose document
    frequency exceeds the fraction are dropped BEFORE the self-join
    (stopword-style removal), and per-doc sizes are recomputed over
    the surviving shingles so the Jaccard stays a true set Jaccard
    over the filtered shingle universe. At most
    ~avg_shingles_per_doc / max_df_fraction shingles can exceed the
    cap, so the hot set is tiny and broadcast into a left-anti join.
    """
    docs = (
        ensure_min_parallelism(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
            # Shingling + per-shingle seed mixes cost ~100x more per
            # byte than a columnar scan: size parallelism accordingly.
            # Basis is COMPRESSED parquet bytes (catalog table_stats);
            # 16 KiB compressed ~ 50-60 KiB of text ~ 50-100 ms of
            # shingling per task (A/B at sf0.1: 16 KiB beat both the
            # 8 KiB over-fan and the 48 KiB under-fan).
            bytes_per_partition=16 << 10,
            key_cols=["id"],
            input_stats=input_stats,
        )
        .transform(lambda d: with_shingles(d, text_col="__t", n=shingle_n))
        .select("id", "shingles")
    )
    # Empty-shingle guard above the persist, same reasoning as
    # _lsh_prep: placed below, it was pushed to the scan and
    # re-evaluated the shingling UDF serialized before the exchange.
    docs = tracked_persist(docs).where(
        "size(shingles) > 0"
    )  # feeds n_docs + the inverted index
    inv_all = docs.select("id", F.explode("shingles").alias("sh"))

    # Document frequency per shingle (shingles are array_distinct per
    # doc, so count(*) == countDistinct(id)). The scalar doc count
    # rides along via a broadcast cross join — no driver action, the
    # whole cap stays one lazy plan.
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    hot = (
        inv_all.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("__df") > F.col("__n_docs") * max_df_fraction)
        .select("sh")
    )
    inv = tracked_persist(inv_all.join(F.broadcast(hot), "sh", "left_anti"))
    sizes = inv.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))

    inter = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            on=[F.col("a.sh") == F.col("b.sh"), F.col("a.id") < F.col("b.id")],
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
