"""Semantic tests for operators whose driver check is rows-only
(engine-specific hashes / approximations): LSH recall vs exact
Jaccard, SimHash, ANN recall vs brute force, approx-agg error bounds,
as-of join edge cases, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bighouse_spark.operators.asof import asof_join
from bighouse_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from bighouse_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    frame_sample,
)
from bighouse_spark.operators.similarity import brute_force_topk, lsh_ann_topk
from bighouse_spark.sources.catalog import load_table
from tests.conftest import SF_CORRECT


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)]
    )


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _sentence(seed: int, n: int = 30) -> str:
    # Deterministic pseudo-text without random module state leakage.
    return " ".join(WORDS[(seed * 7 + i * 3) % len(WORDS)] for i in range(n))


class TestExactDedup:
    def test_keeps_min_id_per_duplicate_group(self, spark):
        df = _docs(spark, ["same text", "same text", "other", "same text"])
        out = exact_dedup(df).orderBy("doc_id").collect()
        assert [r.doc_id for r in out] == [0, 2]

    def test_no_dupes_passthrough(self, spark):
        df = _docs(spark, ["a b", "c d", "e f"])
        assert exact_dedup(df).count() == 3


class TestMinHashLSH:
    def test_finds_planted_near_duplicates(self, spark):
        # Far docs need genuinely disjoint vocabularies: _sentence()
        # walks one shared cyclic vocabulary, so two long sentences
        # from different seeds share most 3-shingles — the pre-fix
        # minhash (index-collapsed signature, see _minhash_signature
        # docstring) masked that by missing real near-dup pairs.
        base = _sentence(1, 40)
        near = base.rsplit(" ", 2)[0] + " zeta kappa"  # ~95% same shingles
        far1 = " ".join(f"w{(i * 7) % 23}" for i in range(40))
        far2 = " ".join(f"v{(i * 5) % 19}" for i in range(40))
        df = _docs(spark, [base, near, far1, far2])
        pairs = minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()
        assert {(p.id_a, p.id_b) for p in pairs} == {(0, 1)}
        assert pairs[0].jaccard > 0.8

    def test_signature_positions_independent(self, spark):
        # Regression for the round-1 index-collapse bug: two docs with
        # J=0.9 must agree on roughly J*num_hashes positions — the
        # broken signature agreed on exactly 0 or 32 (one Bernoulli
        # trial), never in between.
        from bighouse_spark.functions.text import word_shingles
        from bighouse_spark.operators.dedup import _minhash_signature

        base = " ".join(f"t{i}" for i in range(12))
        near = base + " extra"  # 10 shared shingles of 11 (J=10/11)
        sigs = {
            r.doc_id: r.sig
            for r in _docs(spark, [base, near])
            .select(
                "doc_id",
                F.transform(
                    word_shingles(F.col("text"), 3), lambda s: F.xxhash64(s)
                ).alias("h"),
            )
            .select(
                "doc_id", _minhash_signature(F.col("h"), 32).alias("sig")
            )
            .collect()
        }
        agree = sum(a == b for a, b in zip(sigs[0], sigs[1]))
        assert 20 <= agree <= 31, f"agreement {agree}/32 not ~J*32"

    def test_recall_vs_exact_jaccard(self, spark):
        docs = load_table(spark, SF_CORRECT, "documents").where(
            F.size(F.split("text", " ")) >= 3
        )
        exact = {
            (r.id_a, r.id_b)
            for r in ngram_jaccard_pairs(docs, threshold=0.7).collect()
        }
        lsh = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(
                docs, jaccard_threshold=0.5
            ).collect()
        }
        if exact:
            recall = len(exact & lsh) / len(exact)
            # 32 hashes / 8 bands: s-curve is ~0.97 at J=0.7.
            assert recall >= 0.8, f"LSH recall {recall} too low"

    def test_hot_bucket_cap_bounds_candidates(self, spark):
        # Adversarial skew: every doc identical → every band hashes
        # every doc into ONE bucket. Uncapped that's C(200,2) = 19900
        # candidate pairs from a single join partition; the cap keeps
        # the 8 lowest ids per bucket → exactly C(8,2) = 28 pairs.
        rows = [(i, "the same boilerplate text repeated everywhere")
                for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = minhash_lsh_pairs(
            df, jaccard_threshold=0.5, max_bucket_size=8
        ).collect()
        assert len(pairs) == 28
        # Deterministic keep-set: the lowest ids win.
        ids = {p.id_a for p in pairs} | {p.id_b for p in pairs}
        assert ids == set(range(8))

    def test_cap_is_identity_on_normal_corpus(self, spark):
        docs = load_table(spark, SF_CORRECT, "documents").where(
            F.size(F.split("text", " ")) >= 3
        )
        capped = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(
                docs, jaccard_threshold=0.5, max_bucket_size=256
            ).collect()
        }
        uncapped = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(
                docs, jaccard_threshold=0.5, max_bucket_size=None
            ).collect()
        }
        assert capped == uncapped

    def test_cap_fused_single_bucket_shuffle(self, spark):
        # Plan guard for the fused cap (round 6): the row_number
        # window shuffles on (band, bucket) ONCE, the pair-expansion
        # groupBy reuses that partitioning (no second bucket
        # exchange), and the capped path has no band-key self-join —
        # candidate pairs expand in place from the ≤N-element bucket
        # lists.
        import re as _re

        from bighouse_spark.operators.caching import release_tracked

        df = _docs(spark, [_sentence(s, 20) for s in range(6)])
        try:
            plan = (
                minhash_lsh_pairs(df, max_bucket_size=8)
                ._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            release_tracked()
        # One Window operator (WindowGroupLimit Partial/Final around
        # it is Spark's rank-limit pushdown — the cap even prunes
        # map-side before the exchange).
        assert plan.count("Window [") == 1
        assert (
            len(_re.findall(r"Exchange hashpartitioning\(band", plan)) == 1
        )

    def test_precision_no_false_positives_above_threshold(self, spark):
        docs = load_table(spark, SF_CORRECT, "documents").where(
            F.size(F.split("text", " ")) >= 3
        )
        # Verified Jaccard in the output must itself be >= threshold —
        # LSH candidates below it are filtered by the verify step.
        bad = (
            minhash_lsh_pairs(docs, jaccard_threshold=0.5)
            .where(F.col("jaccard") < 0.5)
            .count()
        )
        assert bad == 0


class TestNgramJaccardDFCap:
    # Every doc ends with the same long boilerplate trailer (think
    # license footer). Its shingles hit document frequency 1.0.
    BOILER = "this content is provided as is without any warranty of any kind"

    BODY = "alpha beta gamma delta one two three four five six"

    def _corpus(self, spark):
        return _docs(
            spark,
            [
                f"{self.BODY} {self.BOILER}",
                f"{self.BODY} epsilon {self.BOILER}",
                f"quick brown fox jumps {self.BOILER}",
                f"lorem ipsum dolor sit {self.BOILER}",
            ],
        )

    def test_hot_shingles_dropped_before_self_join(self, spark):
        # With the 0.5 DF cap, boilerplate shingles are removed, so
        # docs 2 and 3 (which share ONLY boilerplate) never pair,
        # while 0/1 (shared body) still do.
        pairs = {
            (r.id_a, r.id_b)
            for r in ngram_jaccard_pairs(
                self._corpus(spark), threshold=0.5
            ).collect()
        }
        assert (2, 3) not in pairs
        assert (0, 1) in pairs

    def test_cap_disabled_pairs_on_boilerplate(self, spark):
        # Control: fraction > 1.0 disables the cap, and the shared
        # trailer alone pushes every pair over the threshold — the
        # exact failure mode the cap exists to stop.
        pairs = {
            (r.id_a, r.id_b)
            for r in ngram_jaccard_pairs(
                self._corpus(spark), threshold=0.5, max_df_fraction=2.0
            ).collect()
        }
        assert (2, 3) in pairs


class TestCuration:
    def test_decontaminate_drops_leaked_docs(self, spark):
        ev = _docs(spark, ["secret benchmark question one"])
        corpus = spark.createDataFrame(
            [
                Row(doc_id=10, text="totally clean training text here"),
                Row(doc_id=11, text="contains secret benchmark question inside"),
            ]
        )
        from bighouse_spark.operators.curation import decontaminate

        out = [r.doc_id for r in decontaminate(corpus, ev).collect()]
        assert out == [10]

    def test_pack_sequences_budget_and_conservation(self, spark):
        from bighouse_spark.operators.curation import pack_sequences

        docs = _docs(spark, [" ".join(["w"] * (5 + i % 7)) for i in range(40)])
        packed = pack_sequences(docs, token_budget=20, n_shards=4)
        rows = packed.collect()
        # Every doc appears exactly once (packing conserves the corpus).
        assert sorted(r.doc_id for r in rows) == list(range(40))
        # A bin only exceeds the budget by its final straddling doc:
        # the running total before each doc stays under budget.
        import collections

        bins = collections.defaultdict(list)
        for r in sorted(rows, key=lambda r: (r.shard, r.bin, r.doc_id)):
            bins[(r.shard, r.bin)].append(r.n_tokens)
        for toks in bins.values():
            assert sum(toks[:-1]) < 20

    def test_hash_sample_deterministic(self, spark):
        from bighouse_spark.operators.curation import hash_sample

        docs = _docs(spark, [f"doc number {i}" for i in range(100)])
        a = sorted(r.doc_id for r in hash_sample(docs, 30).collect())
        b = sorted(r.doc_id for r in hash_sample(docs, 30).collect())
        assert a == b
        assert 10 < len(a) < 50  # ~30%


class TestSimHash:
    def test_identical_docs_distance_zero(self, spark):
        # The far doc uses a disjoint vocabulary — same-vocab cyclic
        # sentences share nearly all shingles and legitimately match.
        far = " ".join(f"w{i % 17}x w{(i * 5) % 13}y" for i in range(15))
        df = _docs(spark, [_sentence(5), _sentence(5), far])
        out = simhash_pairs(df, max_hamming=3).collect()
        assert {(r.id_a, r.id_b) for r in out} == {(0, 1)}
        assert out[0].hamming == 0

    def test_deterministic_across_runs(self, spark):
        df = _docs(spark, [_sentence(i) for i in range(6)])
        a = sorted(map(tuple, simhash_pairs(df).collect()))
        b = sorted(map(tuple, simhash_pairs(df).collect()))
        assert a == b

    def test_md5_60_family_same_semantics(self, spark):
        # The oracle-checkable md5_60 family (60-bit sigs, 15-bit
        # bands) must keep the pigeonhole guarantee: identical docs at
        # hamming 0, disjoint-vocab docs absent.
        far = " ".join(f"w{i % 17}x w{(i * 5) % 13}y" for i in range(15))
        df = _docs(spark, [_sentence(5), _sentence(5), far])
        out = simhash_pairs(df, max_hamming=3, hash_fn="md5_60").collect()
        assert {(r.id_a, r.id_b) for r in out} == {(0, 1)}
        assert out[0].hamming == 0


class TestANN:
    def test_lsh_recall_vs_brute_force(self, spark):
        emb = load_table(spark, SF_CORRECT, "embeddings")
        queries = emb.where(F.col("vec_id") < 20)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, queries, k=5).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in lsh_ann_topk(
                emb, queries, k=5, bits=4, tables=4, dim=64
            ).collect()
        }
        recall = len(exact & approx) / len(exact)
        # 4 tables × 4 bits touches ~25% of the corpus per query; the
        # semantic contract is recall far above the ~6% chance line.
        assert recall >= 0.35, f"ANN recall {recall} too low"

    def test_brute_force_excludes_self_and_ranks(self, spark):
        emb = load_table(spark, SF_CORRECT, "embeddings")
        queries = emb.where(F.col("vec_id") == 0)
        out = brute_force_topk(emb, queries, k=5).orderBy("rank").collect()
        assert len(out) == 5
        assert all(r.neighbor_id != 0 for r in out)
        assert [r.rank for r in out] == [1, 2, 3, 4, 5]
        sims = [r.sim for r in out]
        assert sims == sorted(sims, reverse=True)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [
                Row(k="a", t=10, lv="L10"),
                Row(k="a", t=20, lv="L20"),
                Row(k="b", t=5, lv="L5"),
            ]
        )
        right = spark.createDataFrame(
            [
                Row(k="a", t=10, rv="R10"),
                Row(k="a", t=15, rv="R15"),
                Row(k="b", t=9, rv="R9"),
            ]
        )
        return left, right

    def test_non_strict_includes_equal_timestamp(self, spark):
        left, right = self._frames(spark)
        out = {
            (r.k, r.t): r.rv
            for r in asof_join(
                left, right, on=["k"], left_time="t", right_time="t",
                right_values=["rv"],
            ).collect()
        }
        assert out[("a", 10)] == "R10"  # equal ts matches
        assert out[("a", 20)] == "R15"  # latest prior
        assert out[("b", 5)] is None  # right row is in the future

    def test_strict_excludes_equal_timestamp(self, spark):
        left, right = self._frames(spark)
        out = {
            (r.k, r.t): r.rv
            for r in asof_join(
                left, right, on=["k"], left_time="t", right_time="t",
                right_values=["rv"], strict=True,
            ).collect()
        }
        assert out[("a", 10)] is None  # strictly-before only
        assert out[("a", 20)] == "R15"

    def test_left_rows_preserved(self, spark):
        left, right = self._frames(spark)
        joined = asof_join(
            left, right, on=["k"], left_time="t", right_time="t",
            right_values=["rv"],
        )
        assert joined.count() == left.count()


class TestMultimodal:
    def test_extract_features_schema_and_bytes(self, spark):
        docs = load_table(spark, SF_CORRECT, "documents").limit(50)
        feats = extract_features(documents_as_media(docs))
        rows = feats.collect()
        assert len(rows) == 50
        r = rows[0]
        assert r.modality == "image"
        assert r.n_bytes > 0
        assert len(r.payload_hash) == 32
        assert len(r.feature) == 8  # stub feature dim

    def test_feature_deterministic(self, spark):
        docs = load_table(spark, SF_CORRECT, "documents").limit(10)
        media = documents_as_media(docs)
        a = sorted((r.media_id, tuple(r.feature)) for r in extract_features(media).collect())
        b = sorted((r.media_id, tuple(r.feature)) for r in extract_features(media).collect())
        assert a == b

    def test_frame_sample_explodes(self, spark):
        docs = load_table(spark, SF_CORRECT, "documents").limit(5)
        frames = frame_sample(documents_as_media(docs), every_n=1)
        assert frames.count() >= 5  # >=1 stub frame per payload
        assert frames.columns == ["media_id", "frame_idx", "frame_hash"]


class TestApproxBounds:
    def test_approx_count_distinct_within_5pct(self, spark):
        ev = load_table(spark, SF_CORRECT, "events")
        exact = ev.agg(F.count_distinct("user_id")).collect()[0][0]
        approx = ev.agg(F.approx_count_distinct("user_id")).collect()[0][0]
        assert abs(approx - exact) / exact < 0.05

    def test_percentile_approx_close_to_exact(self, spark):
        li = load_table(spark, SF_CORRECT, "lineitem")
        exact = li.agg(
            F.percentile("l_extendedprice", F.lit(0.5))
        ).collect()[0][0]
        approx = li.agg(
            F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
        ).collect()[0][0]
        assert abs(approx - exact) / exact < 0.02


class TestIVF:
    def test_ivf_full_probe_equals_brute_force(self, spark):
        from bighouse_spark.operators.similarity import brute_force_topk, ivf_topk
        from bighouse_spark.sources.catalog import load_table
        from pyspark.sql import functions as F

        emb = load_table(spark, SF_CORRECT, "embeddings")
        q = emb.where(F.col("vec_id") < 5)
        exact = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in brute_force_topk(emb, q, k=5).collect()
        }
        # Probing every cell degenerates to exact search.
        full = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ivf_topk(emb, q, k=5, n_cells=8, nprobe=8).collect()
        }
        assert full == exact

    def test_ivf_recall_reasonable(self, spark):
        from bighouse_spark.operators.similarity import brute_force_topk, ivf_topk
        from bighouse_spark.sources.catalog import load_table
        from pyspark.sql import functions as F

        emb = load_table(spark, SF_CORRECT, "embeddings")
        q = emb.where(F.col("vec_id") < 10)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, q, k=5).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, q, k=5, n_cells=16, nprobe=6).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.5, f"IVF recall too low: {recall}"

    def test_ivf_deterministic(self, spark):
        from bighouse_spark.operators.similarity import ivf_topk
        from bighouse_spark.sources.catalog import load_table
        from pyspark.sql import functions as F

        emb = load_table(spark, SF_CORRECT, "embeddings")
        q = emb.where(F.col("vec_id") < 3)
        a = sorted(map(tuple, ivf_topk(emb, q, k=3).collect()))
        b = sorted(map(tuple, ivf_topk(emb, q, k=3).collect()))
        assert a == b

    def test_hll_rollup_merge_within_5pct(self, spark):
        """uniq_state_merge_rollup (uniqState/uniqMerge shape): merged
        per-month HLL partials must estimate per-priority distinct
        custkeys within 5% of exact."""
        from bighouse_spark.queries.registry import get

        got = {
            r.priority: r.approx_custs
            for r in get("uniq_state_merge_rollup").fn(
                spark, SF_CORRECT
            ).collect()
        }
        o = load_table(spark, SF_CORRECT, "orders")
        exact = {
            r.priority: r.n
            for r in o.groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(F.count_distinct("o_custkey").alias("n"))
            .collect()
        }
        assert set(got) == set(exact)
        for p, est in got.items():
            assert abs(est - exact[p]) / exact[p] < 0.05


class TestChunking:
    def test_overlap_and_reconstruction(self, spark):
        """Chunks tile the token stream with the declared overlap:
        chunk i starts at i*stride, adjacent chunks share `overlap`
        tokens, and stitching non-overlap tails reconstructs the doc."""
        from bighouse_spark.operators.chunking import chunk_documents

        text = " ".join(f"t{i}" for i in range(10))
        df = spark.createDataFrame([(1, text), (2, "a b c")], ["doc_id", "text"])
        out = (
            chunk_documents(df, size=4, overlap=2, keep_text=True)
            .orderBy("doc_id", "chunk_id")
            .collect()
        )
        one = [r for r in out if r.doc_id == 1]
        # 10 tokens, size 4, stride 2 -> ceil((10-4)/2)+1 = 4 chunks
        assert [r.chunk_id for r in one] == [0, 1, 2, 3]
        assert [r.chunk_text.split() for r in one] == [
            [f"t{i}" for i in range(0, 4)],
            [f"t{i}" for i in range(2, 6)],
            [f"t{i}" for i in range(4, 8)],
            [f"t{i}" for i in range(6, 10)],
        ]
        # short doc -> exactly one chunk, itself
        two = [r for r in out if r.doc_id == 2]
        assert len(two) == 1 and two[0].chunk_text == "a b c"
        # stitching chunk 0 + each subsequent chunk's last `stride`
        # tokens reconstructs the doc
        stitched = one[0].chunk_text.split()
        for r in one[1:]:
            stitched += r.chunk_text.split()[2:]
        assert stitched == text.split()

    def test_bad_overlap_raises(self, spark):
        from bighouse_spark.operators.chunking import chunk_documents

        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, size=4, overlap=4)

    def test_chunk_count_formula_random_docs(self, spark):
        """Property check over 60 random-length docs in one job: chunk
        count matches ceil((n-size)/stride)+1, ids are dense, chunks
        cover the doc exactly."""
        import math
        import random

        from bighouse_spark.operators.chunking import chunk_documents

        rng = random.Random(7)
        docs = [
            (i, " ".join(f"w{i}_{j}" for j in range(rng.randint(1, 90))))
            for i in range(60)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        size, overlap = 16, 4
        stride = size - overlap
        out = chunk_documents(df, size=size, overlap=overlap, keep_text=True)
        rows = out.orderBy("doc_id", "chunk_id").collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert set(by_doc) == {i for i, _ in docs}
        for i, text in docs:
            n = len(text.split())
            want = 1 if n <= size else math.ceil((n - size) / stride) + 1
            chunks = by_doc[i]
            assert [c.chunk_id for c in chunks] == list(range(want)), (i, n)
            stitched = chunks[0].chunk_text.split()
            for c in chunks[1:]:
                toks = c.chunk_text.split()
                assert toks == text.split()[
                    c.chunk_id * stride: c.chunk_id * stride + size
                ]
                stitched += toks[overlap:] if len(toks) > overlap else []
            # full coverage, no token lost
            assert stitched == text.split(), i


def test_sequence_count_greedy_formula(spark, tmp_path):
    """V P P V P → greedy non-overlapping view→purchase chains = 2
    (P2 finds no free view). Validates the ballot-style closed form
    behind sequence_count_view_purchase."""
    import datetime as dt

    from bighouse_spark.queries.registry import get

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, typ, 0.0, "{}")
        for i, typ in enumerate(
            ["view", "purchase", "purchase", "view", "purchase"]
        )
    ]
    d = str(tmp_path / "seq_events")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(d)

    # point the fixture loader at a dir shaped like a sf dir
    import os
    import shutil

    sfdir = str(tmp_path / "sfx")
    os.makedirs(sfdir)
    shutil.move(d, os.path.join(sfdir, "events.parquet"))
    out = get("sequence_count_view_purchase").fn(spark, sfdir).collect()
    assert [(r.user_id, r.n_chains) for r in out] == [(1, 2)]


class TestCacheLifecycle:
    """Operator scratch persists must be releasable — a long-lived
    server session must not accrete storage across requests
    (dedup.py persisted docs/sigs forever before round 4)."""

    def _persistent_rdd_count(self, spark):
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    def _settle_to_zero(self, spark, timeout_s: float = 10.0) -> int:
        """clearCache()'s JVM-side unpersists are non-blocking, so
        earlier tests' caches can still be draining from the
        getPersistentRDDs map when this class starts under a loaded
        full-suite run. Poll until the map is empty (or timeout)."""
        import time

        deadline = time.monotonic() + timeout_s
        n = self._persistent_rdd_count(spark)
        while n != 0 and time.monotonic() < deadline:
            time.sleep(0.2)
            spark.catalog.clearCache()
            n = self._persistent_rdd_count(spark)
        return n

    def test_minhash_lsh_releases_all_persists(self, spark):
        from bighouse_spark.operators.caching import release_tracked

        release_tracked()
        spark.catalog.clearCache()
        assert self._settle_to_zero(spark) == 0
        df = load_table(spark, SF_CORRECT, "documents").limit(200)
        minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()
        assert self._persistent_rdd_count(spark) > 0, "persist expected"
        released = release_tracked()
        # r14: docs+sigs were fused into ONE (id, shingles, sig)
        # persist (one cache-fill pass instead of two).
        assert released >= 1
        assert self._persistent_rdd_count(spark) == 0

    def test_release_tracked_idempotent_and_safe_before_action(self, spark):
        from bighouse_spark.operators.caching import release_tracked

        df = load_table(spark, SF_CORRECT, "documents").limit(50)
        lazy = minhash_lsh_pairs(df, jaccard_threshold=0.5)
        # Releasing BEFORE materialization must not break the plan —
        # it just recomputes without the cache.
        release_tracked()
        assert lazy.count() >= 0
        release_tracked()
        assert release_tracked() == 0
        assert self._persistent_rdd_count(spark) == 0

    def test_engine_path_releases_after_execute(self, spark):
        from bighouse_spark.operators.caching import release_tracked, tracked_persist
        from bighouse_spark.engine import BigHouseEngine

        release_tracked()
        spark.catalog.clearCache()
        eng = BigHouseEngine(spark=spark)
        # Simulate an operator persisting scratch state mid-query: the
        # engine's finally must drop it even though the query itself is
        # plain SQL.
        scratch = tracked_persist(load_table(spark, SF_CORRECT, "region"))
        scratch.count()
        assert self._persistent_rdd_count(spark) > 0
        eng.execute("SELECT count() AS c FROM range(10)")
        assert self._persistent_rdd_count(spark) == 0

    def test_release_is_thread_scoped(self, spark):
        """A request thread releasing its caches must not drop another
        thread's in-flight scratch tables."""
        import threading

        from bighouse_spark.operators.caching import (
            release_tracked,
            tracked_persist,
        )

        release_tracked()
        spark.catalog.clearCache()
        mine = tracked_persist(load_table(spark, SF_CORRECT, "region"))
        mine.count()
        released_elsewhere = []
        t = threading.Thread(
            target=lambda: released_elsewhere.append(release_tracked())
        )
        t.start()
        t.join()
        assert released_elsewhere == [0]  # other thread had nothing
        assert self._persistent_rdd_count(spark) > 0  # mine survived
        assert release_tracked() == 1
        assert self._persistent_rdd_count(spark) == 0


class TestSemDeDupCap:
    def test_degenerate_cluster_is_capped(self, spark, tmp_path):
        """Adversarial SemDeDup input: every vector identical, ONE
        label — uncapped this is quadratic in the corpus. With
        max_cluster_size=16 only the first 16 ids enter the pairwise
        step: ids 1-15 are dropped (cosine 1.0 against smaller-id 0),
        ids 16+ are kept verbatim (never compared)."""
        from bighouse_spark.operators.caching import release_tracked
        from bighouse_spark.queries.textops3 import (
            dedup_semantic_within_cluster,
        )

        rows = [(i, 0, [1.0, 0.0, 0.0, 0.0]) for i in range(100)]
        spark.createDataFrame(
            rows, "vec_id bigint, label int, embedding array<float>"
        ).write.parquet(str(tmp_path / "embeddings.parquet"))
        try:
            out = dedup_semantic_within_cluster(
                spark, str(tmp_path), max_cluster_size=16
            ).collect()
        finally:
            release_tracked()
        assert len(out) == 1
        r = out[0]
        assert (r.n_vecs, r.n_dropped, r.n_kept) == (100, 15, 85)

    def test_cap_above_cluster_sizes_is_noop(self, spark, tmp_path):
        """When no cluster exceeds the cap the result is identical to
        the uncapped greedy rule (the fixture-oracle contract)."""
        from bighouse_spark.operators.caching import release_tracked
        from bighouse_spark.queries.textops3 import (
            dedup_semantic_within_cluster,
        )

        # Two labels; label 1 has a near-duplicate pair (ids 10, 11).
        rows = [
            (0, 0, [1.0, 0.0, 0.0, 0.0]),
            (1, 0, [0.0, 1.0, 0.0, 0.0]),
            (10, 1, [0.0, 0.0, 1.0, 0.0]),
            (11, 1, [0.0, 0.0, 0.9, 0.1]),
        ]
        spark.createDataFrame(
            rows, "vec_id bigint, label int, embedding array<float>"
        ).write.parquet(str(tmp_path / "embeddings.parquet"))
        try:
            out = {
                r.label: (r.n_vecs, r.n_dropped, r.n_kept)
                for r in dedup_semantic_within_cluster(
                    spark, str(tmp_path)
                ).collect()
            }
        finally:
            release_tracked()
        assert out[0] == (2, 0, 2)   # orthogonal: nothing dropped
        assert out[1] == (2, 1, 1)   # 11 dropped against keeper 10


class TestCrossCorpusLSH:
    def test_sides_never_self_pair(self, spark):
        """Bipartite contract: within-corpus duplicates must NOT
        appear — only cross pairs, each exact-verified."""
        from bighouse_spark.operators.caching import release_tracked
        from bighouse_spark.operators.dedup import (
            minhash_lsh_pairs_between,
        )

        sent = lambda s, n: " ".join(f"w{s + i}" for i in range(n))
        a = spark.createDataFrame(
            [(1, sent(0, 30)), (2, sent(0, 30)), (3, sent(200, 30))],
            "doc_id bigint, text string",
        )  # 1 and 2 are identical WITHIN corpus A
        b = spark.createDataFrame(
            [(10, sent(0, 30)), (11, sent(500, 30))],
            "doc_id bigint, text string",
        )
        try:
            out = sorted(
                (r.id_a, r.id_b, r.jaccard)
                for r in minhash_lsh_pairs_between(
                    a, b, jaccard_threshold=0.8
                ).collect()
            )
        finally:
            release_tracked()
        assert out == [(1, 10, 1.0), (2, 10, 1.0)]

    def test_bucket_cap_bounds_each_side(self, spark):
        """Degenerate buckets (identical docs on both sides) stay
        bounded at cap² candidate pairs per bucket."""
        from bighouse_spark.operators.caching import release_tracked
        from bighouse_spark.operators.dedup import (
            minhash_lsh_pairs_between,
        )

        text = " ".join(f"w{i}" for i in range(30))
        a = spark.createDataFrame(
            [(i, text) for i in range(40)], "doc_id bigint, text string"
        )
        b = spark.createDataFrame(
            [(100 + i, text) for i in range(40)],
            "doc_id bigint, text string",
        )
        try:
            out = minhash_lsh_pairs_between(
                a, b, jaccard_threshold=0.5, max_bucket_size=4
            ).collect()
        finally:
            release_tracked()
        # Only the first 4 ids of each side per bucket pair up
        # (every band has the same single bucket here): 4×4 pairs.
        assert len(out) == 16
        assert max(r.id_a for r in out) == 3
        assert max(r.id_b for r in out) == 103

    def test_no_cartesian_in_plan(self, spark):
        from bighouse_spark.operators.caching import release_tracked
        from bighouse_spark.queries.registry import get
        from tests.conftest import SF_CORRECT

        try:
            plan = (
                get("dedup_cross_corpus_lsh").fn(spark, SF_CORRECT)
                ._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            release_tracked()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestPQ:
    def test_pq_refined_recall(self, spark):
        from pyspark.sql import functions as F

        from bighouse_spark.operators.similarity import (
            brute_force_topk,
            pq_topk,
        )
        from bighouse_spark.sources.catalog import load_table

        emb = load_table(spark, SF_CORRECT, "embeddings")
        q = emb.where(F.col("vec_id") < 5)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, q, k=5).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in pq_topk(emb, q, k=5, dim=64).collect()
        }
        assert len(exact & approx) / len(exact) >= 0.5

    def test_pq_deterministic_and_shapes(self, spark):
        from pyspark.sql import functions as F

        from bighouse_spark.operators.similarity import pq_topk
        from bighouse_spark.sources.catalog import load_table

        emb = load_table(spark, SF_CORRECT, "embeddings")
        q = emb.where(F.col("vec_id") < 3)
        out1 = pq_topk(emb, q, k=4, dim=64).collect()
        out2 = pq_topk(emb, q, k=4, dim=64).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        per_query = {}
        for r in out1:
            per_query.setdefault(r.query_id, []).append(r)
            assert r.neighbor_id != r.query_id
        for rows in per_query.values():
            assert sorted(x.rank for x in rows) == [1, 2, 3, 4]

    def test_pq_unrefined_is_adc_ranked(self, spark):
        from pyspark.sql import functions as F

        from bighouse_spark.operators.similarity import pq_topk
        from bighouse_spark.sources.catalog import load_table

        emb = load_table(spark, SF_CORRECT, "embeddings")
        q = emb.where(F.col("vec_id") < 2)
        rows = pq_topk(
            emb, q, k=3, dim=64, refine_factor=None
        ).collect()
        for r in rows:
            assert -1.5 <= r.sim <= 1.5  # ADC approximates cosine

    def test_pq_dim_mismatch_guided(self, spark):
        from pyspark.sql import functions as F

        from bighouse_spark.operators.similarity import pq_topk
        from bighouse_spark.sources.catalog import load_table

        emb = load_table(spark, SF_CORRECT, "embeddings")
        q = emb.where(F.col("vec_id") < 2)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="divisible"):
            pq_topk(emb, q, k=3, dim=64, m=7)
