"""Bit-exact cityHash64 (CityHash v1.0.2) — closes the last deferred
reference-fidelity item (reference README.md:106-121: the
``sum(cityHash64(*))`` whole-table checksum).

Offline assertions: the one CH-documented value computable without a
live ClickHouse (``cityHash64('') == 11160318154034397263``, the k2
constant), every length-class code path, the multi-argument
Hash128to64 left-fold, and frozen regression vectors. The full
cross-check against ``clickhouse_cityhash`` (the wheel CH's own
Python driver uses) runs automatically when that package is
installed — it is not baked into this container, so it skips here.
"""

import struct
from decimal import Decimal

import pytest

from bighouse_spark.functions.cityhash import (
    K2,
    cityhash64,
    cityhash64_values,
    hash128to64,
)

try:
    from clickhouse_cityhash.cityhash import CityHash64 as _RefCityHash64
except ImportError:
    _RefCityHash64 = None


class TestCore:
    def test_empty_string_is_k2(self):
        # SELECT cityHash64('') in ClickHouse → 11160318154034397263.
        assert cityhash64(b"") == K2 == 11160318154034397263

    def test_all_length_classes_run_and_disperse(self):
        # 0, 1-3, 4-8, 9-16, 17-32, 33-64, 65-128 (one block),
        # >128 (multi-block) — every branch of the v1.0.2 dispatch.
        lengths = [0, 1, 2, 3, 4, 5, 7, 8, 9, 12, 16, 17, 24, 31, 32,
                   33, 48, 63, 64, 65, 100, 127, 128, 129, 192, 256, 1000]
        hashes = [cityhash64((b"0123456789abcdef" * 63)[:n]) for n in lengths]
        assert len(set(hashes)) == len(lengths)
        for h in hashes:
            assert 0 <= h < (1 << 64)

    def test_deterministic(self):
        data = b"the quick brown fox jumps over the lazy dog" * 4
        assert cityhash64(data) == cityhash64(bytes(data))

    def test_single_byte_difference_avalanches(self):
        a = bytearray(b"x" * 200)
        b = bytearray(a)
        b[100] ^= 1
        ha, hb = cityhash64(bytes(a)), cityhash64(bytes(b))
        assert ha != hb
        # Crude avalanche check: at least 16 of 64 bits flip.
        assert bin(ha ^ hb).count("1") >= 16

    def test_frozen_regression_vectors(self):
        # Goldens HARDCODED from the round-5 implementation: any
        # future transcription drift in the port fails here. (The
        # external bit-parity gate is the clickhouse_cityhash test
        # below; only b'' is independently CH-documented.)
        vectors = {
            b"": 11160318154034397263,
            b"a": 2603192927274642682,
            b"abc": 4220206313085259313,
            b"0123456789abcdef0": 5496319037578566379,  # 17-32 path
            b"x" * 40: 3896669899269749907,  # 33-64 path
            b"y" * 100: 10592969210838759155,  # >64 block path
        }
        for data, expect in vectors.items():
            assert cityhash64(data) == expect, data

    def test_multi_value_fold_is_hash128to64(self):
        h1 = cityhash64(b"first")
        h2 = cityhash64(b"second")
        assert cityhash64_values(["first", "second"]) == hash128to64(h1, h2)
        h3 = cityhash64(struct.pack("<Q", 42))
        assert cityhash64_values(["first", "second", 42]) == hash128to64(
            hash128to64(h1, h2), h3
        )

    def test_integer_encoding_is_8_byte_le(self):
        assert cityhash64_values([1]) == cityhash64(b"\x01" + b"\x00" * 7)
        assert cityhash64_values([-1]) == cityhash64(b"\xff" * 8)

    @pytest.mark.skipif(
        _RefCityHash64 is None,
        reason="clickhouse_cityhash not installed — bit-parity gate "
        "runs wherever the wheel is available",
    )
    def test_bit_parity_against_clickhouse_cityhash(self):
        import random

        rng = random.Random(42)
        samples = [b""]
        for n in [1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64,
                  65, 100, 128, 129, 200, 1024, 5000]:
            samples.append(bytes(rng.getrandbits(8) for _ in range(n)))
        for s in samples:
            assert cityhash64(s) == _RefCityHash64(s), s


class TestSQL:
    def test_exact_spelling_empty_string(self, spark):
        from bighouse_spark.engine import BigHouseEngine, QueryRequest

        eng = BigHouseEngine(spark)
        res = eng.execute(QueryRequest(query="SELECT cityHash64Exact('') AS h"))
        assert res.rows[0][0] == Decimal(K2)

    def test_exact_matches_local_fold_on_values(self, spark):
        from bighouse_spark.engine import BigHouseEngine, QueryRequest

        eng = BigHouseEngine(spark)
        res = eng.execute(
            QueryRequest(
                query="SELECT cityHash64Exact(s, n) AS h FROM "
                "values('s String, n UInt64', ('alpha', 1), ('beta', 2)) "
                "ORDER BY h"
            )
        )
        expect = sorted(
            Decimal(cityhash64_values(v)) for v in [["alpha", 1], ["beta", 2]]
        )
        assert [r[0] for r in res.rows] == expect

    def test_settings_flag_flips_plain_spelling(self, spark):
        from bighouse_spark.engine import BigHouseEngine, QueryRequest

        eng = BigHouseEngine(spark)
        res = eng.execute(
            QueryRequest(
                query="SELECT cityHash64('') AS h SETTINGS exact_cityhash=1"
            )
        )
        assert res.rows[0][0] == Decimal(K2)
        # Without the setting the capability path (xxhash64) serves.
        res2 = eng.execute(QueryRequest(query="SELECT cityHash64('') AS h"))
        assert res2.rows[0][0] != Decimal(K2)

    def test_star_hashes_whole_row(self, spark):
        from bighouse_spark.engine import BigHouseEngine, QueryRequest

        eng = BigHouseEngine(spark)
        res = eng.execute(
            QueryRequest(
                query="SELECT sum(cityHash64Exact(*)) AS checksum FROM "
                "values('a UInt64, b String', (1, 'x'), (2, 'y'))"
            )
        )
        # The dialect wraps the checksum mod 2^64, matching CH's
        # wrapping sum(UInt64) — the raw sum of two ~2^63 hashes
        # already overflows.
        expect = sum(
            cityhash64_values(v) for v in [[1, "x"], [2, "y"]]
        ) % (1 << 64)
        assert res.rows[0][0] == Decimal(expect)

    def test_null_argument_propagates(self, spark):
        from bighouse_spark.engine import BigHouseEngine, QueryRequest

        eng = BigHouseEngine(spark)
        res = eng.execute(
            QueryRequest(
                query="SELECT cityHash64Exact(CAST(NULL AS String)) AS h"
            )
        )
        assert res.rows[0][0] is None

    def test_fixture_checksum_deterministic(self, spark):
        # The reference's checksum shape over a real fixture slice:
        # stable across runs (and partition layouts — the sum is
        # order-free).
        from tests.conftest import SF_SMOKE

        from bighouse_spark.engine import BigHouseEngine, QueryRequest

        eng = BigHouseEngine(spark)
        q = (
            "SELECT sum(cityHash64Exact(r_regionkey, r_name)) AS checksum "
            f"FROM file('{SF_SMOKE}/region.parquet', 'Parquet')"
        )
        a = eng.execute(QueryRequest(query=q)).rows[0][0]
        b = eng.execute(QueryRequest(query=q)).rows[0][0]
        assert a == b and a is not None


class TestRound6AdviceFixes:
    def test_float32_hashes_at_native_width(self, spark):
        # CH hashes Float32 at 4 bytes ('<f'); widening to '<d'
        # would silently diverge from a live CH (ADVICE r6).
        import struct

        from bighouse_spark.engine import BigHouseEngine, QueryRequest

        eng = BigHouseEngine(spark)
        res = eng.execute(
            QueryRequest(
                query="SELECT cityHash64Exact(toFloat32(1.5)) AS f, "
                "cityHash64Exact(toFloat64(1.5)) AS d"
            )
        )
        f, d = res.rows[0]
        assert f == Decimal(cityhash64(struct.pack("<f", 1.5)))
        assert d == Decimal(cityhash64(struct.pack("<d", 1.5)))
        assert f != d

    def test_timezone_flip_reregisters_udf(self, spark):
        # SET spark.sql.session.timeZone mid-session must flip the
        # datetime-parity guard (stale id(spark) cache, ADVICE r6).
        from bighouse_spark.engine import BigHouseEngine, QueryRequest

        eng = BigHouseEngine(spark)
        q = QueryRequest(
            query="SELECT cityHash64Exact("
            "toDateTime('2024-01-01 00:00:00')) AS h"
        )
        tz0 = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            assert eng.execute(q).rows[0][0] is not None
            spark.conf.set(
                "spark.sql.session.timeZone", "America/New_York"
            )
            with pytest.raises(Exception, match="UTC"):
                eng.execute(q)
            # ... and back: UTC restores the datetime path.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            assert eng.execute(q).rows[0][0] is not None
        finally:
            spark.conf.set("spark.sql.session.timeZone", tz0)
