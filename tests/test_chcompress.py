"""LZ4 block codec + ClickHouse compressed-frame tests. The LZ4
decoder here cross-checks against the INDEPENDENT decoder in
``test_chwire``; CityHash128 gets self-consistency coverage of every
length-class code path plus a wheel-gated bit-parity check (same
posture as ``cityHash64`` — the wheel is not in this container)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bighouse_spark.compress import (
    METHOD_LZ4,
    METHOD_NONE,
    compress_frame,
    lz4_compress,
    lz4_decompress,
    read_frame,
)
from bighouse_spark.functions.cityhash import cityhash128
from tests.test_chwire import _lz4_decode_indep


def _frame_reader(frame: bytes):
    pos = [0]

    def rx(n: int) -> bytes:
        out = frame[pos[0]:pos[0] + n]
        assert len(out) == n, "frame truncated"
        pos[0] += n
        return out

    return rx


@given(st.binary(max_size=5000))
@settings(max_examples=200, deadline=None)
def test_lz4_roundtrip_property(data):
    c = lz4_compress(data)
    assert lz4_decompress(c, len(data)) == data
    assert _lz4_decode_indep(c, len(data)) == data


def test_lz4_compresses_repetitive_input():
    data = b"the quick brown fox " * 1000
    c = lz4_compress(data)
    assert len(c) < len(data) // 10
    assert lz4_decompress(c, len(data)) == data


def test_lz4_overlapping_match():
    # RLE-style: match offset 1, the classic overlap case.
    data = b"a" * 1000
    c = lz4_compress(data)
    assert lz4_decompress(c, len(data)) == data
    assert _lz4_decode_indep(c, len(data)) == data


@pytest.mark.parametrize("method", [METHOD_LZ4, METHOD_NONE])
def test_frame_roundtrip(method):
    data = b"hello frame " * 100
    frame = compress_frame(data, method)
    assert read_frame(_frame_reader(frame)) == data


def test_frame_checksum_tamper_detected():
    frame = bytearray(compress_frame(b"payload " * 50))
    frame[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        read_frame(_frame_reader(bytes(frame)))


def test_frame_wrong_size_detected():
    frame = bytearray(compress_frame(b"x" * 100, METHOD_NONE))
    # Corrupt the uncompressed-size field and re-checksum so only the
    # size check can catch it.
    body = bytes(frame[16:])
    body = body[:5] + struct.pack("<i", 99) + body[9:]
    lo, hi = cityhash128(body)
    with pytest.raises(ValueError, match="size mismatch"):
        read_frame(_frame_reader(struct.pack("<QQ", lo, hi) + body))


class TestCityHash128:
    def test_length_class_coverage_and_determinism(self):
        # 0, <8, 8-15, 16+CityMurmur small, >16 CityMurmur loop,
        # 128+ long path incl. tail chunks — every branch.
        data = bytes(range(256)) * 8
        seen = set()
        for n in (0, 1, 7, 8, 12, 15, 16, 17, 32, 100, 127, 128, 143,
                  144, 160, 200, 256, 300, 1000, 2048):
            h1 = cityhash128(data[:n])
            h2 = cityhash128(bytes(data[:n]))
            assert h1 == h2
            assert h1 not in seen, f"collision at len {n}"
            seen.add(h1)
            assert all(0 <= part < (1 << 64) for part in h1)

    def test_avalanche(self):
        a = bytearray(b"0123456789abcdef" * 20)
        h0 = cityhash128(bytes(a))
        a[100] ^= 1
        h1 = cityhash128(bytes(a))
        lo_diff = bin(h0[0] ^ h1[0]).count("1")
        hi_diff = bin(h0[1] ^ h1[1]).count("1")
        assert lo_diff + hi_diff > 30

try:  # the bit-parity gate: runs whenever the wheel is installable
    from clickhouse_cityhash.cityhash import CityHash128 as _RefCity128
except ImportError:
    _RefCity128 = None


@pytest.mark.skipif(
    _RefCity128 is None,
    reason="clickhouse_cityhash not installed — bit-parity gate for "
    "CityHash128 activates when the wheel lands (same posture as "
    "cityHash64)",
)
def test_bit_parity_against_clickhouse_cityhash():
    data = bytes(range(256)) * 8
    for n in (0, 1, 7, 8, 15, 16, 100, 127, 128, 144, 300, 2048):
        lo, hi = cityhash128(data[:n])
        assert (lo | (hi << 64)) == _RefCity128(data[:n])
