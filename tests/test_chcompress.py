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
    METHOD_ZSTD,
    _zstd_decode_fallback,
    compress_frame,
    lz4_compress,
    lz4_decompress,
    read_frame,
    zstd_decompress,
    zstd_raw_frame,
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


@pytest.mark.parametrize(
    "method", [METHOD_LZ4, METHOD_NONE, METHOD_ZSTD]
)
def test_frame_roundtrip(method):
    data = b"hello frame " * 100
    frame = compress_frame(data, method)
    assert read_frame(_frame_reader(frame)) == data


class TestBombGuards:
    """Declared sizes are attacker-controlled: the decoder must stop
    BEFORE materializing a bomb, not after."""

    def test_frame_declared_size_capped(self):
        # a tiny zstd payload legally expanding to ~1 GiB: the frame
        # cap must reject on the DECLARED size before decoding
        import pyarrow as pa

        bomb_plain = 1 << 30
        payload = bytes(pa.Codec("zstd").compress(b"\x00" * (1 << 20)))
        # hand-build the frame header with a huge declared size
        from bighouse_spark.functions.cityhash import cityhash128

        body = (
            bytes([0x90])
            + struct.pack("<ii", 9 + len(payload), bomb_plain)
            + payload
        )
        lo, hi = cityhash128(body)
        frame = struct.pack("<QQ", lo, hi) + body
        with pytest.raises(ValueError, match="per-frame cap"):
            read_frame(_frame_reader(frame))

    def test_lz4_match_amplification_stops_early(self):
        # classic LZ4 bomb: 4 literals then one huge overlapping
        # match; declared size small → must raise, not build the
        # oversized buffer first
        bomb = bytes([0x4F]) + b"ABCD" + struct.pack("<H", 4)
        bomb += b"\xff" * 200 + b"\x00"  # match_len ≈ 51k
        with pytest.raises(ValueError, match="expands past"):
            lz4_decompress(bomb, 100)

    def test_honest_frames_still_roundtrip(self):
        for method in (METHOD_LZ4, METHOD_ZSTD, METHOD_NONE):
            data = b"x" * 50000
            assert read_frame(
                _frame_reader(compress_frame(data, method))
            ) == data


class TestZstd:
    """ZSTD wire frames (RFC 8878). The pyarrow codec is the runtime
    path; the from-scratch raw-block encoder and Raw/RLE subset
    decoder are the no-pyarrow fallback — both are cross-checked
    against REAL zstd (pyarrow's bundled C implementation), not just
    against themselves."""

    def test_raw_frame_decoded_by_real_zstd(self):
        import pyarrow as pa

        codec = pa.Codec("zstd")
        for data in (b"", b"x", b"abc" * 100, bytes(range(256)) * 700):
            frame = zstd_raw_frame(data)
            assert bytes(codec.decompress(frame, len(data))) == data

    def test_real_zstd_frame_decoded_by_wire_path(self):
        # a real client emits FSE/Huffman-compressed frames; the wire
        # decode path must read them
        import pyarrow as pa

        data = b"the quick brown fox jumps " * 500
        real = bytes(pa.Codec("zstd").compress(data))
        assert zstd_decompress(real, len(data)) == data

    def test_fallback_decoder_reads_raw_and_rle(self):
        data = b"A" * 1000 + b"varied tail 0123456789"
        # raw-block frame from our own encoder
        assert _zstd_decode_fallback(
            zstd_raw_frame(data), len(data)
        ) == data
        # hand-built RLE frame: 'Z' * 300
        frame = struct.pack("<I", 0xFD2FB528)
        frame += bytes([0x60]) + struct.pack("<H", 300 - 256)
        frame += (1 | (1 << 1) | (300 << 3)).to_bytes(3, "little")
        frame += b"Z"
        assert _zstd_decode_fallback(frame, 300) == b"Z" * 300

    def test_fallback_decoder_rle_bomb_stops_in_loop(self):
        # An RLE block declares up to ~2 MiB of output from 4 bytes;
        # the guard must fire AT the offending block, before the
        # whole multi-frame payload is materialized past `expected`.
        bomb = 1 << 20
        frame = struct.pack("<I", 0xFD2FB528)
        frame += bytes([0x60]) + struct.pack("<H", 0)  # fcs ignored
        # two RLE blocks of 1 MiB each, declared size only 10 bytes
        frame += (0 | (1 << 1) | (bomb << 3)).to_bytes(3, "little")
        frame += b"Z"
        frame += (1 | (1 << 1) | (bomb << 3)).to_bytes(3, "little")
        frame += b"Z"
        with pytest.raises(ValueError, match="decodes past"):
            _zstd_decode_fallback(frame, 10)

    def test_fallback_decoder_guided_error_on_compressed_block(self):
        import pyarrow as pa

        data = b"compressible compressible " * 200
        real = bytes(pa.Codec("zstd").compress(data))
        with pytest.raises(ValueError, match="LZ4"):
            _zstd_decode_fallback(real, len(data))

    def test_corrupt_zstd_frame_is_valueerror(self):
        with pytest.raises(ValueError, match="ZSTD"):
            zstd_decompress(b"\x00\x01\x02\x03garbage", 10)

    @given(st.binary(max_size=4000))
    @settings(max_examples=100, deadline=None)
    def test_zstd_frame_roundtrip_property(self, data):
        frame = compress_frame(data, METHOD_ZSTD)
        assert read_frame(_frame_reader(frame)) == data
        # and the raw-block fallback frame stays spec-valid
        import pyarrow as pa

        assert bytes(
            pa.Codec("zstd").decompress(zstd_raw_frame(data), len(data))
        ) == data


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
