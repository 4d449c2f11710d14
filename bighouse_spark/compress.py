"""ClickHouse wire-compression frames (native TCP protocol).

Every compressed block on the native wire is framed as:

    [16B checksum = CityHash128 v1.0.2 of everything after it]
    [1B method: 0x02 None, 0x82 LZ4, 0x90 ZSTD]
    [4B LE compressed_size  -- INCLUDES this 9-byte header]
    [4B LE uncompressed_size]
    [payload]

(public format — ClickHouse ``CompressedWriteBuffer`` /
``clickhouse-driver compression/base.py``; the reference's only
client path, ``clickhouse-go``, speaks exactly this framing:
reference ``temporal/workflow_query_executor.go:222-235``).

The LZ4 *block* codec here is a from-scratch implementation of the
public LZ4 block format (token nibbles, literal runs, 2-byte LE match
offsets, minimum match 4, literals-only final sequence). Decompression
is complete; compression is a greedy single-probe hash-table matcher
(the classic LZ4-fast strategy) that falls back to a literals-only
sequence for incompressible/short input — always valid LZ4, never
claims ratios it didn't earn. ZSTD frames are refused with a guided
error (negotiate LZ4 or none).
"""

from __future__ import annotations

import struct

from bighouse_spark.functions.cityhash import cityhash128

METHOD_NONE = 0x02
METHOD_LZ4 = 0x82
METHOD_ZSTD = 0x90

# CH splits the uncompressed stream into blocks of at most
# max_compress_block_size (1 MiB default) per frame.
MAX_BLOCK = 1 << 20


def lz4_decompress(src: bytes, uncompressed_size: int) -> bytes:
    """Decode one LZ4 block (public block format)."""
    out = bytearray()
    pos, n = 0, len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if lit_len:
            if pos + lit_len > n:
                raise ValueError("LZ4 block truncated inside literals")
            out += src[pos:pos + lit_len]
            pos += lit_len
        if pos >= n:
            break  # final sequence: literals only, no match
        if pos + 2 > n:
            raise ValueError("LZ4 block truncated at match offset")
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError(f"LZ4 invalid match offset {offset}")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        for i in range(match_len):  # byte-wise: overlap is legal
            out.append(out[start + i])
    if len(out) != uncompressed_size:
        raise ValueError(
            f"LZ4 block decoded to {len(out)} bytes, frame header "
            f"promised {uncompressed_size}"
        )
    return bytes(out)


def _lz4_len_ext(n: int) -> bytes:
    out = bytearray()
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)
    return bytes(out)


def _lz4_literal_run(data: bytes) -> bytes:
    """A whole buffer as one literals-only sequence (always valid)."""
    n = len(data)
    if n < 15:
        return bytes([n << 4]) + data
    return bytes([0xF0]) + _lz4_len_ext(n - 15) + data


def lz4_compress(data: bytes) -> bytes:
    """Greedy hash-table LZ4 block encoder. The last 5 bytes are
    always emitted as literals and matches never start within the
    final 12 bytes (the block-format end-of-block restrictions)."""
    n = len(data)
    if n < 32:
        return _lz4_literal_run(data)
    table: dict[bytes, int] = {}
    out = bytearray()
    anchor = 0  # start of pending literal run
    pos = 0
    limit = n - 12  # last match must start >=12 bytes before the end
    while pos < limit:
        key = data[pos:pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 0xFFFF:
            # Extend the match forward (last 5 bytes stay literals).
            m = pos + 4
            c = cand + 4
            while m < n - 5 and data[m] == data[c]:
                m += 1
                c += 1
            lit = data[anchor:pos]
            match_len = m - pos
            lit_n, mat_n = len(lit), match_len - 4
            token = (min(lit_n, 15) << 4) | min(mat_n, 15)
            out.append(token)
            if lit_n >= 15:
                out += _lz4_len_ext(lit_n - 15)
            out += lit
            out += struct.pack("<H", pos - cand)
            if mat_n >= 15:
                out += _lz4_len_ext(mat_n - 15)
            anchor = m
            pos = m
        else:
            pos += 1
    out += _lz4_literal_run(data[anchor:])
    return bytes(out)


def compress_frame(data: bytes, method: int = METHOD_LZ4) -> bytes:
    """data → one checksummed CH frame (callers split at MAX_BLOCK)."""
    if method == METHOD_LZ4:
        payload = lz4_compress(data)
        if len(payload) >= len(data):
            # Incompressible: still a valid LZ4 literals-only block.
            payload = _lz4_literal_run(data)
    elif method == METHOD_NONE:
        payload = data
    else:
        raise ValueError(
            f"unsupported compression method 0x{method:02x}; this "
            "server emits LZ4 (0x82) or None (0x02)"
        )
    body = (
        bytes([method])
        + struct.pack("<ii", 9 + len(payload), len(data))
        + payload
    )
    lo, hi = cityhash128(body)
    return struct.pack("<QQ", lo, hi) + body


def decompress_frame(frame_body: bytes, method: int,
                     uncompressed_size: int) -> bytes:
    """Decode one frame's payload (checksum/header already consumed;
    ``read_frame`` below handles socket framing + verification)."""
    if method == METHOD_LZ4:
        return lz4_decompress(frame_body, uncompressed_size)
    if method == METHOD_NONE:
        if len(frame_body) != uncompressed_size:
            raise ValueError(
                "None-method frame size mismatch: "
                f"{len(frame_body)} != {uncompressed_size}"
            )
        return frame_body
    if method == METHOD_ZSTD:
        raise ValueError(
            "ZSTD wire compression is not available in this build; "
            "connect with LZ4 or compression disabled"
        )
    raise ValueError(f"unknown compression method 0x{method:02x}")


def read_frame(read_exact) -> bytes:
    """Pull one compressed frame via ``read_exact(n) -> bytes`` and
    return the decompressed bytes, verifying the CityHash128
    checksum."""
    checksum = read_exact(16)
    head = read_exact(9)
    method = head[0]
    compressed_size, uncompressed_size = struct.unpack("<ii", head[1:9])
    if compressed_size < 9 or compressed_size > (1 << 30):
        raise ValueError(
            f"implausible compressed frame size {compressed_size}"
        )
    payload = read_exact(compressed_size - 9)
    lo, hi = cityhash128(head + payload)
    want_lo, want_hi = struct.unpack("<QQ", checksum)
    if (lo, hi) != (want_lo, want_hi):
        raise ValueError(
            "compressed frame checksum mismatch (CityHash128): "
            f"got ({lo:#x},{hi:#x}) want ({want_lo:#x},{want_hi:#x})"
        )
    return decompress_frame(payload, method, uncompressed_size)
