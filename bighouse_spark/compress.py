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
claims ratios it didn't earn.

ZSTD (method 0x90) wraps a standard ZSTD frame (RFC 8878) in the CH
frame header. The codec is pyarrow's bundled zstd when present (the
repo already depends on pyarrow for Parquet/Arrow formats — full
decode of anything a real client emits, C-speed). Without pyarrow the
from-scratch fallback still interoperates: the encoder emits
spec-valid single-segment frames made of Raw blocks (any conformant
decoder reads them), and the decoder handles Raw/RLE-block and
skippable frames, refusing FSE/Huffman-compressed blocks with a
guided error naming LZ4 as the negotiation that always works.
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
# Receive-side bound on a frame's DECLARED uncompressed size: well
# above any real client block (1 MiB default, settable to a few MiB)
# but far below the int32 range a decompression bomb would declare.
MAX_UNCOMPRESSED_FRAME = 256 << 20


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
        if len(out) > uncompressed_size:
            # Bomb guard: stop the moment output EXCEEDS the declared
            # size, not at the end — match-copies can amplify a
            # 100-byte input to gigabytes before the final check.
            raise ValueError(
                "LZ4 block expands past its declared "
                f"uncompressed size {uncompressed_size}"
            )
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
        if len(out) + match_len > uncompressed_size:
            raise ValueError(
                "LZ4 block expands past its declared "
                f"uncompressed size {uncompressed_size}"
            )
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


# -- ZSTD (RFC 8878) ---------------------------------------------

ZSTD_MAGIC = 0xFD2FB528
ZSTD_SKIPPABLE_LO = 0x184D2A50  # 0x184D2A5? are skippable frames
_ZSTD_RAW_BLOCK_MAX = 128 * 1024  # Block_Maximum_Size upper bound


def _zstd_codec():
    """pyarrow's bundled zstd, or None. Import-gated: the fallback
    below keeps the wire working without it."""
    try:
        import pyarrow as pa

        if pa.Codec.is_available("zstd"):
            return pa.Codec("zstd")
    except Exception:  # pragma: no cover - pyarrow is baked in here
        pass
    return None  # pragma: no cover


def zstd_raw_frame(data: bytes) -> bytes:
    """A spec-valid ZSTD frame holding ``data`` as Raw blocks —
    single-segment, Frame_Content_Size present, no dictionary, no
    content checksum. Any conformant decoder reads this; it trades
    ratio for zero third-party code."""
    n = len(data)
    out = bytearray(struct.pack("<I", ZSTD_MAGIC))
    # Frame_Header_Descriptor: bits 6-7 FCS code, bit 5 Single_Segment
    # (window = FCS, no Window_Descriptor byte). With Single_Segment
    # set, FCS is present even at code 0 (1 byte).
    if n < 256:
        out += bytes([0x20]) + struct.pack("<B", n)
    elif n <= 65535 + 256:
        out += bytes([0x60]) + struct.pack("<H", n - 256)
    elif n < (1 << 32):
        out += bytes([0xA0]) + struct.pack("<I", n)
    else:  # pragma: no cover - a CH wire block never approaches 4 GiB
        out += bytes([0xE0]) + struct.pack("<Q", n)
    if n == 0:
        out += (1).to_bytes(3, "little")  # last=1, Raw, size 0
        return bytes(out)
    for i in range(0, n, _ZSTD_RAW_BLOCK_MAX):
        chunk = data[i:i + _ZSTD_RAW_BLOCK_MAX]
        last = 1 if i + _ZSTD_RAW_BLOCK_MAX >= n else 0
        # Block_Header (3B LE): bit0 last, bits1-2 type (0 = Raw),
        # bits3-23 size.
        out += (last | (len(chunk) << 3)).to_bytes(3, "little")
        out += chunk
    return bytes(out)


def _zstd_decode_fallback(src: bytes, expected: int) -> bytes:
    """Raw/RLE-block subset decoder for when pyarrow is absent.
    Compressed (FSE/Huffman) blocks get a guided error."""
    out = bytearray()
    pos, n = 0, len(src)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("ZSTD frame truncated at magic")
        (magic,) = struct.unpack_from("<I", src, pos)
        pos += 4
        if (magic & 0xFFFFFFF0) == ZSTD_SKIPPABLE_LO:
            (skip,) = struct.unpack_from("<I", src, pos)
            pos += 4 + skip
            continue
        if magic != ZSTD_MAGIC:
            raise ValueError(f"not a ZSTD frame (magic {magic:#x})")
        fhd = src[pos]
        pos += 1
        single_segment = bool(fhd & 0x20)
        checksum = bool(fhd & 0x04)
        dict_id_code = fhd & 0x03
        fcs_code = fhd >> 6
        if not single_segment:
            pos += 1  # Window_Descriptor
        pos += (0, 1, 2, 4)[dict_id_code]
        fcs_size = (
            (1 if single_segment else 0, 2, 4, 8)[fcs_code]
        )
        pos += fcs_size  # content size is advisory; we track actual
        while True:
            if pos + 3 > n:
                raise ValueError("ZSTD frame truncated at block header")
            hdr = int.from_bytes(src[pos:pos + 3], "little")
            pos += 3
            last, btype, bsize = hdr & 1, (hdr >> 1) & 3, hdr >> 3
            # Bomb guard IN the loop (mirrors lz4_decompress): an RLE
            # block turns 4 header bytes into up to ~2 MiB of output,
            # so a size-capped payload could otherwise allocate far
            # past the declared size before the final check fires.
            if btype in (0, 1) and len(out) + bsize > expected:
                raise ValueError(
                    f"ZSTD frame decodes past the declared "
                    f"{expected} bytes"
                )
            if btype == 0:  # Raw
                out += src[pos:pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE: one byte repeated bsize times
                out += src[pos:pos + 1] * bsize
                pos += 1
            elif btype == 2:
                raise ValueError(
                    "ZSTD compressed (FSE/Huffman) blocks need the "
                    "pyarrow codec, which is unavailable in this "
                    "build; connect with LZ4 or compression disabled"
                )
            else:
                raise ValueError("ZSTD reserved block type")
            if last:
                break
        if checksum:
            pos += 4  # xxh64 low 32 bits; size-checked below instead
    if len(out) != expected:
        raise ValueError(
            f"ZSTD frame decoded to {len(out)} bytes, CH frame header "
            f"declared {expected}"
        )
    return bytes(out)


def zstd_compress(data: bytes) -> bytes:
    codec = _zstd_codec()
    if codec is not None:
        return bytes(codec.compress(data))
    return zstd_raw_frame(data)  # pragma: no cover - pyarrow present


def zstd_decompress(src: bytes, uncompressed_size: int) -> bytes:
    codec = _zstd_codec()
    if codec is not None:
        try:
            return bytes(codec.decompress(src, uncompressed_size))
        except Exception as e:
            raise ValueError(f"ZSTD frame decode failed: {e}") from e
    return _zstd_decode_fallback(  # pragma: no cover
        src, uncompressed_size
    )


def compress_frame(data: bytes, method: int = METHOD_LZ4) -> bytes:
    """data → one checksummed CH frame (callers split at MAX_BLOCK)."""
    if method == METHOD_LZ4:
        payload = lz4_compress(data)
        if len(payload) >= len(data):
            # Incompressible: still a valid LZ4 literals-only block.
            payload = _lz4_literal_run(data)
    elif method == METHOD_ZSTD:
        payload = zstd_compress(data)
    elif method == METHOD_NONE:
        payload = data
    else:
        raise ValueError(
            f"unsupported compression method 0x{method:02x}; this "
            "server emits LZ4 (0x82), ZSTD (0x90) or None (0x02)"
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
        return zstd_decompress(frame_body, uncompressed_size)
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
    if not 0 <= uncompressed_size <= MAX_UNCOMPRESSED_FRAME:
        # The declared size is attacker-controlled and drives the
        # decoder's output allocation (zstd especially: a ~100-byte
        # RLE-ish payload can legally expand to the full int32 range)
        # — bound it BEFORE decoding, like every other wire cap.
        raise ValueError(
            f"frame declares {uncompressed_size} uncompressed bytes, "
            f"above the {MAX_UNCOMPRESSED_FRAME} per-frame cap "
            "(clients send <= max_compress_block_size, 1 MiB default)"
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
