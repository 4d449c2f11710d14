"""Golden-bytes conformance corpus for the native TCP wire.

Real client wheels (clickhouse-driver / clickhouse-connect /
clickhouse-go) are not installable in this container (environment
contract: no installs), so the server cannot be driven by a client it
didn't write. This suite is the next-strongest pin: byte-exact
Hello / Query / Data / Progress / ProfileInfo / EndOfStream exchanges
hand-assembled from the PUBLIC protocol layout (the packet framing
every client implements; revision gates as documented in
``chwire.py``), frozen as hex.

Three independent guarantees:

1. The frozen CLIENT bytes are built here from the documented layout
   with no repo helpers — if the server misparses a conformant
   client, these fail.
2. The server's reply must equal the frozen SERVER bytes EXACTLY —
   any framing regression (field order, varint width, revision gate)
   breaks the comparison even if the repo's own client/decoder pair
   drifted in lockstep.
3. The frozen server bytes are re-parsed field-by-field by a minimal
   in-test reader asserting each documented field — so the freeze
   itself is checked against the public layout, not just against
   what the server happened to emit.

The golden exchanges are uncompressed: compressed frames embed this
repo's LZ4 encoder output, whose exact bytes may legitimately change
with the matcher (any valid LZ4 stream is conformant), so pinning
them would freeze an implementation detail rather than the protocol.
Compressed-path conformance lives in test_chwire / test_chcompress
(independent decoders).

Reference client path: ``temporal/workflow_query_executor.go:222-235``
(clickhouse-go against port 9000).
"""

from __future__ import annotations

import socket
import struct

import pytest

from bighouse_spark.chwire import CHWireServer
from bighouse_spark.engine import BigHouseEngine

# -- the corpus ------------------------------------------------------
# Client Hello: [0 varint][client name][ver major][ver minor]
# [protocol revision][database][user][password]
CLIENT_HELLO = bytes.fromhex(
    "000d676f6c64656e2d636c69656e7414039da9030764656661756c74"
    "0764656661756c7400"
)
# Server Hello: [0][server name][major][minor][revision]
# [timezone (rev>=54058)][display name (rev>=54372)][patch (rev>=54401)]
SERVER_HELLO = bytes.fromhex(
    "000e426967486f75736520537061726b17089da90303555443"
    "08626967686f75736500"
)
# Query packet: [1][query id][ClientInfo: kind=1, initial user/id/
# address, interface=TCP, os user, hostname, client name, ver, quota
# key (rev>=54060), patch (rev>=54401)][settings terminator ""]
# [stage=2 Complete][compression=0][query text], then the external-
# tables terminator: an empty Data block [2][table name ""][BlockInfo
# 01 00 02 ffffffff 00][0 cols][0 rows].
CLIENT_QUERY = bytes.fromhex(
    "0109676f6c64656e2d713101000009302e302e302e303a300106676f6c64656e"
    "0a676f6c64656e686f73740d676f6c64656e2d636c69656e7414039da9030000"
    "0002002253454c454354206e756d626572204153206e2046524f4d206e756d62"
    "6572732833290200010002ffffffff000000"
)
# Reply: header Data block (0 rows, schema only) + Data block (3×Int64)
# + Progress(rows=3, bytes=0, total=3, written 0/0)
# + ProfileInfo(rows=3, blocks=1, bytes=0, no LIMIT bookkeeping)
# + EndOfStream.
SERVER_QUERY_REPLY = bytes.fromhex(
    "0100010002ffffffff000100016e05496e743634"
    "0100010002ffffffff000103016e05496e743634"
    "000000000000000001000000000000000200000000000000"
    "0303000300000603010000000005"
)
CLIENT_PING = bytes.fromhex("04")
SERVER_PONG = bytes.fromhex("04")
# Hello with wrong credentials (server started with auth): Exception
# packet [2][int32 LE code 516]["DB::Exception"][message][stack ""]
# [nested 0x00], then the server closes.
BAD_AUTH_CLIENT = bytes.fromhex(
    "000d676f6c64656e2d636c69656e7414039da9030764656661756c74"
    "076d616c6c6f72790577726f6e67"
)
BAD_AUTH_REPLY = bytes.fromhex(
    "02040200000d44423a3a457863657074696f6e596d616c6c6f72793a2041"
    "757468656e7469636174696f6e206661696c65643a2070617373776f7264"
    "20697320696e636f72726563742c206f72207468657265206973206e6f20"
    "7573657220776974682073756368206e616d650000"
)
# Hello from a pre-54429 client (typed-binary settings): guided
# Exception code 102 at Hello, before any query parsing.
OLD_REV_CLIENT = bytes.fromhex(
    "000d676f6c64656e2d636c69656e741301aaa6030764656661756c7407"
    "64656661756c7400"
)
OLD_REV_REPLY = bytes.fromhex(
    "02660000000d44423a3a457863657074696f6e6c636c69656e742070726f"
    "746f636f6c207265766973696f6e203534303538206973206f6c64657220"
    "7468616e203534343239202873657474696e67732073657269616c697a65"
    "642061732074797065642062696e617279293b20757067726164652074686520"
    "636c69656e740000"
)


@pytest.fixture(scope="module")
def srv(spark):
    server = CHWireServer(engine=BigHouseEngine(spark)).start()
    yield server
    server.shutdown()


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, f"peer closed after {len(buf)}/{n} bytes"
        buf += chunk
    return buf


def _assert_no_trailing(sock: socket.socket) -> None:
    sock.settimeout(0.5)
    try:
        extra = sock.recv(4096)
    except TimeoutError:
        return
    assert not extra, f"unexpected trailing bytes: {extra.hex()}"


# -- a minimal independent reader over the FROZEN bytes --------------


class _R:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def varint(self) -> int:
        out = shift = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def string(self) -> str:
        n = self.varint()
        v = self.buf[self.pos:self.pos + n]
        self.pos += n
        return v.decode()

    def exact(self, n: int) -> bytes:
        v = self.buf[self.pos:self.pos + n]
        assert len(v) == n
        self.pos += n
        return v

    def block_info(self) -> None:
        assert self.exact(3) == b"\x01\x00\x02"
        (bucket,) = struct.unpack("<i", self.exact(4))
        assert bucket == -1
        assert self.exact(1) == b"\x00"

    def done(self) -> bool:
        return self.pos == len(self.buf)


def test_frozen_hello_parses_per_public_layout():
    r = _R(SERVER_HELLO)
    assert r.varint() == 0  # Hello packet
    assert r.string() == "BigHouse Spark"
    assert r.varint() == 23  # version major
    assert r.varint() == 8  # version minor
    assert r.varint() == 54429  # SETTINGS_SERIALIZED_AS_STRINGS
    assert r.string() == "UTC"  # rev >= 54058
    assert r.string() == "bighouse"  # display name, rev >= 54372
    assert r.varint() == 0  # version patch, rev >= 54401
    assert r.done()


def test_frozen_reply_parses_per_public_layout():
    r = _R(SERVER_QUERY_REPLY)
    # header block: schema, zero rows
    assert r.varint() == 1 and r.string() == ""
    r.block_info()
    assert (r.varint(), r.varint()) == (1, 0)
    assert r.string() == "n" and r.string() == "Int64"
    # data block: 3 Int64 values
    assert r.varint() == 1 and r.string() == ""
    r.block_info()
    assert (r.varint(), r.varint()) == (1, 3)
    assert r.string() == "n" and r.string() == "Int64"
    assert struct.unpack("<3q", r.exact(24)) == (0, 1, 2)
    # progress: rows, bytes, total rows, written rows/bytes
    assert r.varint() == 3
    assert [r.varint() for _ in range(5)] == [3, 0, 3, 0, 0]
    # profile info: rows, blocks, bytes, applied_limit,
    # rows_before_limit, calculated_rows_before_limit
    assert r.varint() == 6
    assert [r.varint() for _ in range(6)] == [3, 1, 0, 0, 0, 0]
    # end of stream
    assert r.varint() == 5
    assert r.done()


def test_hello_exchange_bytes_exact(srv):
    s = socket.create_connection((srv.host, srv.port), timeout=60)
    try:
        s.sendall(CLIENT_HELLO)
        assert _recv_exact(s, len(SERVER_HELLO)) == SERVER_HELLO
        _assert_no_trailing(s)
    finally:
        s.close()


def test_query_exchange_bytes_exact(srv):
    s = socket.create_connection((srv.host, srv.port), timeout=120)
    try:
        s.sendall(CLIENT_HELLO)
        _recv_exact(s, len(SERVER_HELLO))
        s.sendall(CLIENT_QUERY)
        s.settimeout(120)
        got = _recv_exact(s, len(SERVER_QUERY_REPLY))
        assert got == SERVER_QUERY_REPLY, (
            f"wire drift:\n got {got.hex()}\nwant "
            f"{SERVER_QUERY_REPLY.hex()}"
        )
        _assert_no_trailing(s)
        # the connection stays usable: ping/pong after a query
        s.sendall(CLIENT_PING)
        assert _recv_exact(s, 1) == SERVER_PONG
    finally:
        s.close()


def _parse_exception(buf: bytes, want_code: int) -> str:
    r = _R(buf)
    assert r.varint() == 2  # Exception packet
    (code,) = struct.unpack("<i", r.exact(4))
    assert code == want_code
    assert r.string() == "DB::Exception"
    msg = r.string()
    assert r.string() == ""  # stack trace
    assert r.exact(1) == b"\x00"  # no nested exception
    assert r.done()
    return msg


def test_frozen_exceptions_parse_per_public_layout():
    msg = _parse_exception(BAD_AUTH_REPLY, 516)
    assert msg.startswith("mallory: Authentication failed")
    msg2 = _parse_exception(OLD_REV_REPLY, 102)
    assert "54058" in msg2 and "54429" in msg2


def test_bad_auth_exchange_bytes_exact(spark):
    server = CHWireServer(
        engine=BigHouseEngine(spark), auth=("alice", "pw1")
    ).start()
    try:
        s = socket.create_connection(
            (server.host, server.port), timeout=60
        )
        try:
            s.sendall(BAD_AUTH_CLIENT)
            assert _recv_exact(s, len(BAD_AUTH_REPLY)) == BAD_AUTH_REPLY
        finally:
            s.close()
    finally:
        server.shutdown()


def test_old_revision_exchange_bytes_exact(srv):
    s = socket.create_connection((srv.host, srv.port), timeout=60)
    try:
        s.sendall(OLD_REV_CLIENT)
        assert _recv_exact(s, len(OLD_REV_REPLY)) == OLD_REV_REPLY
    finally:
        s.close()


def test_pong_bytes_exact(srv):
    s = socket.create_connection((srv.host, srv.port), timeout=60)
    try:
        s.sendall(CLIENT_HELLO)
        _recv_exact(s, len(SERVER_HELLO))
        s.sendall(CLIENT_PING)
        assert _recv_exact(s, 1) == SERVER_PONG
        _assert_no_trailing(s)
    finally:
        s.close()


# -- compressed path (round 9) ---------------------------------------
# The same golden Query, but with the compression flag set and the
# external-tables terminator block wrapped in HAND-ASSEMBLED frames:
# [16B CityHash128][method][4B LE compressed size incl 9B header]
# [4B LE uncompressed size][payload]. The LZ4 payload is a spec-built
# literals-only block (token 0xA0 = 10 literals, no sequences); the
# ZSTD payload is a spec-built RFC 8878 single-segment frame with one
# Raw block. Neither embeds repo encoder output, so these pin the
# server's DECODE path against the public layouts. (The 16-byte
# checksums were computed with CityHash128 v1.0.2, which the repo
# implements from scratch and pins bit-exact in test_cityhash.py's
# offline parity gate; the structural test below re-verifies them.)
CLIENT_QUERY_COMPRESSED = bytes.fromhex(
    "0109676f6c64656e2d713101000009302e302e302e303a300106676f6c64656e"
    "0a676f6c64656e686f73740d676f6c64656e2d636c69656e7414039da9030000"
    "0002012253454c454354206e756d626572204153206e2046524f4d206e756d62"
    "657273283329"
)
EMPTY_BLOCK_BODY = bytes.fromhex("010002ffffffff000000")
EXT_BLOCK_LZ4 = bytes.fromhex(
    "0200a783ac6cd55c7a7cb5ac46bddb86e21482140000000a000000a0"
    "010002ffffffff000000"
)
EXT_BLOCK_ZSTD = bytes.fromhex(
    "020090ced47c8d4e82f9aeb0fb84d3bc38d2901c0000000a00000028"
    "b52ffd200a510000010002ffffffff000000"
)


def test_frozen_compressed_frames_parse_per_public_layout():
    from bighouse_spark.functions.cityhash import cityhash128

    for blob, method in ((EXT_BLOCK_LZ4, 0x82), (EXT_BLOCK_ZSTD, 0x90)):
        r = _R(blob)
        assert r.varint() == 2 and r.string() == ""  # Data packet
        checksum = r.exact(16)
        rest = blob[r.pos:]
        lo, hi = struct.unpack("<QQ", checksum)
        assert cityhash128(rest) == (lo, hi)
        assert r.exact(1)[0] == method
        csize, usize = struct.unpack("<ii", r.exact(8))
        assert csize == 9 + len(blob) - r.pos
        assert usize == len(EMPTY_BLOCK_BODY)
        payload = r.exact(csize - 9)
        assert r.done()
        if method == 0x82:
            # LZ4 block format: one literals-only sequence
            assert payload[0] == len(EMPTY_BLOCK_BODY) << 4
            assert payload[1:] == EMPTY_BLOCK_BODY
        else:
            # RFC 8878: magic, FHD (single-segment, 1B FCS), FCS,
            # 3B block header (last=1, type=Raw, size), raw bytes
            assert payload[:4] == bytes.fromhex("28b52ffd")
            assert payload[4] == 0x20
            assert payload[5] == len(EMPTY_BLOCK_BODY)
            hdr = int.from_bytes(payload[6:9], "little")
            assert hdr & 1 == 1 and (hdr >> 1) & 3 == 0
            assert hdr >> 3 == len(EMPTY_BLOCK_BODY)
            assert payload[9:] == EMPTY_BLOCK_BODY


class _SockR:
    """Incremental packet reader over the live socket; Data-packet
    frames are decompressed with PYARROW's lz4 raw-block codec — an
    implementation independent of bighouse_spark.compress."""

    def __init__(self, sock: socket.socket) -> None:
        self.sock = sock

    def exact(self, n: int) -> bytes:
        return _recv_exact(self.sock, n)

    def varint(self) -> int:
        out = shift = 0
        while True:
            b = self.exact(1)[0]
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def string(self) -> bytes:
        n = self.varint()
        return self.exact(n)

    def frame_decompressed(self) -> bytes:
        import pyarrow as pa

        self.exact(16)  # checksum (the server side computes it)
        head = self.exact(9)
        method = head[0]
        csize, usize = struct.unpack("<ii", head[1:9])
        payload = self.exact(csize - 9)
        assert method == 0x82, f"expected LZ4 reply frames, {method:#x}"
        return pa.Codec("lz4_raw").decompress(
            payload, decompressed_size=usize
        ).to_pybytes()


def _varint_bytes(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _read_compressed_reply(s: socket.socket) -> bytes:
    """Read the server reply to a compression=1 query and rebuild the
    LOGICAL byte stream (Data-packet bodies decompressed in place);
    for a conformant server it must equal the frozen uncompressed
    reply byte-for-byte."""
    r = _SockR(s)
    logical = b""
    while True:
        ptype = r.varint()
        logical += _varint_bytes(ptype)
        if ptype == 1:  # Data: name + one compressed frame
            name = r.string()
            logical += _varint_bytes(len(name)) + name
            logical += r.frame_decompressed()
        elif ptype == 3:  # Progress: 5 varints at this revision
            for _ in range(5):
                logical += _varint_bytes(r.varint())
        elif ptype == 6:  # ProfileInfo: 6 varints
            for _ in range(6):
                logical += _varint_bytes(r.varint())
        elif ptype == 5:  # EndOfStream
            return logical
        else:
            raise AssertionError(f"unexpected packet type {ptype}")


@pytest.mark.parametrize(
    "ext_block", [EXT_BLOCK_LZ4, EXT_BLOCK_ZSTD],
    ids=["lz4_stored", "zstd_stored"],
)
def test_compressed_query_exchange_decodes_spec_frames(srv, ext_block):
    s = socket.create_connection((srv.host, srv.port), timeout=120)
    try:
        s.sendall(CLIENT_HELLO)
        _recv_exact(s, len(SERVER_HELLO))
        s.sendall(CLIENT_QUERY_COMPRESSED + ext_block)
        s.settimeout(120)
        logical = _read_compressed_reply(s)
        assert logical == SERVER_QUERY_REPLY, (
            f"logical reply drift:\n got {logical.hex()}\nwant "
            f"{SERVER_QUERY_REPLY.hex()}"
        )
        _assert_no_trailing(s)
        s.sendall(CLIENT_PING)
        assert _recv_exact(s, 1) == SERVER_PONG
    finally:
        s.close()


# -- multi-block INSERT (round 9) -------------------------------------
# The full native INSERT exchange, frozen: Query("INSERT INTO
# golden_ins (n) VALUES") + empty external block → server replies the
# SAMPLE block (schema, zero rows) → client streams TWO data blocks
# (1 row, then 2 rows — state must persist across blocks) → empty
# terminator → EndOfStream. Client bytes hand-assembled from the
# public layout (client Data packet type 2; Native column = name,
# type, little-endian values).
CLIENT_INSERT_QUERY = bytes.fromhex(
    "0109676f6c64656e2d693101000009302e302e302e303a300106676f6c64656e"
    "0a676f6c64656e686f73740d676f6c64656e2d636c69656e7414039da9030000"
    "00020021494e5345525420494e544f20676f6c64656e5f696e7320286e292056"
    "414c5545530200010002ffffffff000000"
)
CLIENT_INSERT_BLOCK1 = bytes.fromhex(
    "0200010002ffffffff000101016e05496e7436340700000000000000"
)
CLIENT_INSERT_BLOCK2 = bytes.fromhex(
    "0200010002ffffffff000102016e05496e743634"
    "08000000000000000900000000000000"
)
CLIENT_INSERT_TERM = bytes.fromhex("0200010002ffffffff000000")
SERVER_SAMPLE_BLOCK = bytes.fromhex(
    "0100010002ffffffff000100016e05496e743634"
)
SERVER_EOS = bytes.fromhex("05")


def test_frozen_insert_blocks_parse_per_public_layout():
    for blob, nrows, vals in (
        (CLIENT_INSERT_BLOCK1, 1, (7,)),
        (CLIENT_INSERT_BLOCK2, 2, (8, 9)),
    ):
        r = _R(blob)
        assert r.varint() == 2 and r.string() == ""  # client Data
        r.block_info()
        assert (r.varint(), r.varint()) == (1, nrows)
        assert r.string() == "n" and r.string() == "Int64"
        assert struct.unpack(f"<{nrows}q", r.exact(8 * nrows)) == vals
        assert r.done()
    r = _R(SERVER_SAMPLE_BLOCK)
    assert r.varint() == 1 and r.string() == ""
    r.block_info()
    assert (r.varint(), r.varint()) == (1, 0)
    assert r.string() == "n" and r.string() == "Int64"
    assert r.done()


def test_multiblock_insert_exchange_bytes_exact(srv):
    # the target table is engine state, not protocol — create it
    # through the server's own engine, outside the frozen pin
    srv.engine.execute(
        "CREATE OR REPLACE TABLE golden_ins (n Int64) ENGINE = Memory"
    )
    s = socket.create_connection((srv.host, srv.port), timeout=120)
    try:
        s.sendall(CLIENT_HELLO)
        _recv_exact(s, len(SERVER_HELLO))
        s.settimeout(120)
        s.sendall(CLIENT_INSERT_QUERY)
        got = _recv_exact(s, len(SERVER_SAMPLE_BLOCK))
        assert got == SERVER_SAMPLE_BLOCK, (
            f"sample-block drift: {got.hex()}"
        )
        s.sendall(
            CLIENT_INSERT_BLOCK1
            + CLIENT_INSERT_BLOCK2
            + CLIENT_INSERT_TERM
        )
        assert _recv_exact(s, len(SERVER_EOS)) == SERVER_EOS
        _assert_no_trailing(s)
        # the connection survives an INSERT
        s.sendall(CLIENT_PING)
        assert _recv_exact(s, 1) == SERVER_PONG
    finally:
        s.close()
    rows = srv.engine.execute(
        "SELECT CAST(sum(n) AS BIGINT) AS s, count() AS c "
        "FROM golden_ins"
    ).rows
    assert rows == [[24, 3]]
