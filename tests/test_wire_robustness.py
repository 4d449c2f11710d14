"""Hostile-input robustness for all four wire endpoints.

Every listener reads length fields and framing bytes from untrusted
clients. These tests throw seeded garbage, truncated frames, and
hostile declared lengths at each port and assert two things: the
connection is dropped or answered with an error (never a hang past
the deadline), and the server still serves a well-formed request
afterwards — one bad client must not take the endpoint down.

The declared-length attacks pin the caps added for them:
``pgwire.MAX_MSG_LEN`` / ``MAX_STARTUP_LEN`` and
``chwire.MAX_WIRE_STR`` (MySQL frames are inherently capped by the
3-byte packet length).
"""

from __future__ import annotations

import random
import socket
import struct
import urllib.request

import pytest

from bighouse_spark.chwire import CHWireServer
from bighouse_spark.engine import BigHouseEngine
from bighouse_spark.mysqlwire import MySQLWireServer
from bighouse_spark.pgwire import PGWireServer
from bighouse_spark.server import start_in_background

IO_DEADLINE = 20.0  # generous; a hang would exceed it by design


@pytest.fixture(scope="module")
def engine(spark):
    return BigHouseEngine(spark=spark)


@pytest.fixture(scope="module")
def pg_srv(engine):
    srv = PGWireServer(engine=engine).start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def my_srv(engine):
    srv = MySQLWireServer(engine=engine).start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def ch_srv(engine):
    srv = CHWireServer(engine=engine).start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def http_srv(engine):
    srv, _t = start_in_background(engine=engine)
    yield srv
    srv.shutdown()


def _conn(host, port):
    s = socket.create_connection((host, port), timeout=IO_DEADLINE)
    s.settimeout(IO_DEADLINE)
    return s


def _drain(sock) -> bytes:
    """Read until the peer closes or the deadline trips; a timeout
    here IS the failure mode these tests exist to catch."""
    out = b""
    while True:
        try:
            chunk = sock.recv(65536)
        except TimeoutError:
            raise AssertionError(
                "server neither answered nor dropped the connection "
                f"within {IO_DEADLINE}s"
            ) from None
        except OSError:
            return out
        if not chunk:
            return out
        out += chunk
        if len(out) > 1 << 20:
            return out


def _pg_alive(srv) -> None:
    """A fresh well-formed PG startup + Query must still work."""
    s = _conn(srv.host, srv.port)
    try:
        params = b"user\x00t\x00database\x00t\x00\x00"
        body = struct.pack("!I", 196608) + params
        s.sendall(struct.pack("!I", len(body) + 4) + body)
        q = b"SELECT 1 AS one\x00"
        s.sendall(b"Q" + struct.pack("!I", len(q) + 4) + q)
        buf = b""
        while b"C\x00\x00\x00" not in buf and b"E\x00\x00\x00" not in buf:
            chunk = s.recv(65536)
            assert chunk, "server closed mid-reply"
            buf = (buf + chunk)[-262144:]
        assert b"SELECT 1" in buf or b"D\x00" in buf
    finally:
        s.close()


def _my_alive(srv) -> None:
    """A fresh MySQL connection must still get a server greeting."""
    s = _conn(srv.host, srv.port)
    try:
        head = s.recv(4)
        assert len(head) == 4
        length = int.from_bytes(head[:3], "little")
        payload = b""
        while len(payload) < length:
            chunk = s.recv(length - len(payload))
            assert chunk
            payload += chunk
        assert payload[0] == 10  # protocol version
    finally:
        s.close()


def _leb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _chs(b: bytes) -> bytes:
    return _leb(len(b)) + b


def _ch_alive(srv) -> None:
    """A fresh native-TCP Hello + Ping must still be answered."""
    s = _conn(srv.host, srv.port)
    try:
        hello = (
            _leb(0)  # client Hello
            + _chs(b"robustness")
            + _leb(1) + _leb(1) + _leb(54429)  # major, minor, revision
            + _chs(b"default") + _chs(b"default") + _chs(b"")
        )
        s.sendall(hello)
        buf = _recv_some(s)
        assert buf and buf[0] == 0  # server Hello
        s.sendall(_leb(4))  # Ping
        buf2 = _recv_some(s)
        assert buf2 and buf2[0] == 4  # Pong
    finally:
        s.close()


def _recv_some(sock) -> bytes:
    try:
        return sock.recv(65536)
    except TimeoutError:
        raise AssertionError(
            f"server did not answer within {IO_DEADLINE}s"
        ) from None


def _http_alive(srv) -> None:
    url = f"http://{srv.server_address[0]}:{srv.server_address[1]}/ping"
    with urllib.request.urlopen(url, timeout=IO_DEADLINE) as r:
        assert r.status == 200


class TestGarbageBytes:
    """Seeded random bytes: the server must drop or error, then keep
    serving well-formed clients."""

    def _blast(self, host, port, seed, rounds=8):
        rng = random.Random(seed)
        for _ in range(rounds):
            s = _conn(host, port)
            try:
                s.sendall(rng.randbytes(rng.randint(1, 4096)))
                try:
                    s.shutdown(socket.SHUT_WR)
                except OSError:
                    pass
                _drain(s)
            finally:
                s.close()

    def test_pg_garbage(self, pg_srv):
        self._blast(pg_srv.host, pg_srv.port, seed=1)
        _pg_alive(pg_srv)

    def test_mysql_garbage(self, my_srv):
        self._blast(my_srv.host, my_srv.port, seed=2)
        _my_alive(my_srv)

    def test_ch_garbage(self, ch_srv):
        self._blast(ch_srv.host, ch_srv.port, seed=3)
        _ch_alive(ch_srv)

    def test_http_garbage(self, http_srv):
        host, port = http_srv.server_address[:2]
        self._blast(host, port, seed=4)
        _http_alive(http_srv)


class TestTruncatedFrames:
    """Valid prefixes cut mid-frame, then an abrupt close: the
    handler thread must unwind, not crash or spin."""

    def test_pg_truncated_startup(self, pg_srv):
        s = _conn(pg_srv.host, pg_srv.port)
        try:
            # declares 200 bytes, sends 10, closes
            s.sendall(struct.pack("!II", 200, 196608) + b"user\x00t")
        finally:
            s.close()
        _pg_alive(pg_srv)

    def test_mysql_truncated_handshake_response(self, my_srv):
        s = _conn(my_srv.host, my_srv.port)
        try:
            s.recv(4096)  # greeting
            s.sendall(b"\x40\x00\x00\x01" + b"\x00" * 8)  # 64 declared, 8 sent
        finally:
            s.close()
        _my_alive(my_srv)

    def test_ch_truncated_hello(self, ch_srv):
        s = _conn(ch_srv.host, ch_srv.port)
        try:
            s.sendall(bytes([0]) + b"\x20abc")  # name declares 32 bytes
        finally:
            s.close()
        _ch_alive(ch_srv)


class TestHostileLengths:
    """Declared lengths far beyond any legitimate message must be
    rejected without the server trying to buffer them."""

    def test_pg_huge_startup_length(self, pg_srv):
        s = _conn(pg_srv.host, pg_srv.port)
        try:
            s.sendall(struct.pack("!II", 0xFFFFFFF0, 196608))
            assert _drain(s) == b""  # dropped, nothing buffered
        finally:
            s.close()
        _pg_alive(pg_srv)

    def test_pg_huge_message_length(self, pg_srv):
        s = _conn(pg_srv.host, pg_srv.port)
        try:
            params = b"user\x00t\x00\x00"
            body = struct.pack("!I", 196608) + params
            s.sendall(struct.pack("!I", len(body) + 4) + body)
            _recv_some(s)  # auth ok + ready
            s.sendall(b"Q" + struct.pack("!I", 0xFFFFFFF0))
            assert b"E" not in _drain(s)[:1]  # dropped, not buffered
        finally:
            s.close()
        _pg_alive(pg_srv)

    def test_pg_undersized_length(self, pg_srv):
        s = _conn(pg_srv.host, pg_srv.port)
        try:
            s.sendall(struct.pack("!II", 3, 196608))  # length < 8
            _drain(s)
        finally:
            s.close()
        _pg_alive(pg_srv)

    def test_pg_huge_password_length(self, engine):
        # Pre-auth DoS: a PasswordMessage declaring ~4 GiB must be
        # dropped before buffering (pgwire.MAX_AUTH_MSG_LEN), on a
        # server in password-auth mode — the one path the main-loop
        # MAX_MSG_LEN check does not cover.
        srv = PGWireServer(
            engine=engine, auth=("password", "u", "pw")
        ).start()
        try:
            s = _conn(srv.host, srv.port)
            try:
                params = b"user\x00u\x00\x00"
                body = struct.pack("!I", 196608) + params
                s.sendall(struct.pack("!I", len(body) + 4) + body)
                _recv_some(s)  # AuthenticationCleartextPassword
                s.sendall(b"p" + struct.pack("!I", 0xFFFFFFF0))
                _drain(s)  # dropped, never buffered — must not hang
            finally:
                s.close()
            # endpoint still authenticates a well-formed client
            s2 = _conn(srv.host, srv.port)
            try:
                s2.sendall(struct.pack("!I", len(body) + 4) + body)
                _recv_some(s2)
                pw = b"pw\x00"
                s2.sendall(b"p" + struct.pack("!I", len(pw) + 4) + pw)
                buf = _recv_some(s2)
                assert b"R" in buf  # AuthenticationOk
            finally:
                s2.close()
        finally:
            srv.shutdown()

    def test_ch_huge_string_varint(self, ch_srv):
        s = _conn(ch_srv.host, ch_srv.port)
        try:
            # client Hello whose name string declares ~2^49 bytes
            s.sendall(bytes([0]) + b"\xff\xff\xff\xff\xff\xff\x7f")
            _drain(s)  # exception frame or drop — must not hang
        finally:
            s.close()
        _ch_alive(ch_srv)


class TestHTTPBodyCaps:
    """Content-Length and gzip-inflation bounds on the CH HTTP
    endpoint."""

    def _url(self, srv, path="/"):
        h, p = srv.server_address[:2]
        return f"http://{h}:{p}{path}"

    def test_huge_content_length_rejected(self, http_srv):
        import urllib.error

        req = urllib.request.Request(
            self._url(http_srv, "/?query=SELECT+1"),
            data=b"x",
            method="POST",
        )
        req.add_header("Content-Length", str(1 << 40))
        try:
            urllib.request.urlopen(req, timeout=IO_DEADLINE)
            raise AssertionError("expected rejection")
        except urllib.error.HTTPError as e:
            assert e.code == 413
        except OSError:
            pass  # connection dropped mid-body is also acceptable

    def test_gzip_bomb_rejected(self, http_srv):
        import gzip
        import urllib.error

        from bighouse_spark.server import MAX_HTTP_BODY

        # ~300 MiB of zeros compresses to ~300 KiB
        bomb = gzip.compress(b"\x00" * (MAX_HTTP_BODY + 1024))
        assert len(bomb) < 1 << 20
        req = urllib.request.Request(
            self._url(http_srv, "/?query=SELECT+1"), data=bomb,
            method="POST",
        )
        req.add_header("Content-Encoding", "gzip")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=IO_DEADLINE)
        assert ei.value.code == 413

    def test_malformed_gzip_rejected(self, http_srv):
        import urllib.error

        req = urllib.request.Request(
            self._url(http_srv, "/?query=SELECT+1"),
            data=b"not gzip at all", method="POST",
        )
        req.add_header("Content-Encoding", "gzip")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=IO_DEADLINE)
        assert ei.value.code == 400

    def test_normal_gzip_insert_still_works(self, http_srv):
        import gzip

        body = gzip.compress(b"SELECT 41 + 1 AS v FORMAT JSONEachRow")
        req = urllib.request.Request(
            self._url(http_srv, "/"), data=body, method="POST",
        )
        req.add_header("Content-Encoding", "gzip")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert b'"v":42' in r.read().replace(b" ", b"")


class TestTruncatedGzipBody:
    def test_truncated_gzip_member_is_400(self, http_srv):
        import gzip
        import urllib.error

        whole = gzip.compress(b"SELECT 1")
        truncated = whole[:-4]  # cut mid-member -> EOFError path
        h, p = http_srv.server_address[:2]
        req = urllib.request.Request(
            f"http://{h}:{p}/?query=SELECT+1", data=truncated,
            method="POST",
        )
        req.add_header("Content-Encoding", "gzip")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=IO_DEADLINE)
        assert ei.value.code == 400
        assert b"malformed gzip" in ei.value.read()
