"""MySQL wire-protocol endpoint tests via a raw-socket 4.1 client."""

from __future__ import annotations

import socket
import struct

import pytest

from bighouse_spark.engine import BigHouseEngine
from bighouse_spark.mysqlwire import MySQLWireServer


class MyClient:
    def __init__(self, host: str, port: int):
        self.sock = socket.create_connection((host, port), timeout=30)
        self.seq = 0
        handshake = self._recv()
        assert handshake[0] == 10  # protocol version
        assert b"BigHouseSpark" in handshake
        # HandshakeResponse41: caps, max packet, charset, 23 zeros,
        # user, empty auth response.
        body = (
            struct.pack("<I", 0x0200)
            + struct.pack("<I", 1 << 24)
            + bytes([0x21])
            + b"\x00" * 23
            + b"tester\x00"
            + b"\x00"
        )
        self._send(body)
        ok = self._recv()
        assert ok[0] == 0x00

    def _send(self, payload: bytes) -> None:
        self.sock.sendall(
            struct.pack("<I", len(payload))[:3]
            + bytes([self.seq & 0xFF])
            + payload
        )
        self.seq += 1

    def _recv(self) -> bytes:
        head = self._exact(4)
        length = int.from_bytes(head[:3], "little")
        self.seq = (head[3] + 1) & 0xFF
        return self._exact(length)

    def _exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            assert chunk, "connection closed"
            buf += chunk
        return buf

    @staticmethod
    def _lenenc(buf: bytes, off: int):
        b0 = buf[off]
        if b0 < 0xFB:
            return b0, off + 1
        if b0 == 0xFC:
            return int.from_bytes(buf[off + 1:off + 3], "little"), off + 3
        if b0 == 0xFD:
            return int.from_bytes(buf[off + 1:off + 4], "little"), off + 4
        return int.from_bytes(buf[off + 1:off + 9], "little"), off + 9

    def query(self, sql: str):
        self.seq = 0
        self._send(b"\x03" + sql.encode())
        first = self._recv()
        if first[0] == 0xFF:
            code = struct.unpack("<H", first[1:3])[0]
            return None, None, (code, first[9:].decode(errors="replace"))
        ncols, _ = self._lenenc(first, 0)
        cols = []
        for _ in range(ncols):
            pkt = self._recv()
            off = 0
            vals = []
            for _ in range(6):  # catalog..org_name
                ln, off = self._lenenc(pkt, off)
                vals.append(pkt[off:off + ln])
                off += ln
            cols.append(vals[4].decode())
        eof = self._recv()
        assert eof[0] == 0xFE
        rows = []
        while True:
            pkt = self._recv()
            if pkt[0] == 0xFE and len(pkt) < 9:
                break
            off, row = 0, []
            for _ in range(ncols):
                if pkt[off] == 0xFB:
                    row.append(None)
                    off += 1
                else:
                    ln, off = self._lenenc(pkt, off)
                    row.append(pkt[off:off + ln].decode())
                    off += ln
            rows.append(row)
        return cols, rows, None

    def ping(self) -> bool:
        self.seq = 0
        self._send(b"\x0e")
        return self._recv()[0] == 0x00

    def close(self) -> None:
        self.seq = 0
        self._send(b"\x01")
        self.sock.close()


@pytest.fixture(scope="module")
def my(spark):
    srv = MySQLWireServer(engine=BigHouseEngine(spark=spark)).start()
    yield srv
    srv.shutdown()


class TestMySQLWire:
    def test_handshake_ping_and_select(self, my):
        c = MyClient(my.host, my.port)
        try:
            assert c.ping()
            cols, rows, err = c.query(
                "SELECT number AS n, number + 1 AS m FROM numbers(3) "
                "ORDER BY n"
            )
            assert err is None
            assert cols == ["n", "m"]
            assert rows == [["0", "1"], ["1", "2"], ["2", "3"]]
        finally:
            c.close()

    def test_ch_dialect_and_null(self, my):
        c = MyClient(my.host, my.port)
        try:
            cols, rows, err = c.query(
                "SELECT uniq(x) AS u, NULL AS v FROM "
                "(SELECT number % 7 AS x FROM numbers(50))"
            )
            assert err is None
            assert cols == ["u", "v"]
            assert rows == [["7", None]]
        finally:
            c.close()

    def test_error_then_recovery(self, my):
        c = MyClient(my.host, my.port)
        try:
            _, _, err = c.query("SELEC nonsense")
            assert err is not None and err[0] == 1064
            cols, rows, err2 = c.query("SELECT 42 AS a")
            assert err2 is None and rows == [["42"]]
        finally:
            c.close()


class TestMySQLTyping:
    def test_null_first_row_types_from_schema(self, my):
        # Column type must come from the result schema, not row-0
        # sampling: NULL leading an Int64 column still types LONGLONG.
        c = MyClient(my.host, my.port)
        try:
            c.seq = 0
            c._send(
                b"\x03" + b"SELECT nullIf(number, 0) AS v FROM "
                b"numbers(3) ORDER BY number"
            )
            first = c._recv()
            assert first[0] != 0xFF
            ncols, _ = c._lenenc(first, 0)
            types = []
            for _ in range(ncols):
                pkt = c._recv()
                off = 0
                for _ in range(6):
                    ln, off = c._lenenc(pkt, off)
                    off += ln
                # fixed block: 0x0C marker, charset(2), length(4),
                # type(1), ...
                types.append(pkt[off + 7])
            assert types == [0x08]  # MYSQL_TYPE_LONGLONG
            # drain: EOF, rows, EOF
            eof = c._recv()
            assert eof[0] == 0xFE
            while True:
                pkt = c._recv()
                if pkt[0] == 0xFE and len(pkt) < 9:
                    break
        finally:
            c.close()
