"""MySQL wire-protocol (client/server protocol 4.1, text resultsets)
endpoint over ``BigHouseEngine`` — the ``mysql_port 9004`` half of the
reference's compatibility surface (``ch/config.xml:138``; the PG half
is ``bighouse_spark.pgwire``). ClickHouse's MySQL endpoint executes
ClickHouse SQL over MySQL framing; same here: every ``COM_QUERY``
routes through ``BigHouseEngine.execute``.

Protocol scope:

* Initial Handshake v10 advertising ``CLIENT_PROTOCOL_41``; any
  credentials accepted (trust, like the PG endpoint — auth is the
  deployment's concern, the reference's CH node is open inside the
  private network).
* ``COM_QUERY`` → column-count, ColumnDefinition41 packets, EOF,
  text rows (length-encoded; NULL = 0xFB), EOF. Errors → ERR packet
  (code 1064) with the engine's message; the connection survives.
* ``COM_PING``/``COM_INIT_DB`` → OK; ``COM_QUIT`` closes; anything
  else → ERR 1047 (unknown command), connection survives.

All values render as text with honest column *types* (LONGLONG,
DOUBLE, DATE, DATETIME, VAR_STRING) so clients coerce correctly.
"""

from __future__ import annotations

import socketserver
import struct
import threading
from datetime import date, datetime
from decimal import Decimal
from typing import Any

from bighouse_spark.engine import BigHouseEngine, QueryRequest
from bighouse_spark.formats import ch_base_type

_CLIENT_PROTOCOL_41 = 0x0200
_CLIENT_PLUGIN_AUTH = 0x80000

_TYPE_TINY = 0x01
_TYPE_SHORT = 0x02
_TYPE_LONG = 0x03
_TYPE_FLOAT = 0x04
_TYPE_LONGLONG = 0x08
_TYPE_DOUBLE = 0x05
_TYPE_NEWDECIMAL = 0xF6
_TYPE_DATE = 0x0A
_TYPE_DATETIME = 0x0C
_TYPE_VAR_STRING = 0xFD

# Result-schema (ClickHouse-spelled) type → MySQL column type; the
# primary typing path (schema-derived, NULL-proof). Value sampling
# remains only for schema-less results (DDL acks).
_CH_MYSQL_TYPES = {
    "Bool": _TYPE_TINY,
    "Int8": _TYPE_TINY,
    "Int16": _TYPE_SHORT,
    "Int32": _TYPE_LONG,
    "Int64": _TYPE_LONGLONG,
    "Float32": _TYPE_FLOAT,
    "Float64": _TYPE_DOUBLE,
    "Decimal": _TYPE_NEWDECIMAL,
    "Date": _TYPE_DATE,
    "DateTime": _TYPE_DATETIME,
    "DateTime64": _TYPE_DATETIME,
    "String": _TYPE_VAR_STRING,
}


def _mysql_type_for(ch_type: str) -> int:
    return _CH_MYSQL_TYPES.get(ch_base_type(ch_type), _TYPE_VAR_STRING)


def _mysql_type(value: Any) -> int:
    if isinstance(value, bool):
        return _TYPE_LONGLONG
    if isinstance(value, int):
        return _TYPE_LONGLONG
    if isinstance(value, float):
        return _TYPE_DOUBLE
    if isinstance(value, Decimal):
        return _TYPE_NEWDECIMAL
    if isinstance(value, datetime):
        return _TYPE_DATETIME
    if isinstance(value, date):
        return _TYPE_DATE
    return _TYPE_VAR_STRING


def _render(value: Any) -> bytes | None:
    if value is None:
        return None
    if isinstance(value, bool):
        return b"1" if value else b"0"
    if isinstance(value, bytes):
        return value.hex().encode()
    if isinstance(value, datetime):
        return value.isoformat(sep=" ").encode()
    if isinstance(value, (list, dict)):
        import json

        return json.dumps(value, default=str).encode()
    return str(value).encode()


def _lenenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _lenenc_str(b: bytes) -> bytes:
    return _lenenc(len(b)) + b


class _Conn:
    """Packet framing: 3-byte little-endian length + sequence id."""

    def __init__(self, sock):
        self.sock = sock
        self.seq = 0

    def send(self, payload: bytes) -> None:
        # A payload can legally exceed 0xFFFFFF; engine results are
        # driver-bounded rows, so single-frame is fine here.
        self.sock.sendall(
            struct.pack("<I", len(payload))[:3]
            + bytes([self.seq & 0xFF])
            + payload
        )
        self.seq += 1

    def recv(self) -> bytes | None:
        head = self._exact(4)
        if head is None:
            return None
        length = int.from_bytes(head[:3], "little")
        self.seq = (head[3] + 1) & 0xFF
        return self._exact(length)

    def _exact(self, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf


class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:
        conn = _Conn(self.request)
        try:
            self._handshake(conn)
            if conn.recv() is None:  # HandshakeResponse41 — trust all
                return
            self._send_ok(conn)
            while True:
                conn.seq = 0
                pkt = conn.recv()
                # Empty packet: treat like a clean close (indexing
                # pkt[0] on b"" would kill the handler thread).
                if not pkt or pkt[0] == 0x01:  # COM_QUIT
                    return
                cmd, arg = pkt[0], pkt[1:]
                if cmd == 0x03:  # COM_QUERY
                    self._query(conn, arg.decode(errors="replace"))
                elif cmd in (0x0E, 0x02):  # COM_PING / COM_INIT_DB
                    self._send_ok(conn)
                else:
                    self._send_err(conn, 1047, f"unknown command {cmd:#x}")
        except (ConnectionError, BrokenPipeError, OSError):
            pass

    def _handshake(self, conn: _Conn) -> None:
        caps = _CLIENT_PROTOCOL_41 | _CLIENT_PLUGIN_AUTH
        payload = (
            bytes([10])
            + b"8.0.0-BigHouseSpark\x00"
            + struct.pack("<I", threading.get_ident() & 0x7FFFFFFF)
            + b"12345678\x00"  # auth-plugin-data part 1 + filler
            + struct.pack("<H", caps & 0xFFFF)
            + bytes([0x21])  # charset utf8_general_ci
            + struct.pack("<H", 0x0002)  # status: autocommit
            + struct.pack("<H", (caps >> 16) & 0xFFFF)
            + bytes([21])  # auth data total length
            + b"\x00" * 10
            + b"901234567890\x00"  # part 2 (13 bytes incl NUL)
            + b"mysql_native_password\x00"
        )
        conn.send(payload)

    def _query(self, conn: _Conn, sql: str) -> None:
        sql = sql.strip().rstrip(";")
        if not sql:
            self._send_ok(conn)
            return
        try:
            result = self.server.engine.execute(  # type: ignore[attr-defined]
                QueryRequest(query=sql, remote=True)
            )
        except Exception as e:
            self._send_err(conn, 1064, str(e)[:1500])
            return
        if result.types:
            col_types = [_mysql_type_for(t) for t in result.types]
        else:
            sample = (
                result.rows[0] if result.rows else [None] * len(result.cols)
            )
            col_types = [_mysql_type(v) for v in sample]
        conn.send(_lenenc(len(result.cols)))
        for name, mtype in zip(result.cols, col_types):
            nb = name.encode()
            conn.send(
                _lenenc_str(b"def")        # catalog
                + _lenenc_str(b"")          # schema
                + _lenenc_str(b"")          # table
                + _lenenc_str(b"")          # org_table
                + _lenenc_str(nb)           # name
                + _lenenc_str(nb)           # org_name
                + bytes([0x0C])             # fixed-length fields marker
                + struct.pack("<H", 0x21)   # charset
                + struct.pack("<I", 1 << 16)  # column length
                + bytes([mtype])
                + struct.pack("<H", 0)      # flags
                + bytes([0x1F])             # decimals
                + b"\x00\x00"
            )
        self._send_eof(conn)
        for row in result.rows:
            body = b""
            for v in row:
                data = _render(v)
                body += b"\xfb" if data is None else _lenenc_str(data)
            conn.send(body)
        self._send_eof(conn)

    def _send_ok(self, conn: _Conn) -> None:
        conn.send(b"\x00" + _lenenc(0) + _lenenc(0)
                  + struct.pack("<H", 0x0002) + struct.pack("<H", 0))

    def _send_eof(self, conn: _Conn) -> None:
        conn.send(b"\xfe" + struct.pack("<H", 0) + struct.pack("<H", 0x0002))

    def _send_err(self, conn: _Conn, code: int, message: str) -> None:
        conn.send(
            b"\xff" + struct.pack("<H", code) + b"#42000"
            + message.encode()[:1500]
        )


class MySQLWireServer:
    """Threaded MySQL-protocol listener bound to ``engine`` (same
    shape as ``PGWireServer``; ``port=0`` picks a free port)."""

    def __init__(
        self,
        engine: BigHouseEngine | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self.engine = engine or BigHouseEngine()

        outer = self

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True
            engine = outer.engine

        self._server = _Server((host, port), _Handler)
        self.host, self.port = self._server.server_address
        self._thread: threading.Thread | None = None

    def start(self) -> "MySQLWireServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()
