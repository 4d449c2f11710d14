"""postgresql() / mysql() table functions — federated reads over the
package's own wire-protocol CLIENTS (sources/dbclients.py), tested
loopback against the package's own pgwire / mysqlwire SERVERS: client
and server are independent implementations of the two sides of the
same public protocol, so the pair cross-checks both (the same gate the
RowBinary/Native codecs use — no client wheels exist in this
container)."""

from __future__ import annotations

import pytest

from bighouse_spark.engine import BigHouseEngine
from bighouse_spark.mysqlwire import MySQLWireServer
from bighouse_spark.pgwire import PGWireServer


@pytest.fixture(scope="module")
def eng(spark):
    e = BigHouseEngine(spark=spark)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW dbc_src AS SELECT * FROM VALUES "
        "(1, 1.5, 'alpha', DATE'2024-01-05', "
        " TIMESTAMP'2024-01-05 10:30:00', true), "
        "(2, -2.25, 'beta', DATE'2023-12-31', "
        " TIMESTAMP'2023-12-31 23:59:59', false), "
        "(3, CAST(NULL AS DOUBLE), CAST(NULL AS STRING), "
        " CAST(NULL AS DATE), CAST(NULL AS TIMESTAMP), "
        " CAST(NULL AS BOOLEAN)) "
        "AS t(id, val, name, d, ts, ok)"
    )
    return e


@pytest.fixture(scope="module")
def pg(eng):
    srv = PGWireServer(engine=eng).start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def my(eng):
    srv = MySQLWireServer(engine=eng).start()
    yield srv
    srv.shutdown()


class TestPostgresqlTableFunction:
    def test_roundtrip_typed(self, eng, pg):
        r = eng.execute(
            f"SELECT * FROM postgresql('127.0.0.1:{pg.port}', "
            f"'default', 'dbc_src', 'u', 'p') ORDER BY id"
        )
        src = [
            list(row)
            for row in eng.spark.table("dbc_src")
            .orderBy("id")
            .collect()
        ]
        assert r.cols == ["id", "val", "name", "d", "ts", "ok"]
        assert r.rows == src  # ints stay int, dates stay date, ...

    def test_filter_and_agg_over_fetch(self, eng, pg):
        r = eng.execute(
            f"SELECT count() AS n, sum(id) AS s FROM "
            f"postgresql('127.0.0.1:{pg.port}', 'default', "
            f"'dbc_src', 'u', 'p') WHERE val IS NOT NULL"
        )
        assert r.rows == [[2, 3]]

    def test_remote_error_propagates(self, eng, pg):
        with pytest.raises(ValueError, match="postgresql"):
            eng.execute(
                f"SELECT * FROM postgresql('127.0.0.1:{pg.port}', "
                f"'default', 'no_such_tbl_xyz', 'u', 'p')"
            )

    def test_arity_guard(self, eng, pg):
        with pytest.raises(ValueError, match="needs"):
            eng.execute(
                f"SELECT * FROM postgresql('127.0.0.1:{pg.port}', "
                f"'default', 'dbc_src')"
            )

    def test_row_cap(self, eng, pg, monkeypatch):
        from bighouse_spark.sources import dbclients

        monkeypatch.setattr(dbclients, "ROW_CAP", 2)
        with pytest.raises(ValueError, match="row single-connection cap"):
            eng.execute(
                f"SELECT * FROM postgresql('127.0.0.1:{pg.port}', "
                f"'default', 'dbc_src', 'u', 'p')"
            )


class TestMysqlTableFunction:
    def test_roundtrip_typed(self, eng, my):
        r = eng.execute(
            f"SELECT * FROM mysql('127.0.0.1:{my.port}', "
            f"'default', 'dbc_src', 'u', 'p') ORDER BY id"
        )
        # MySQL text protocol has no boolean type — our server sends
        # honest typed columns; booleans arrive as the server renders
        # them. Everything else must round-trip typed.
        assert r.cols == ["id", "val", "name", "d", "ts", "ok"]
        assert [row[:5] for row in r.rows] == [
            [1, 1.5, "alpha", __import__("datetime").date(2024, 1, 5),
             __import__("datetime").datetime(2024, 1, 5, 10, 30)],
            [2, -2.25, "beta",
             __import__("datetime").date(2023, 12, 31),
             __import__("datetime").datetime(2023, 12, 31, 23, 59, 59)],
            [3, None, None, None, None],
        ]

    def test_agg_over_fetch(self, eng, my):
        r = eng.execute(
            f"SELECT count() AS n FROM mysql('127.0.0.1:{my.port}', "
            f"'default', 'dbc_src', 'u', 'p') WHERE name = 'alpha'"
        )
        assert r.rows == [[1]]

    def test_remote_error_propagates(self, eng, my):
        with pytest.raises(ValueError, match="mysql"):
            eng.execute(
                f"SELECT * FROM mysql('127.0.0.1:{my.port}', "
                f"'default', 'no_such_tbl_xyz', 'u', 'p')"
            )

    def test_reserved_word_table_quoted(self, eng, my):
        # The client always backtick-quotes the remote table name —
        # a table named `order` must read, not syntax-error.
        eng.spark.sql(
            "CREATE OR REPLACE TEMP VIEW `order` AS SELECT 7 AS a"
        )
        r = eng.execute(
            f"SELECT * FROM mysql('127.0.0.1:{my.port}', "
            f"'default', 'order', 'u', 'p')"
        )
        assert r.rows == [[7]]


class TestPGAuth:
    """Auth handshakes, client vs server: both sides are this
    package's own from-scratch implementations of the public PG
    protocol (RFC 5802/7677 for SCRAM-SHA-256), so a green loopback
    round-trip cross-checks the pair. Trust mode stays the default."""

    def _fetch(self, srv, user="u", pw="sekrit"):
        from bighouse_spark.sources.dbclients import pg_fetch

        return pg_fetch(
            "127.0.0.1", srv.port, "default", user, pw,
            "SELECT id, name FROM dbc_src ORDER BY id",
        )

    @pytest.fixture(scope="class", params=["password", "md5", "scram-sha-256"])
    def authed(self, request, eng):
        srv = PGWireServer(
            engine=eng, auth=(request.param, "u", "sekrit")
        ).start()
        yield srv
        srv.shutdown()

    def test_roundtrip(self, authed):
        names, kinds, rows = self._fetch(authed)
        assert names == ["id", "name"]
        assert [r[0] for r in rows] == [1, 2, 3]

    def test_wrong_password_rejected(self, authed):
        with pytest.raises(ValueError, match="authentication failed"):
            self._fetch(authed, pw="wrong")

    def test_wrong_user_rejected(self, authed):
        with pytest.raises(ValueError, match="authentication failed"):
            self._fetch(authed, user="mallory")

    def test_wrong_user_gets_password_challenge(self, authed):
        """No username-existence oracle: an unknown user must receive
        the same password challenge shape as the configured user (the
        doomed exchange then fails) — never an instant error."""
        import socket
        import struct

        body = (
            struct.pack("!I", 196608)
            + b"user\x00mallory\x00database\x00default\x00\x00"
        )
        with socket.create_connection(("127.0.0.1", authed.port)) as s:
            s.sendall(struct.pack("!I", len(body) + 4) + body)
            head = s.recv(5)
            assert head[0:1] == b"R", (
                "expected an authentication request, got "
                f"{head[0:1]!r} (instant rejection leaks that the "
                "username is unknown)"
            )
            (ln,) = struct.unpack("!I", head[1:5])
            (code,) = struct.unpack("!I", s.recv(ln - 4)[:4])
            assert code in (3, 5, 10)  # cleartext / md5 / SASL

    def test_malformed_sasl_payload_gets_auth_error(self, eng):
        """Untrusted SASL bytes that don't parse must answer 28P01,
        not drop the connection with a server-side traceback."""
        import socket
        import struct

        srv = PGWireServer(
            engine=eng, auth=("scram-sha-256", "u", "sekrit")
        ).start()
        try:
            body = (
                struct.pack("!I", 196608)
                + b"user\x00u\x00database\x00default\x00\x00"
            )
            for evil in (
                # no NUL mechanism terminator / truncated length
                b"junk",
                # valid mechanism, garbage client-first (no attrs)
                b"SCRAM-SHA-256\x00" + struct.pack("!I", 4) + b"n,,x",
            ):
                with socket.create_connection(
                    ("127.0.0.1", srv.port)
                ) as s:
                    s.sendall(struct.pack("!I", len(body) + 4) + body)
                    head = s.recv(5)
                    assert head[0:1] == b"R"  # SASL mechanisms offer
                    (ln,) = struct.unpack("!I", head[1:5])
                    s.recv(ln - 4)
                    s.sendall(
                        b"p" + struct.pack("!I", len(evil) + 4) + evil
                    )
                    head = s.recv(5)
                    assert head[0:1] == b"E", (
                        f"expected ErrorResponse for {evil!r}, got "
                        f"{head[0:1]!r}"
                    )
                    (ln,) = struct.unpack("!I", head[1:5])
                    err = s.recv(ln - 4)
                    assert b"28P01" in err
        finally:
            srv.shutdown()

    def test_table_function_through_scram(self, eng):
        srv = PGWireServer(
            engine=eng, auth=("scram-sha-256", "u", "sekrit")
        ).start()
        try:
            r = eng.execute(
                f"SELECT count() AS n FROM postgresql("
                f"'127.0.0.1:{srv.port}', 'default', 'dbc_src', "
                f"'u', 'sekrit')"
            )
            assert r.rows == [[3]]
        finally:
            srv.shutdown()

    def test_unknown_auth_mode_rejected(self, eng):
        with pytest.raises(ValueError, match="auth mode"):
            PGWireServer(engine=eng, auth=("kerberos", "u", "p"))

    def test_spoofed_server_signature_rejected(self):
        """A malicious server that accepts any proof but cannot
        compute the RFC 5802 server signature must be rejected by the
        client BEFORE any query is sent."""
        import base64
        import socket
        import struct
        import threading

        def cstr_parts(b):
            return b.split(b"\x00")

        def msg(tag, payload):
            return tag + struct.pack("!I", len(payload) + 4) + payload

        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]

        def evil():
            conn, _ = srv.accept()
            with conn:
                head = conn.recv(4)
                (ln,) = struct.unpack("!I", head)
                conn.recv(ln - 4)  # startup body
                conn.sendall(
                    msg(b"R", struct.pack("!I", 10)
                        + b"SCRAM-SHA-256\x00\x00")
                )
                h = conn.recv(5)
                (ln,) = struct.unpack("!I", h[1:5])
                body = conn.recv(ln - 4)
                nul = body.index(b"\x00")
                (clen,) = struct.unpack("!I", body[nul + 1:nul + 5])
                cf = body[nul + 5:nul + 5 + clen].decode()
                cnonce = dict(
                    kv.split("=", 1) for kv in cf[3:].split(",")
                )["r"]
                sf = (
                    f"r={cnonce}XYZ,"
                    f"s={base64.b64encode(b'0123456789abcdef').decode()},"
                    "i=4096"
                )
                conn.sendall(
                    msg(b"R", struct.pack("!I", 11) + sf.encode())
                )
                conn.recv(4096)  # client-final; accept blindly
                conn.sendall(
                    msg(b"R", struct.pack("!I", 12)
                        + b"v=" + base64.b64encode(b"not-the-sig")))
                conn.sendall(msg(b"R", struct.pack("!I", 0)))
                conn.sendall(msg(b"Z", b"I"))

        t = threading.Thread(target=evil, daemon=True)
        t.start()
        try:
            from bighouse_spark.sources.dbclients import pg_fetch

            with pytest.raises(ValueError, match="server signature"):
                pg_fetch(
                    "127.0.0.1", port, "default", "u", "sekrit",
                    "SELECT 1 AS x",
                )
        finally:
            srv.close()


class TestMySQLAuth:
    """mysql_native_password verification: the server-side scramble
    check (mysqlwire) and the client-side scramble construction
    (dbclients) are independent implementations — a green loopback
    round-trip cross-checks both. Trust stays the default."""

    @pytest.fixture(scope="class")
    def authed(self, eng):
        srv = MySQLWireServer(
            engine=eng, auth=("u", "sekrit")
        ).start()
        yield srv
        srv.shutdown()

    def _fetch(self, srv, user="u", pw="sekrit"):
        from bighouse_spark.sources.dbclients import mysql_fetch

        return mysql_fetch(
            "127.0.0.1", srv.port, "default", user, pw,
            "SELECT id FROM dbc_src ORDER BY id",
        )

    def test_roundtrip(self, authed):
        names, kinds, rows = self._fetch(authed)
        assert [r[0] for r in rows] == [1, 2, 3]

    def test_wrong_password_rejected(self, authed):
        with pytest.raises(ValueError, match="Access denied"):
            self._fetch(authed, pw="wrong")

    def test_wrong_user_rejected(self, authed):
        with pytest.raises(ValueError, match="Access denied"):
            self._fetch(authed, user="mallory")

    def test_empty_password_mode(self, eng):
        srv = MySQLWireServer(engine=eng, auth=("u", "")).start()
        try:
            names, kinds, rows = self._fetch(srv, pw="")
            assert len(rows) == 3
            with pytest.raises(ValueError, match="Access denied"):
                self._fetch(srv, pw="nonempty")
        finally:
            srv.shutdown()

    def test_table_function_through_auth(self, eng, authed):
        r = eng.execute(
            f"SELECT count() AS n FROM mysql("
            f"'127.0.0.1:{authed.port}', 'default', 'dbc_src', "
            f"'u', 'sekrit')"
        )
        assert r.rows == [[3]]

    def test_nonce_varies_per_connection(self, authed):
        import socket
        import struct as st

        def read_nonce():
            s = socket.create_connection(("127.0.0.1", authed.port))
            try:
                head = s.recv(4)
                ln = head[0] | (head[1] << 8) | (head[2] << 16)
                pkt = b""
                while len(pkt) < ln:
                    pkt += s.recv(ln - len(pkt))
                off = pkt.index(b"\x00", 1) + 1 + 4
                part1 = pkt[off:off + 8]
                return part1
            finally:
                s.close()

        assert read_nonce() != read_nonce()
