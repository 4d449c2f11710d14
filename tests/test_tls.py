"""TLS across all four wire endpoints.

A per-module self-signed certificate (CN/SAN 127.0.0.1, generated
with the openssl CLI) drives:

* HTTPS on the HTTP endpoint (CH https_port model) — verified
  client context against the test CA, plain-HTTP rejection.
* Native TCP tcp_port_secure — TLS from the first byte, the raw
  CHClient over a wrapped socket, plaintext rejection.
* PG SSLRequest upgrade ('S' + handshake before StartupMessage) via
  ``pg_fetch(tls=True)``, incl. SCRAM auth over TLS; plaintext
  startups still accepted; 'N' answer from a TLS-less server.
* MySQL CLIENT_SSL upgrade via ``mysql_fetch(tls=True)``; plaintext
  clients still accepted against a TLS-capable server.
* Wrong trust root → certificate verification failure on every path.

The server and client TLS sides both live in this package but run
the stdlib ``ssl`` state machines against each other — the
negotiation logic under test (SSLRequest framing, CLIENT_SSL
capability flow, deferred HTTP handshakes) is ours.
"""

from __future__ import annotations

import json
import socket
import ssl
import subprocess
import threading
import urllib.error
import urllib.parse
import urllib.request

import pytest

from bighouse_spark.chwire import CHWireServer
from bighouse_spark.engine import BigHouseEngine
from bighouse_spark.mysqlwire import MySQLWireServer
from bighouse_spark.pgwire import PGWireServer
from bighouse_spark.server import make_server
from bighouse_spark.sources.dbclients import mysql_fetch, pg_fetch
from bighouse_spark.tlsutil import client_context, parse_tls_flag
from tests.conftest import SF_CORRECT
from tests.test_chwire import CHClient


def _gen_cert(dirpath, name: str = "server") -> tuple[str, str]:
    cert = str(dirpath / f"{name}.pem")
    key = str(dirpath / f"{name}.key")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", key, "-out", cert, "-days", "2", "-nodes",
            "-subj", "/CN=127.0.0.1",
            "-addext", "subjectAltName=IP:127.0.0.1",
        ],
        check=True, capture_output=True,
    )
    return cert, key


@pytest.fixture(scope="module")
def tls_pair(tmp_path_factory):
    return _gen_cert(tmp_path_factory.mktemp("tls"))


@pytest.fixture(scope="module")
def other_ca(tmp_path_factory):
    """A second, unrelated self-signed cert — the wrong trust root."""
    return _gen_cert(tmp_path_factory.mktemp("tls2"), "other")[0]


@pytest.fixture(scope="module")
def eng(spark):
    engine = BigHouseEngine(spark=spark)
    engine.attach_table("tls_nation", f"{SF_CORRECT}/nation.parquet")
    return engine


class TestHTTPS:
    @pytest.fixture(scope="class")
    def https_base(self, eng, tls_pair):
        srv = make_server(engine=eng, auth=None, tls=tls_pair)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"https://127.0.0.1:{srv.server_port}", tls_pair[0]
        srv.shutdown()

    def test_query_over_https(self, https_base):
        base, ca = https_base
        url = base + "/?query=" + urllib.parse.quote(
            "SELECT count() AS c FROM tls_nation FORMAT JSON"
        )
        with urllib.request.urlopen(
            url, context=client_context(ca)
        ) as r:
            body = json.load(r)
        assert body["data"][0]["c"] == 25

    def test_plain_http_rejected(self, https_base):
        base, _ = https_base
        url = base.replace("https://", "http://") + "/ping"
        with pytest.raises(Exception):
            urllib.request.urlopen(url, timeout=5)

    def test_wrong_trust_root_rejected(self, https_base, other_ca):
        base, _ = https_base
        with pytest.raises(urllib.error.URLError) as ei:
            urllib.request.urlopen(
                base + "/ping", context=client_context(other_ca)
            )
        assert isinstance(ei.value.reason, ssl.SSLCertVerificationError)


class TestNativeSecure:
    @pytest.fixture(scope="class")
    def secure_srv(self, eng, tls_pair):
        srv = CHWireServer(engine=eng, tls=tls_pair).start()
        yield srv, tls_pair[0]
        srv.shutdown()

    def _tls_client(self, srv, ca) -> CHClient:
        raw = socket.create_connection((srv.host, srv.port), timeout=30)
        wrapped = client_context(ca).wrap_socket(
            raw, server_hostname=srv.host
        )
        return CHClient(srv.host, srv.port, sock=wrapped)

    def test_hello_and_query_over_tls(self, secure_srv):
        srv, ca = secure_srv
        cli = self._tls_client(srv, ca)
        try:
            name, rev, _tz, _disp, _patch = cli.read_hello()
            assert "BigHouse" in name
            out = cli.query(
                "SELECT count() AS c FROM tls_nation"
            )
            assert out["rows"] == [[25]]
        finally:
            cli.close()

    def test_plaintext_client_rejected(self, secure_srv):
        srv, _ = secure_srv
        # A plaintext Hello against tcp_port_secure dies in the TLS
        # handshake — the server never answers with a Hello packet.
        cli = CHClient(srv.host, srv.port)
        cli.sock.settimeout(5)
        with pytest.raises(Exception):
            cli.read_hello()
        cli.close()

    def test_wrong_trust_root_rejected(self, secure_srv, other_ca):
        srv, _ = secure_srv
        raw = socket.create_connection((srv.host, srv.port), timeout=30)
        with pytest.raises(ssl.SSLCertVerificationError):
            client_context(other_ca).wrap_socket(
                raw, server_hostname=srv.host
            )
        raw.close()


class TestPGTLS:
    @pytest.fixture(scope="class")
    def pg_srv(self, eng, tls_pair):
        srv = PGWireServer(
            engine=eng, tls=tls_pair,
            auth=("scram-sha-256", "alice", "pw1"),
        ).start()
        yield srv, tls_pair[0]
        srv.shutdown()

    def test_scram_over_tls(self, pg_srv):
        srv, ca = pg_srv
        cols, _kinds, rows = pg_fetch(
            srv.host, srv.port, "default", "alice", "pw1",
            "SELECT count() AS c FROM tls_nation",
            tls=True, tls_ca=ca,
        )
        assert cols == ["c"] and rows == [[25]]

    def test_plaintext_startup_still_accepted(self, pg_srv):
        # PG's own default: a TLS-capable server still accepts
        # clients that skip SSLRequest.
        srv, _ = pg_srv
        _, _, rows = pg_fetch(
            srv.host, srv.port, "default", "alice", "pw1",
            "SELECT 1 AS one",
        )
        assert rows == [[1]]

    def test_tls_less_server_declines(self, eng):
        srv = PGWireServer(engine=eng).start()
        try:
            with pytest.raises(ValueError, match="declined TLS"):
                pg_fetch(
                    srv.host, srv.port, "default", "u", "p",
                    "SELECT 1 AS one", tls=True,
                )
        finally:
            srv.shutdown()

    def test_wrong_trust_root_rejected(self, pg_srv, other_ca):
        srv, _ = pg_srv
        with pytest.raises(ssl.SSLCertVerificationError):
            pg_fetch(
                srv.host, srv.port, "default", "alice", "pw1",
                "SELECT 1 AS one", tls=True, tls_ca=other_ca,
            )

    def test_table_function_tls_args(self, pg_srv, eng):
        # The SQL surface reaches the TLS client: a trailing
        # 'tls_ca=/path' argument upgrades the federated read.
        srv, ca = pg_srv
        r = eng.execute(
            f"SELECT count(*) AS c FROM postgresql("
            f"'{srv.host}:{srv.port}', 'default', 'tls_nation', "
            f"'alice', 'pw1', 'tls_ca={ca}')"
        )
        assert r.rows == [[25]]

    def test_table_function_bad_trailing_arg(self, pg_srv, eng):
        srv, _ = pg_srv
        with pytest.raises(Exception, match="unrecognized trailing"):
            eng.execute(
                f"SELECT * FROM mysql('{srv.host}:{srv.port}', 'd', "
                f"'t', 'u', 'p', 'bogus_option')"
            )

    # -- SCRAM-SHA-256-PLUS channel binding --------------------------

    @staticmethod
    def _tls_startup(srv, ca):
        """Connect, upgrade to TLS, send startup; return the socket
        positioned at the AuthenticationSASL mechanism list."""
        import struct

        sock = socket.create_connection((srv.host, srv.port), timeout=30)
        sock.sendall(struct.pack("!II", 8, 80877103))
        assert sock.recv(1) == b"S"
        sock = client_context(ca).wrap_socket(
            sock, server_hostname=srv.host
        )
        body = (
            struct.pack("!I", 196608)
            + b"user\x00alice\x00database\x00default\x00\x00"
        )
        sock.sendall(struct.pack("!I", len(body) + 4) + body)
        head = b""
        while len(head) < 5:
            head += sock.recv(5 - len(head))
        assert head[0:1] == b"R"
        (ln,) = struct.unpack("!I", head[1:5])
        payload = b""
        while len(payload) < ln - 4:
            payload += sock.recv(ln - 4 - len(payload))
        assert struct.unpack("!I", payload[:4])[0] == 10  # SASL
        return sock, payload[4:]

    @staticmethod
    def _sasl_initial(sock, mech: bytes, gs2_and_bare: bytes):
        import struct

        body = (
            mech + b"\x00"
            + struct.pack("!I", len(gs2_and_bare)) + gs2_and_bare
        )
        sock.sendall(
            b"p" + struct.pack("!I", len(body) + 4) + body
        )
        tag = sock.recv(1)
        return tag

    def test_plus_mechanism_offered_over_tls(self, pg_srv):
        srv, ca = pg_srv
        sock, mech_list = self._tls_startup(srv, ca)
        try:
            assert b"SCRAM-SHA-256-PLUS\x00" in mech_list
        finally:
            sock.close()

    def test_y_flag_downgrade_rejected(self, pg_srv):
        # RFC 5802: 'y' claims no -PLUS was offered; over TLS we DID
        # offer it, so the server must treat 'y' as a MITM stripping
        # the mechanism list and fail authentication.
        srv, ca = pg_srv
        sock, _ = self._tls_startup(srv, ca)
        try:
            tag = self._sasl_initial(
                sock, b"SCRAM-SHA-256", b"y,,n=,r=abcdef"
            )
            assert tag == b"E"  # ErrorResponse, not SASLContinue
        finally:
            sock.close()

    def test_wrong_cb_type_rejected(self, pg_srv):
        srv, ca = pg_srv
        sock, _ = self._tls_startup(srv, ca)
        try:
            tag = self._sasl_initial(
                sock, b"SCRAM-SHA-256-PLUS", b"p=tls-unique,,n=,r=ab"
            )
            assert tag == b"E"
        finally:
            sock.close()


class TestChannelBindingHash:
    def test_sha256_cert(self, tls_pair):
        import hashlib

        from bighouse_spark.tlsutil import cert_cb_hash, pem_cert_der

        der = pem_cert_der(tls_pair[0])
        # openssl default signs RSA certs with SHA-256 → the binding
        # is sha256(DER) per RFC 5929.
        assert cert_cb_hash(der) == hashlib.sha256(der).digest()

    def test_sha384_cert(self, tmp_path):
        import hashlib
        import subprocess as sp

        from bighouse_spark.tlsutil import cert_cb_hash, pem_cert_der

        cert = str(tmp_path / "c384.pem")
        key = str(tmp_path / "c384.key")
        sp.run(
            [
                "openssl", "req", "-x509", "-newkey", "rsa:2048",
                "-sha384", "-keyout", key, "-out", cert, "-days", "2",
                "-nodes", "-subj", "/CN=127.0.0.1",
            ],
            check=True, capture_output=True,
        )
        der = pem_cert_der(cert)
        assert cert_cb_hash(der) == hashlib.sha384(der).digest()


class TestMySQLTLS:
    @pytest.fixture(scope="class")
    def my_srv(self, eng, tls_pair):
        srv = MySQLWireServer(
            engine=eng, tls=tls_pair, auth=("bob", "sekret"),
        ).start()
        yield srv, tls_pair[0]
        srv.shutdown()

    def test_auth_and_query_over_tls(self, my_srv):
        srv, ca = my_srv
        cols, _kinds, rows = mysql_fetch(
            srv.host, srv.port, "", "bob", "sekret",
            "SELECT count() AS c FROM tls_nation",
            tls=True, tls_ca=ca,
        )
        assert cols == ["c"] and rows == [[25]]

    def test_plaintext_client_still_accepted(self, my_srv):
        srv, _ = my_srv
        _, _, rows = mysql_fetch(
            srv.host, srv.port, "", "bob", "sekret",
            "SELECT 1 AS one",
        )
        assert rows == [[1]]

    def test_tls_less_server_refused_by_client(self, eng):
        srv = MySQLWireServer(engine=eng).start()
        try:
            with pytest.raises(ValueError, match="CLIENT_SSL"):
                mysql_fetch(
                    srv.host, srv.port, "", "u", "p",
                    "SELECT 1 AS one", tls=True,
                )
        finally:
            srv.shutdown()

    def test_wrong_trust_root_rejected(self, my_srv, other_ca):
        srv, _ = my_srv
        with pytest.raises(ssl.SSLCertVerificationError):
            mysql_fetch(
                srv.host, srv.port, "", "bob", "sekret",
                "SELECT 1 AS one", tls=True, tls_ca=other_ca,
            )


class TestTLSFlag:
    def test_parse(self):
        assert parse_tls_flag("a.pem:b.key") == ("a.pem", "b.key")
        assert parse_tls_flag(None) is None
        with pytest.raises(ValueError):
            parse_tls_flag("nocolon")
        with pytest.raises(ValueError):
            parse_tls_flag(":empty")
