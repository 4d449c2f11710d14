"""Endpoint authentication: the CH HTTP credential surfaces
(?user=&password=, X-ClickHouse-User/-Key, Basic auth) and the native
TCP Hello credentials — both optional (trust default) and checked
constant-time. /ping and /hc stay open, matching ClickHouse."""

from __future__ import annotations

import base64
import threading
import urllib.error
import urllib.parse
import urllib.request

import pytest

from bighouse_spark.engine import BigHouseEngine
from bighouse_spark.server import make_server


@pytest.fixture(scope="module")
def eng(spark):
    return BigHouseEngine(spark)


@pytest.fixture(scope="module")
def server(eng):
    srv = make_server(engine=eng, auth=("alice", "pw1"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def base(server):
    return f"http://127.0.0.1:{server.server_port}"


def _get(url: str, headers: dict | None = None) -> tuple[int, bytes]:
    req = urllib.request.Request(url, headers=headers or {})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


class TestHTTPAuth:
    def test_ping_and_hc_stay_open(self, base):
        assert _get(base + "/") == (200, b"Ok.\n")
        assert _get(base + "/ping")[0] == 200
        assert _get(base + "/hc")[0] == 200

    def test_query_requires_credentials(self, base):
        code, body = _get(base + "/?query=SELECT+1")
        assert code == 403
        assert b"516" in body and b"Authentication failed" in body

    def test_ping_query_rider_requires_credentials(self, base):
        # /ping itself is open, but a ?query= rider executes SQL and
        # must be gated exactly like / (bypass regression).
        code, body = _get(base + "/ping?query=SELECT+1")
        assert code == 403
        assert b"Authentication failed" in body
        code, body = _get(
            base + "/ping?query=SELECT+1+AS+x&user=alice&password=pw1"
        )
        assert (code, body) == (200, b"1\n")

    def test_url_params(self, base):
        code, body = _get(
            base + "/?query=SELECT+1+AS+x&user=alice&password=pw1"
        )
        assert (code, body) == (200, b"1\n")

    def test_clickhouse_headers(self, base):
        code, _ = _get(
            base + "/?query=SELECT+1",
            {"X-ClickHouse-User": "alice", "X-ClickHouse-Key": "pw1"},
        )
        assert code == 200

    def test_basic_auth(self, base):
        b64 = base64.b64encode(b"alice:pw1").decode()
        code, _ = _get(
            base + "/?query=SELECT+1", {"Authorization": "Basic " + b64}
        )
        assert code == 200

    def test_wrong_password_and_query_log_gated(self, base):
        assert _get(
            base + "/?query=SELECT+1&user=alice&password=nope"
        )[0] == 403
        assert _get(base + "/query_log")[0] == 403
        assert _get(base + "/query_log?user=alice&password=pw1")[0] == 200

    def test_post_gated(self, base):
        req = urllib.request.Request(
            base + "/", data=b"SELECT 2", method="POST"
        )
        try:
            with urllib.request.urlopen(req) as r:
                code = r.status
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 403


class TestCHWireAuth:
    @pytest.fixture(scope="class")
    def ch(self, eng):
        from bighouse_spark.chwire import CHWireServer

        srv = CHWireServer(engine=eng, auth=("bob", "s3cr3t")).start()
        yield srv
        srv.shutdown()

    def test_good_credentials_complete_hello_and_query(self, ch):
        from tests.test_chwire import CHClient

        c = CHClient("127.0.0.1", ch.port, user="bob", password="s3cr3t")
        c.read_hello()
        out = c.query("SELECT 42 AS x")
        assert out["rows"] == [[42]]

    def test_bad_credentials_get_exception_516(self, ch):
        from tests.test_chwire import CHClient

        c = CHClient("127.0.0.1", ch.port, user="bob", password="nope")
        with pytest.raises(RuntimeError, match="Authentication failed"):
            c.read_hello()

    def test_wrong_user_rejected(self, ch):
        from tests.test_chwire import CHClient

        c = CHClient("127.0.0.1", ch.port, user="eve", password="s3cr3t")
        with pytest.raises(RuntimeError, match="Authentication failed"):
            c.read_hello()
