"""ClickHouse query parameters: {name:Type} placeholders bound via
QueryRequest.params (engine), ?param_<name>= (HTTP), "params" (JSON
POST /query), and --param (CLI). Substitution is typed and
injection-safe — the public CH surface
(SELECT {n:UInt64}; clickhouse-client --param_n / HTTP param_n)."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pytest

from bighouse_spark.dialect.transpile import substitute_parameters
from bighouse_spark.engine import BigHouseEngine, QueryRequest
from bighouse_spark.server import start_in_background


@pytest.fixture(scope="module")
def eng(spark):
    return BigHouseEngine(spark)


@pytest.fixture(scope="module")
def http(eng):
    srv, _t = start_in_background(engine=eng)
    yield srv
    srv.shutdown()


class TestSubstitution:
    def test_typed_literals(self):
        out = substitute_parameters(
            "SELECT {n:UInt64} + 1 AS v, {s:String} AS s, "
            "{d:Date} AS d, {f:Float64} AS f, {b:Bool} AS b",
            {"n": "41", "s": "it's", "d": "2024-01-02",
             "f": "1.5", "b": "true"},
        )
        assert "CAST(41 AS BIGINT) + 1" in out
        assert "'it''s'" in out
        assert "CAST('2024-01-02' AS DATE)" in out
        assert "CAST(1.5 AS DOUBLE)" in out
        assert " true AS b" in out

    def test_identifier_and_array(self):
        out = substitute_parameters(
            "SELECT {a:Array(UInt8)} FROM {t:Identifier}",
            {"a": "[1,2]", "t": "nation"},
        )
        assert "FROM nation" in out
        assert "array(CAST(1 AS BIGINT), CAST(2 AS BIGINT))" in out

    def test_placeholders_in_strings_untouched(self):
        out = substitute_parameters(
            "SELECT '{n:UInt64}' AS lit, {n:UInt64} AS v", {"n": "7"}
        )
        assert "'{n:UInt64}'" in out
        assert "CAST(7 AS BIGINT)" in out

    def test_injection_blocked(self):
        with pytest.raises(ValueError, match="not an integer"):
            substitute_parameters(
                "SELECT {n:UInt64}", {"n": "1; DROP TABLE x"}
            )
        with pytest.raises(ValueError, match="not a valid identifier"):
            substitute_parameters(
                "SELECT * FROM {t:Identifier}", {"t": "x; DROP"}
            )
        # hostile strings are escaped, never spliced
        out = substitute_parameters(
            "SELECT {s:String} AS v", {"s": "a'; DROP TABLE x; --"}
        )
        assert "DROP TABLE" in out  # inside the literal
        assert out.count("'") % 2 == 0

    def test_unbound_and_unsupported(self):
        with pytest.raises(ValueError, match="no bound value"):
            substitute_parameters("SELECT {missing:UInt8}", {})
        with pytest.raises(ValueError, match="not supported"):
            substitute_parameters(
                "SELECT {m:Map(String, UInt8)}", {"m": "{}"}
            )

    def test_uint64_overflow_range(self):
        out = substitute_parameters(
            "SELECT {n:UInt64} AS v", {"n": "18446744073709551615"}
        )
        assert "DECIMAL(38, 0)" in out


class TestEngineParams:
    def test_engine_execute_with_params(self, eng):
        r = eng.execute(QueryRequest(
            query="SELECT {a:UInt32} * {b:UInt32} AS v, {s:String} AS s",
            params={"a": "6", "b": "7", "s": "ok"},
        ))
        assert r.rows == [[42, "ok"]]

    def test_params_in_where(self, eng):
        r = eng.execute(QueryRequest(
            query="SELECT count() AS c FROM numbers(100) "
            "WHERE number < {cut:UInt8}",
            params={"cut": "10"},
        ))
        assert r.rows == [[10]]


class TestHTTPParams:
    def test_get_param_binding(self, http):
        h, p = http.server_address[:2]
        q = urllib.parse.quote("SELECT {x:Int32} + 1 AS v FORMAT JSONEachRow")
        with urllib.request.urlopen(
            f"http://{h}:{p}/?query={q}&param_x=41", timeout=60
        ) as r:
            assert json.loads(r.read())["v"] == 42

    def test_unbound_param_is_400(self, http):
        import urllib.error

        h, p = http.server_address[:2]
        q = urllib.parse.quote("SELECT {x:Int32} AS v")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://{h}:{p}/?query={q}", timeout=60
            )
        assert ei.value.code == 400
        assert b"no bound value" in ei.value.read()

    def test_json_post_params(self, http):
        h, p = http.server_address[:2]
        body = json.dumps({
            "query": "SELECT {n:UInt8} AS v",
            "params": {"n": 5},
        }).encode()
        req = urllib.request.Request(
            f"http://{h}:{p}/query", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.loads(r.read())["rows"] == [[5]]


class TestCLIParam:
    def test_cli_param_flag(self, spark):
        import io
        import sys as _sys

        from bighouse_spark.__main__ import main

        old = _sys.stdout
        _sys.stdout = io.TextIOWrapper(io.BytesIO(), encoding="utf-8")
        try:
            rc = main([
                "-q", "SELECT {n:UInt8} * 2 AS v FORMAT JSONEachRow",
                "--param", "n=21",
            ])
            _sys.stdout.flush()
            out = _sys.stdout.buffer.getvalue()
        finally:
            _sys.stdout = old
        assert rc == 0
        assert json.loads(out)["v"] == 42


class TestSessionParams:
    """SET param_<name> inside an HTTP session binds {name:Type} in
    later requests; an explicit URL param_<name> wins."""

    def _q(self, http, sql, extra=""):
        h, p = http.server_address[:2]
        u = (f"http://{h}:{p}/?query="
             f"{urllib.parse.quote(sql)}{extra}")
        with urllib.request.urlopen(u, timeout=60) as r:
            return r.read()

    def test_set_param_persists_and_url_wins(self, http):
        self._q(http, "SET param_x = 7", "&session_id=qp1")
        self._q(http, "SET param_s = 'he''llo'", "&session_id=qp1")
        out = self._q(
            http,
            "SELECT {x:UInt8} AS v, {s:String} AS s "
            "FORMAT JSONEachRow",
            "&session_id=qp1",
        )
        assert json.loads(out) == {"v": 7, "s": "he'llo"}
        out2 = self._q(
            http,
            "SELECT {x:UInt8} AS v FORMAT JSONEachRow",
            "&session_id=qp1&param_x=9",
        )
        assert json.loads(out2)["v"] == 9

    def test_param_setting_not_leaked_to_settings_clause(self, http):
        # a param_ setting must not ride SETTINGS into the engine
        self._q(http, "SET param_z = 3", "&session_id=qp2")
        out = self._q(
            http, "SELECT 1 AS ok FORMAT JSONEachRow",
            "&session_id=qp2",
        )
        assert json.loads(out)["ok"] == 1
