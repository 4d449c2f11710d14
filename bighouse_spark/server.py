"""HTTP service shell — the query endpoint the reference implies but
never wired (its Echo server registers only ``GET /hc``,
``http_server/http_server.go:50``; queries enter via Temporal with
``QueryExecutorInput`` → ``{Cols, Rows}``,
``temporal/workflow_query_executor.go:30-40``).

Framework-free (stdlib ``http.server``) because the container has no
web framework and the surface is three routes:

- ``POST /query``  — body ``{"query": str, "init_queries": [str],
  "num_nodes": int?, "cores": int?}`` → ``{"cols": [...], "rows":
  [[...]], "elapsed_sec": f}``; errors → 400 with ``{"error": ...}``.
- ``POST /query/sink`` — same body plus ``{"path": str, "format":
  str?, "partition_by": [str]?}`` → distributed write, no collect —
  the 100 TB result path (reference's "TODO: Return S3 url",
  ``temporal/workflow_query_executor.go:94``).
- ``GET /hc``      — health check (``http_server/http_server.go:83-85``).
- ``GET /query_log`` — the ``system.query_log`` analog
  (``ch/config.xml:932``).

One process = one warm SparkSession (the reference's own numbers show
per-query cluster spin-up halving fast-query throughput,
``README.md:58,104``). The server is threaded; Spark's scheduler
interleaves concurrent jobs on its own.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from dataclasses import asdict
from datetime import date, datetime
from decimal import Decimal
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from bighouse_spark.engine import BigHouseEngine, QueryRequest
from bighouse_spark.formats import (
    DEFAULT_FORMAT,
    normalize_format,
    render_result,
    split_result_format,
)


def _json_default(o: Any) -> Any:
    if isinstance(o, (datetime, date)):
        return o.isoformat()
    if isinstance(o, Decimal):
        return float(o)
    if isinstance(o, bytes):
        return o.hex()
    return str(o)


def _dumps(payload: Any) -> bytes:
    return json.dumps(payload, default=_json_default).encode("utf-8")


class _Handler(BaseHTTPRequestHandler):
    engine: BigHouseEngine  # set by make_server

    def log_message(self, *args: Any) -> None:  # silence default stderr log
        pass

    def _send(self, code: int, payload: Any) -> None:
        body = _dumps(payload)
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:
        parsed = urllib.parse.urlsplit(self.path)
        if parsed.path == "/hc":
            ok = self.engine.health_check()
            self._send(200 if ok else 500, {"ok": ok})
        elif parsed.path == "/query_log":
            self._send(200, [asdict(e) for e in self.engine.query_log])
        elif parsed.path in ("/", "/ping"):
            self._ch_http(parsed, body=b"")
        else:
            self._send(404, {"error": f"no route {self.path}"})

    # -- ClickHouse-compatible HTTP interface ------------------------
    # The reference's nodes serve CH HTTP on 8123 (ch/config.xml:133):
    # GET/POST /?query=... with the result rendered per the trailing
    # FORMAT clause / default_format param / X-ClickHouse-Format
    # header (TabSeparated when unspecified — CH's HTTP default).
    # INSERT payloads ride in the POST body after a query param
    # carrying "INSERT INTO t FORMAT JSONEachRow" (CH concatenates
    # the two) and are handled by the engine's INSERT-FORMAT parser.

    def _send_text(
        self, code: int, body: bytes, content_type: str,
        extra: dict[str, str] | None = None,
    ) -> None:
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _ch_http(self, parsed, body: bytes) -> None:
        params = urllib.parse.parse_qs(parsed.query)
        sql = (params.get("query") or [""])[0]
        if body:
            # CH semantics: URL query + body are concatenated — the
            # body is either the rest of the statement or an INSERT
            # data payload.
            sql = (sql + "\n" + body.decode("utf-8", "replace")) if sql \
                else body.decode("utf-8", "replace")
        if not sql.strip():
            # CH answers bare GET / with "Ok." (the canonical ping).
            self._send_text(200, b"Ok.\n", "text/plain; charset=UTF-8")
            return
        sql, fmt_in_sql = split_result_format(sql)
        df_param = (params.get("default_format") or [None])[0]
        if df_param is not None and normalize_format(df_param) is None:
            self._send_text(
                400,
                f"Code: 73. DB::Exception: Unknown format "
                f"{df_param!r}\n".encode(),
                "text/plain; charset=UTF-8",
            )
            return
        fmt = (
            fmt_in_sql
            or normalize_format(df_param)
            or normalize_format(self.headers.get("X-ClickHouse-Format"))
            or DEFAULT_FORMAT
        )
        # SET-able URL params (CH accepts settings as query params).
        init = [
            f"SET {k} = {v[0]}"
            for k, v in params.items()
            if k not in ("query", "default_format", "database", "user",
                         "password", "session_id", "query_id")
        ]
        qid = (params.get("query_id") or [None])[0]
        try:
            result = self.engine.execute(
                QueryRequest(query=sql, init_queries=init, query_id=qid,
                             remote=True)
            )
        except Exception as e:
            self._send_text(
                400,
                f"Code: 62. DB::Exception: {str(e)[:2000]}\n".encode(),
                "text/plain; charset=UTF-8",
                extra={"X-ClickHouse-Exception-Code": "62"},
            )
            return
        rendered, content_type = render_result(
            result.cols, result.rows, fmt,
            types=result.types, elapsed=result.elapsed_sec,
        )
        extra = {
            "X-ClickHouse-Format": fmt,
            "X-ClickHouse-Summary": json.dumps(
                {"read_rows": str(len(result.rows)),
                 "elapsed_ns": str(int(result.elapsed_sec * 1e9))}
            ),
        }
        if qid:
            extra["X-ClickHouse-Query-Id"] = qid
        # CH HTTP supports compressed responses (enable_http_compression
        # semantics); honor gzip when the client advertises it.
        accept = self.headers.get("Accept-Encoding", "")
        if "gzip" in accept.lower():
            import gzip

            rendered = gzip.compress(rendered)
            extra["Content-Encoding"] = "gzip"
        self._send_text(200, rendered, content_type, extra=extra)

    def _read_request(self) -> dict[str, Any]:
        length = int(self.headers.get("Content-Length", "0"))
        return json.loads(self.rfile.read(length) or b"{}")

    def do_POST(self) -> None:
        parsed = urllib.parse.urlsplit(self.path)
        if parsed.path == "/":
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            # CH accepts gzip-compressed request bodies (bulk INSERT
            # payloads); mirror that.
            if self.headers.get("Content-Encoding", "").lower() == "gzip":
                import gzip

                body = gzip.decompress(body)
            self._ch_http(parsed, body=body)
            return
        if parsed.path not in ("/query", "/query/sink"):
            self._send(404, {"error": f"no route {self.path}"})
            return
        try:
            body = self._read_request()
            req = QueryRequest(
                query=body["query"],
                init_queries=body.get("init_queries", []),
                num_nodes=body.get("num_nodes"),
                cores=body.get("cores"),
                remote=True,
            )
        except (KeyError, json.JSONDecodeError) as e:
            self._send(400, {"error": f"bad request: {e!r}"})
            return
        try:
            if self.path == "/query":
                self._send(200, self.engine.execute(req).to_dict())
            else:
                meta = self.engine.execute_to_sink(
                    req,
                    path=body["path"],
                    fmt=body.get("format", "parquet"),
                    partition_by=body.get("partition_by"),
                )
                self._send(200, meta)
        except Exception as e:  # engine already logged it in query_log
            self._send(400, {"error": str(e)[:2000]})


def make_server(
    engine: BigHouseEngine | None = None, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Build (not start) the server; ``port=0`` picks a free port.
    Caller runs ``serve_forever`` (or ``start_in_background``)."""
    engine = engine or BigHouseEngine()
    handler = type("BoundHandler", (_Handler,), {"engine": engine})
    return ThreadingHTTPServer((host, port), handler)


def start_in_background(
    engine: BigHouseEngine | None = None, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    server = make_server(engine, host, port)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread


def main() -> None:  # pragma: no cover - manual entry point
    import argparse

    ap = argparse.ArgumentParser(description="BigHouse-Spark query service")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8123)
    ap.add_argument(
        "--pg-port", type=int, default=None,
        help="also serve the PostgreSQL wire protocol on this port "
        "(the reference's postgresql_port 9005, ch/config.xml:143)",
    )
    ap.add_argument(
        "--mysql-port", type=int, default=None,
        help="also serve the MySQL wire protocol on this port "
        "(the reference's mysql_port 9004, ch/config.xml:138)",
    )
    args = ap.parse_args()
    engine = BigHouseEngine()
    server = make_server(engine=engine, host=args.host, port=args.port)
    non_loopback = args.host not in ("127.0.0.1", "::1", "localhost")
    if non_loopback and (args.pg_port or args.mysql_port):
        import sys

        print(
            "WARNING: the PG/MySQL wire endpoints accept ANY credentials "
            "(trust auth) and expose full SQL including file() reads of "
            f"the local filesystem; binding them to {args.host!r} makes "
            "that reachable off-host. Put them behind a loopback bind or "
            "a network boundary you control.",
            file=sys.stderr,
        )
    if args.pg_port is not None:
        from bighouse_spark.pgwire import PGWireServer

        pg = PGWireServer(engine=engine, host=args.host, port=args.pg_port)
        pg.start()
        print(f"pg wire protocol on {pg.host}:{pg.port}")
    if args.mysql_port is not None:
        from bighouse_spark.mysqlwire import MySQLWireServer

        my = MySQLWireServer(
            engine=engine, host=args.host, port=args.mysql_port
        )
        my.start()
        print(f"mysql wire protocol on {my.host}:{my.port}")
    print(f"bighouse-spark listening on {args.host}:{server.server_port}")
    server.serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
