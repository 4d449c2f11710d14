"""Executor-side ``url()`` fan-out.

The reference's ``urlCluster`` distributes URL reads across nodes
(reference ``workflow_query_executor_test.go:63-65``); our small-set
path spools http(s) files through the driver (no Hadoop http FS in
this environment), which is fine for a handful of public CSVs but
becomes a driver funnel when a brace glob expands to hundreds of
files. This module is the scale path: the URL list becomes a
one-column DataFrame, and each EXECUTOR fetches and parses its URLs
inside ``mapInPandas`` (Arrow-batched) — the payload bytes never
touch the driver, matching the reference's fan-out semantics.

Schema contract: a declared CH schema string (the common reference
shape, ``s3/url(.., 'CSVWithNames', 'a UInt64, b String')``) is
authoritative — parse columns are cast to it via Arrow. Without one,
a single bounded driver fetch of the FIRST url infers the schema that
every executor parse is then cast to (a 1000-file scan costs one
driver-side file, not a thousand).
"""

from __future__ import annotations

import gzip
import io
import os
import sys
import urllib.request

from bighouse_spark.functions._shipping import ship_by_value

FANOUT_THRESHOLD = int(
    os.environ.get("BIGHOUSE_URL_FANOUT_THRESHOLD", "8")
)
MAX_FILE_BYTES = int(
    os.environ.get(
        "BIGHOUSE_URL_FANOUT_MAX_FILE_BYTES", str(4 << 30)
    )
)
_FANOUT_FORMATS = {"csv", "parquet"}


def can_fanout(paths: list[str], fmt: str) -> bool:
    """True when the url() read should bypass the driver spool: more
    files than the threshold, an executor-parseable format, and all
    plain-http sources (s3a:// etc. already scan distributed)."""
    return (
        len(paths) > FANOUT_THRESHOLD
        and fmt in _FANOUT_FORMATS
        and all(p.startswith(("http://", "https://")) for p in paths)
    )


class _CappedResponse(io.RawIOBase):
    """Sequential file-like over an HTTP response enforcing the
    per-file byte cap AS the bytes stream past — the violating read
    raises before the next chunk is fetched, so a hostile
    Content-Length costs one chunk, not the declared size."""

    def __init__(self, resp, url: str, cap: int) -> None:
        self._resp = resp
        self._url = url
        self._cap = cap
        self._seen = 0

    def readable(self) -> bool:  # pragma: no cover - io protocol
        return True

    def readinto(self, b) -> int:
        data = self._resp.read(len(b))
        self._seen += len(data)
        if self._seen > self._cap:
            raise ValueError(
                f"url() file {self._url} exceeds the per-file cap "
                f"({self._cap} bytes); raise "
                "BIGHOUSE_URL_FANOUT_MAX_FILE_BYTES"
            )
        b[: len(data)] = data
        return len(data)

    def close(self) -> None:
        try:
            self._resp.close()
        finally:
            super().close()


def _open_stream(url: str, cap: int = MAX_FILE_BYTES):
    """url → sequential decompressed byte stream; peak memory is
    O(buffer), not O(file). The cap counts WIRE bytes (pre-gunzip),
    same contract as the old buffered fetch."""
    resp = urllib.request.urlopen(url, timeout=120)
    raw = io.BufferedReader(_CappedResponse(resp, url, cap), 1 << 20)
    if url.split("?", 1)[0].endswith(".gz"):
        return gzip.GzipFile(fileobj=raw)
    return raw


def _fetch_bytes(url: str, cap: int = MAX_FILE_BYTES) -> bytes:
    """Fully-buffered fetch — only for formats that need random
    access (parquet footers) and the one bounded driver-side schema
    probe; the executor CSV path streams via ``_open_stream``."""
    with _open_stream(url, cap) as f:
        return f.read()


def _csv_options(header: bool, sep: str | None, arrow_schema,
                 block_size: int | None = None,
                 use_threads: bool = True):
    from pyarrow import csv as pacsv

    names = None
    column_types = {}
    if arrow_schema is not None:
        column_types = {f.name: f.type for f in arrow_schema}
        if not header:
            names = [f.name for f in arrow_schema]
    read_kw = dict(
        column_names=names,
        autogenerate_column_names=(not header and names is None),
        use_threads=use_threads,
    )
    if block_size is not None:
        read_kw["block_size"] = block_size
    return (
        pacsv.ReadOptions(**read_kw),
        pacsv.ParseOptions(delimiter=sep or ","),
        pacsv.ConvertOptions(column_types=column_types),
    )


def _cast_to(tbl, arrow_schema):
    if arrow_schema is not None:
        tbl = tbl.select([f.name for f in arrow_schema])
        tbl = tbl.cast(arrow_schema)
    return tbl


def _parse_table(data: bytes, fmt: str, header: bool, sep: str | None,
                 arrow_schema):
    """bytes → pyarrow Table, cast to ``arrow_schema`` when given."""
    import pyarrow as pa

    if fmt == "parquet":
        import pyarrow.parquet as pq

        tbl = pq.read_table(pa.BufferReader(data))
    else:
        from pyarrow import csv as pacsv

        read_opts, parse_opts, conv_opts = _csv_options(
            header, sep, arrow_schema
        )
        tbl = pacsv.read_csv(
            pa.BufferReader(data),
            read_options=read_opts,
            parse_options=parse_opts,
            convert_options=conv_opts,
        )
    return _cast_to(tbl, arrow_schema)


def _iter_csv_batches(url: str, header: bool, sep: str | None,
                      arrow_schema, block_size: int | None = None):
    """Streaming CSV parse: HTTP bytes → (capped, gunzipped) stream →
    Arrow incremental reader → one pyarrow Table per ~1 MiB block.
    Peak memory is O(block), not O(file) — the whole file is never
    held, compressed or decompressed."""
    import pyarrow as pa
    from pyarrow import csv as pacsv

    # use_threads=False: the threaded incremental reader races ahead
    # of the consumer and buffers the WHOLE stream (measured 27 MB
    # peak for a 27 MB file vs 4.6 MB single-threaded; SCALE.md).
    # Executors already parallelize across files, so per-file parse
    # threads buy nothing here.
    read_opts, parse_opts, conv_opts = _csv_options(
        header, sep, arrow_schema, block_size, use_threads=False
    )
    with _open_stream(url) as fobj:
        with pacsv.open_csv(
            fobj,
            read_options=read_opts,
            parse_options=parse_opts,
            convert_options=conv_opts,
        ) as reader:
            for batch in reader:
                yield _cast_to(pa.Table.from_batches([batch]),
                               arrow_schema)


def _file_name(url: str) -> str:
    return url.split("?", 1)[0].rstrip("/").rsplit("/", 1)[-1]


def _to_pandas_nullsafe(tbl):
    """Arrow → pandas keeping integer columns integral: plain
    ``to_pandas()`` turns an int column containing any null into
    float64, silently corrupting values above 2^53. Map integer Arrow
    types to pandas nullable extension dtypes (Arrow-roundtrip-safe
    in mapInPandas)."""
    import pandas as pd
    import pyarrow as pa

    mapper = {
        pa.int8(): pd.Int8Dtype(), pa.int16(): pd.Int16Dtype(),
        pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
        pa.uint8(): pd.UInt8Dtype(), pa.uint16(): pd.UInt16Dtype(),
        pa.uint32(): pd.UInt32Dtype(), pa.uint64(): pd.UInt64Dtype(),
    }.get
    return tbl.to_pandas(types_mapper=mapper)


def read_urls_distributed(
    spark,
    urls: list[str],
    fmt: str = "csv",
    schema=None,
    header: bool = True,
    compression: str | None = None,  # noqa: ARG001 — gzip is sniffed
    add_file_column: bool = False,
    options: dict[str, str] | None = None,
):
    from pyspark.sql.pandas.types import (
        from_arrow_schema,
        to_arrow_schema,
    )
    from pyspark.sql.types import StringType, StructField, StructType

    sep = (options or {}).get("sep")
    if isinstance(schema, str):
        from bighouse_spark.dialect.schema import parse_schema_string

        schema = parse_schema_string(schema)
    if schema is None:
        # One bounded driver fetch to pin the schema all executors
        # cast to (parquet is self-describing per file but files may
        # disagree; CSV needs types).
        first = _parse_table(
            _fetch_bytes(urls[0]), fmt, header, sep, None
        )
        arrow_schema = first.schema
        spark_schema = from_arrow_schema(arrow_schema)
    else:
        spark_schema = schema
        arrow_schema = to_arrow_schema(schema)
    fields = list(spark_schema.fields)
    if add_file_column:
        fields = fields + [StructField("_file", StringType())]
    out_schema = StructType(fields)

    def fetch_parse(batches):
        for pdf in batches:
            for u in pdf["u"]:
                if fmt == "csv":
                    # streamed: one yielded frame per Arrow block, so
                    # executor peak memory is O(block) not O(file)
                    for tbl in _iter_csv_batches(
                        u, header, sep, arrow_schema
                    ):
                        out = _to_pandas_nullsafe(tbl)
                        if add_file_column:
                            out["_file"] = _file_name(u)
                        yield out
                else:
                    # parquet needs random access to its footer —
                    # buffered under the per-file cap
                    tbl = _parse_table(
                        _fetch_bytes(u), fmt, header, sep, arrow_schema
                    )
                    out = _to_pandas_nullsafe(tbl)
                    if add_file_column:
                        out["_file"] = _file_name(u)
                    yield out

    n_parts = min(
        len(urls), max(spark.sparkContext.defaultParallelism, 8)
    )
    urls_df = spark.createDataFrame(
        [(u,) for u in urls], ["u"]
    ).repartition(n_parts)
    return urls_df.mapInPandas(fetch_parse, schema=out_schema)


ship_by_value(sys.modules[__name__])
