"""CLI entry point (``python -m bighouse_spark`` — the
clickhouse-local analog). One subprocess run covers multi-statement
scripts, per-statement FORMAT, file() reads and the error path."""

from __future__ import annotations

import subprocess
import sys

from tests.conftest import SF_SMOKE


def test_cli_end_to_end(tmp_path):
    script = (
        "SELECT 1 + 1 AS two; "
        "SELECT count() AS c FROM "
        f"file('{SF_SMOKE}/region.parquet', 'Parquet') "
        "FORMAT JSONEachRow; "
        "SELECT 'x' AS s FORMAT CSVWithNames"
    )
    proc = subprocess.run(
        [sys.executable, "-m", "bighouse_spark", "-q", script,
         "--cpus", "4"],
        capture_output=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    out = proc.stdout.decode()
    assert out == '2\n{"c": 5}\n"s"\n"x"\n'


def test_cli_error_exit_code():
    proc = subprocess.run(
        [sys.executable, "-m", "bighouse_spark", "-q", "SELEC nonsense",
         "--cpus", "2"],
        capture_output=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 1
    assert "Error:" in proc.stderr.decode()
