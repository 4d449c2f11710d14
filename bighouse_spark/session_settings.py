"""Shared SET-statement parsing and SETTINGS-clause merging.

Used by the HTTP ``session_id`` layer (server.py) and the
per-connection state of the PG / MySQL wire endpoints: a ``SET k = v``
persists to the scope (HTTP session / wire connection) and is
re-injected into later SELECTs as a trailing ``SETTINGS`` clause —
the engine's per-query settings channel, covering both conf-mapped
and engine-enforced names. The query's own SETTINGS win on conflict.
"""

from __future__ import annotations

import re

SET_STMT_RE = re.compile(
    r"^\s*SET\s+(.+?)\s*;?\s*$", re.IGNORECASE | re.DOTALL
)
_SET_PAIR_RE = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_.]*)\s*(?:=|\s+TO\s+)\s*(.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
TRAILING_SETTINGS_RE = re.compile(
    r"\bSETTINGS\s+(.+)$", re.IGNORECASE | re.DOTALL
)
SELECTISH_RE = re.compile(r"^\s*(\(|SELECT\b|WITH\b)", re.IGNORECASE)


def split_top_commas(s: str) -> list[str]:
    parts, cur, quote = [], [], None
    for c in s:
        if quote:
            cur.append(c)
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
            cur.append(c)
        elif c == ",":
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    if cur:
        parts.append("".join(cur))
    return parts


def parse_set_statement(sql: str) -> dict[str, str] | None:
    """``SET a = 1, b = 'x'`` (also PG's ``SET a TO 1``) → pair dict;
    None when the statement is not a SET."""
    m = SET_STMT_RE.match(sql)
    if not m:
        return None
    out: dict[str, str] = {}
    for part in split_top_commas(m.group(1)):
        pm = _SET_PAIR_RE.match(part)
        if pm:
            out[pm.group(1)] = pm.group(2)
    return out


def normalize_set_statement(sql: str) -> str | None:
    """Rewrite a SET statement to the ``SET k = v`` spelling the
    engine accepts (PG clients send ``SET k TO v``); None when the
    statement is not a SET or has no parseable pairs."""
    pairs = parse_set_statement(sql)
    if not pairs:
        return None
    return "SET " + ", ".join(f"{k} = {v}" for k, v in pairs.items())


def merge_settings_clause(sql: str, settings: dict[str, str]) -> str:
    """Inject persisted settings as a trailing SETTINGS clause on a
    SELECT-ish statement; the query's own SETTINGS win on conflict.
    Appending at the very END is deliberate: the engine's transpile
    strips SETTINGS first and FORMAT second, so its supported clause
    order is ``... [FORMAT x] SETTINGS ...`` — a wire statement with
    a trailing FORMAT keeps working. Non-SELECT statements pass
    through unchanged."""
    if not settings or not SELECTISH_RE.match(sql):
        return sql
    merged = dict(settings)
    base = sql
    m = TRAILING_SETTINGS_RE.search(sql)
    if m:
        base = sql[: m.start()].rstrip()
        for pair in m.group(1).split(","):
            k, _, v = pair.partition("=")
            if k.strip():
                merged[k.strip()] = v.strip()
    clause = ", ".join(f"{k} = {v}" for k, v in merged.items())
    return f"{base} SETTINGS {clause}"
