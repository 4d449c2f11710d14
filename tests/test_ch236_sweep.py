"""CH 23.6 function-index sweep (VERDICT r11 Next #5).

Every name in the probe list (tests/data/ch236_functions.txt — the
ClickHouse 23.6 function index from the public docs, 970+ names)
must get a DEDICATED response from the dialect: a dispatch-table
entry, a rewrite to a Spark expression, a guided transpile-time
refusal (ValueError naming the supported alternative), engine-level
family handling (dict*), or passthrough to an identically-spelled
Spark builtin. What must NEVER happen is the opaque
UNRESOLVED_ROUTINE: a name that survives transpile untouched and
is not a Spark function would die with it at analysis time.

The reference pins CH 23.6 (ch/Dockerfile:1), so this list is the
dialect-completeness contract: a 23.6 user's query either runs or
tells them exactly why not.
"""

from __future__ import annotations

import os
import re

import pytest

from bighouse_spark.dialect.transpile import (
    served_function_names,
    transpile,
)

_LIST = os.path.join(os.path.dirname(__file__), "data", "ch236_functions.txt")

# dictGet/dictHas and the hierarchy refusals live in the ENGINE's
# _rewrite_dict_calls (they need the registered-dictionary catalog),
# not the pure-SQL transpiler.
ENGINE_LEVEL = {
    "dictGet", "dictGetOrDefault", "dictGetOrNull", "dictHas",
    "dictGetHierarchy", "dictGetChildren", "dictGetDescendants",
}


def _probe_names() -> list[str]:
    with open(_LIST) as f:
        return [
            ln.strip()
            for ln in f
            if ln.strip() and not ln.startswith("#")
        ]


def test_probe_list_is_substantial():
    assert len(_probe_names()) > 900


def test_every_ch236_name_served_guided_or_native(spark):
    served = {n for n, _ in served_function_names()}
    leaks = []
    for name in _probe_names():
        if name in served or name in ENGINE_LEVEL:
            continue
        try:
            out = transpile(f"SELECT {name}(x) FROM t").sql
        except ValueError:
            continue  # guided refusal — a dedicated response
        except Exception as exc:  # pragma: no cover - diagnostic
            leaks.append(f"{name}: unexpected {type(exc).__name__}")
            continue
        if re.search(
            rf"(?<![\w.]){re.escape(name)}\s*\(", out, re.IGNORECASE
        ):
            # survived untouched — must be a real Spark function
            try:
                ok = spark.catalog.functionExists(name)
            except Exception:
                ok = False
            if not ok:
                leaks.append(name)
    assert not leaks, (
        f"{len(leaks)} CH 23.6 names would die with "
        f"UNRESOLVED_ROUTINE: {leaks}"
    )


def test_engine_level_dict_family_responds(spark):
    """The engine names the dictionary problem, never UNRESOLVED."""
    from bighouse_spark.engine import BigHouseEngine

    eng = BigHouseEngine(spark)
    with pytest.raises(Exception, match="CREATE DICTIONARY"):
        eng.execute("SELECT dictGet('nope', 'attr', 1)")
    with pytest.raises(Exception, match="hierarchical"):
        eng.execute("SELECT dictGetHierarchy('nope', 1)")
    with pytest.raises(Exception, match="hierarchical"):
        eng.execute("SELECT dictIsIn('nope', 1, 2)")
