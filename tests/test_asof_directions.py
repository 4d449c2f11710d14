"""asof_join direction/tolerance vs the pandas merge_asof oracle."""

from __future__ import annotations

import pandas as pd
import pytest

from bighouse_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "lt": [10.0, 25.0, 40.0, 5.0, 50.0, 7.0],
            "lv": ["a", "b", "c", "d", "e", "f"],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "rt": [8.0, 25.0, 33.0, 20.0, 60.0],
            "rv": [100, 200, 300, 400, 500],
        }
    )
    return left, right, spark.createDataFrame(left), spark.createDataFrame(right)


def _spark_result(sdf):
    return sorted(
        (r.k, r.lt, r.lv, r.rv, r.rt) for r in sdf.collect()
    )


def _pandas_result(left, right, **kw):
    m = pd.merge_asof(
        left.sort_values("lt"),
        right.sort_values("rt"),
        left_on="lt",
        right_on="rt",
        by="k",
        **kw,
    )
    return sorted(
        (
            int(r.k), float(r.lt), r.lv,
            None if pd.isna(r.rv) else int(r.rv),
            None if pd.isna(r.rt) else float(r.rt),
        )
        for r in m.itertuples()
    )


def test_backward_matches_pandas(frames):
    lpd, rpd, lsp, rsp = frames
    got = _spark_result(asof_join(lsp, rsp, ["k"], "lt", "rt"))
    want = _pandas_result(lpd, rpd, direction="backward")
    assert got == want


def test_forward_matches_pandas(frames):
    lpd, rpd, lsp, rsp = frames
    got = _spark_result(
        asof_join(lsp, rsp, ["k"], "lt", "rt", direction="forward")
    )
    want = _pandas_result(lpd, rpd, direction="forward")
    assert got == want


def test_backward_strict_matches_pandas(frames):
    lpd, rpd, lsp, rsp = frames
    got = _spark_result(asof_join(lsp, rsp, ["k"], "lt", "rt", strict=True))
    want = _pandas_result(lpd, rpd, direction="backward", allow_exact_matches=False)
    assert got == want


def test_tolerance_matches_pandas(frames):
    lpd, rpd, lsp, rsp = frames
    got = _spark_result(
        asof_join(lsp, rsp, ["k"], "lt", "rt", tolerance=5.0)
    )
    want = _pandas_result(lpd, rpd, direction="backward", tolerance=5.0)
    assert got == want


def test_forward_tolerance(frames):
    lpd, rpd, lsp, rsp = frames
    got = _spark_result(
        asof_join(
            lsp, rsp, ["k"], "lt", "rt", direction="forward", tolerance=10.0
        )
    )
    want = _pandas_result(lpd, rpd, direction="forward", tolerance=10.0)
    assert got == want


def test_bad_direction_raises(frames):
    _, _, lsp, rsp = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(lsp, rsp, ["k"], "lt", "rt", direction="nearest")
