"""Connected components vs a pure-Python union-find oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bighouse_spark.operators.components import (
    connected_components,
    dedup_keep_representative,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {v: find(v) for v in parent}


@pytest.mark.parametrize("seed", [1, 7])
def test_matches_union_find(spark, seed):
    rng = random.Random(seed)
    vertices = list(range(200))
    edges = [
        (rng.choice(vertices), rng.choice(vertices)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    oracle = _union_find(edges)
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    assert got == oracle


def test_chain_converges(spark):
    # Worst case for label propagation: a path graph 0-1-2-...-30.
    edges = [(i, i + 1) for i in range(30)]
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert set(got.values()) == {0} and len(got) == 31


def test_dedup_keep_representative(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 4), (4, 7), (2, 9)], "id_a bigint, id_b bigint"
    )
    kept = sorted(
        r.doc_id for r in dedup_keep_representative(df, pairs).collect()
    )
    # components {1,4,7} -> keep 1; {2,9} -> keep 2; others untouched
    assert kept == [0, 1, 2, 3, 5, 6, 8]
