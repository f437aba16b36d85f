"""Connected components (operators/cc.py) vs a union-find reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # component id = min member
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _check(spark, edges):
    from osm_hadoop_spark.operators.cc import connected_components

    nodes = sorted({x for e in edges for x in e})
    exp = _union_find(edges, nodes)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "src", "dst").collect()
    }
    assert got == exp
    return got


def test_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(5)
    n = 400
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, 700), rng.integers(0, n, 700))
        if a != b
    ]
    _check(spark, edges)


def test_path_graph_round_bound(spark):
    """Worst-case diameter (a 256-node path): the alternating algorithm
    must converge in O(log n) rounds, not O(diameter) — the property that
    makes it usable at 10^12 nodes."""
    from osm_hadoop_spark.operators.cc import connected_components

    n = 256
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    labels, rounds = connected_components(df, "src", "dst", return_rounds=True)
    res = labels.collect()
    assert {r["component"] for r in res} == {0}
    assert len(res) == n
    assert rounds <= 12, f"path-256 took {rounds} rounds (not logarithmic)"


def test_string_ids_and_multiple_components(spark):
    edges = [
        ("doc-b", "doc-a"),
        ("doc-b", "doc-c"),
        ("doc-x", "doc-y"),
        ("doc-a", "doc-c"),  # redundant edge within component
    ]
    got = _check(spark, edges)
    assert got["doc-c"] == "doc-a" and got["doc-y"] == "doc-x"


def test_already_star_and_self_loops(spark):
    edges = [(1, 2), (1, 3), (1, 4), (2, 2)]
    got = _check(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_two_cliques_bridge(spark):
    a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    got = _check(spark, a + b + [(4, 10)])
    assert set(got.values()) == {0}
