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


def test_cc_resumable_from_catalog(spark, tmp_path):
    """North-rule resumability on the iterative op: every round is a
    durable SnapshotCatalog snapshot; after an injected mid-run failure,
    resume=True restarts from the last completed round (no recompute of
    finished rounds) and reaches the identical fixpoint."""
    from osm_hadoop_spark.operators.cc import connected_components
    from osm_hadoop_spark.sources.catalog import SnapshotCatalog

    edges = [(i, i + 1) for i in range(64)]  # path graph -> several rounds
    df = spark.createDataFrame(edges, ["src", "dst"])
    expected = {
        r["node"]: r["component"]
        for r in connected_components(df, "src", "dst").collect()
    }

    class CountingCatalog(SnapshotCatalog):
        def __init__(self, *a, fail_after=10**9, **k):
            super().__init__(*a, **k)
            self.writes = 0
            self.fail_after = fail_after

        def write(self, *a, **k):
            if self.writes >= self.fail_after:
                raise RuntimeError("injected failure")
            self.writes += 1
            return super().write(*a, **k)

    root = str(tmp_path / "cc")
    cat = CountingCatalog(spark, root, use_iceberg=False, fail_after=3)
    with pytest.raises(RuntimeError, match="injected"):
        connected_components(df, "src", "dst", catalog=cat, table="cc")
    # rounds 0..2 are durable; resume continues at round 3
    cat2 = CountingCatalog(spark, root, use_iceberg=False)
    labels, rounds = connected_components(
        df, "src", "dst", catalog=cat2, table="cc", resume=True, return_rounds=True
    )
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == expected
    assert rounds >= 3 and cat2.writes == rounds - 2


def test_two_cliques_bridge(spark):
    a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    got = _check(spark, a + b + [(4, 10)])
    assert set(got.values()) == {0}
