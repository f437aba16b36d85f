"""Borůvka MSF (operators/mst.py): equals Kruskal under the (w, u, v)
total order, forests handled, parallel edges collapsed."""

from __future__ import annotations

import random


def _kruskal(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, u, v in sorted((w, u, v) for u, v, w in edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)


def test_boruvka_equals_kruskal_with_ties(spark):
    from osm_hadoop_spark.operators.mst import boruvka_msf

    random.seed(3)
    pairs = set()
    while len(pairs) < 160:
        a, b = random.randrange(50), random.randrange(50)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    # weights 1..39 over 160 edges: ties guaranteed, broken by (u, v)
    edges = [(u, v, random.randrange(1, 40)) for u, v in sorted(pairs)]
    df = spark.createDataFrame(edges, "u long, v long, w long")
    got = sorted((r.u, r.v, r.w) for r in boruvka_msf(df).collect())
    assert got == _kruskal(edges)
    assert len(got) == 49  # connected: n-1 edges


def test_boruvka_forest_and_parallel_edges(spark):
    from osm_hadoop_spark.operators.mst import boruvka_msf

    edges = [
        (0, 1, 5), (1, 2, 3), (1, 0, 7),      # parallel (0,1): lighter kept
        (10, 11, 1), (11, 12, 9), (10, 12, 2),  # second component
    ]
    df = spark.createDataFrame(edges, "u long, v long, w long")
    got = sorted((r.u, r.v, r.w) for r in boruvka_msf(df).collect())
    assert got == [(0, 1, 5), (1, 2, 3), (10, 11, 1), (10, 12, 2)]
