"""k-core peeling (operators/routing.py::k_core) vs a dict-based peeler."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _brute(edges, k):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items()}


def _synth():
    edges = set()
    for i in range(400):
        a, b = _h(f"a{i}", 80), _h(f"b{i}", 80)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    # handcrafted: K5 clique (survives k<=4), triangle with a tail
    # (tail peels, triangle survives k=2), long chain (dies for k>=2)
    clique = [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    tri = [(200, 201), (201, 202), (200, 202), (202, 203), (203, 204)]
    chain = [(300 + i, 301 + i) for i in range(10)]
    return sorted(edges) + clique + tri + chain


@pytest.mark.parametrize("k", [2, 3, 4])
def test_kcore_matches_peeler(spark, k):
    from osm_hadoop_spark.operators.routing import k_core

    edges = _synth()
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.core_deg for r in k_core(df, k).collect()}
    assert got == _brute(edges, k)
    if k <= 4:
        assert all(got[100 + i] == 4 for i in range(5))  # clique intact
    if k == 2:
        assert {200, 201, 202} <= set(got) and 203 not in got and 204 not in got
    assert not any(300 <= n <= 310 for n in got)


def test_kcore_empty_and_everything_survives(spark):
    from osm_hadoop_spark.operators.routing import k_core

    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "u long, v long")
    assert k_core(df, 5).count() == 0
    got = {r.node: r.core_deg for r in k_core(df, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}  # zero peel rounds, fixpoint first pass
