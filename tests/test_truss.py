"""k-truss peeling (operators/truss.py::k_truss) vs a dict-based peeler."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from itertools import combinations

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _brute(edges, k):
    """Reference peel: delete edges with < k-2 common neighbors until
    fixpoint; return {(a, b): final support} over the survivors."""
    need = k - 2
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}

    def supports(cur):
        adj = defaultdict(set)
        for a, b in cur:
            adj[a].add(b)
            adj[b].add(a)
        return {(a, b): len(adj[a] & adj[b]) for a, b in cur}

    while True:
        sup = supports(es)
        keep = {e for e, s in sup.items() if s >= need}
        if keep == es:
            break
        es = keep
    return {e: s for e, s in supports(es).items() if s >= need}


def _synth():
    edges = set()
    for i in range(500):
        a, b = _h(f"ta{i}", 60), _h(f"tb{i}", 60)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    # handcrafted: K5 (every edge support 3 — survives k<=5), K4 minus a
    # chord (peels entirely for k=4 in two rounds), a triangle strip
    # (the +2 chords die round 1, the rails round 2 for k=4)
    k5 = list(combinations(range(100, 105), 2))
    k4_broken = [(200, 201), (200, 202), (200, 203), (201, 202), (201, 203)]
    strip = [(300 + i, 301 + i) for i in range(8)] + [
        (300 + i, 302 + i) for i in range(7)
    ]
    return sorted(edges) + k5 + k4_broken + strip


@pytest.mark.parametrize("k", [3, 4, 5])
def test_truss_matches_peeler(spark, k):
    from osm_hadoop_spark.operators.truss import k_truss

    edges = _synth()
    df = spark.createDataFrame(edges, "u long, v long")
    got = {(r.a, r.b): r.support for r in k_truss(df, k).collect()}
    assert got == _brute(edges, k)
    if k <= 5:  # K5 intact with support 3 on every edge
        assert all(got[e] == 3 for e in combinations(range(100, 105), 2))
    if k == 4:  # broken K4 and the strip peel away completely
        assert not any(200 <= a <= 203 for a, _ in got)
        assert not any(300 <= a <= 310 for a, _ in got)
    if k == 3:  # strip rails + chords all sit in >=1 triangle
        assert ((300, 301) in got) and ((300, 302) in got)


def test_truss_duplicate_and_reversed_edges_collapse(spark):
    from osm_hadoop_spark.operators.truss import k_truss

    tri = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (1, 2)]
    got = {(r.a, r.b): r.support for r in k_truss(
        spark.createDataFrame(tri, "u long, v long"), 3).collect()}
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1}


def test_truss_empty_result(spark):
    from osm_hadoop_spark.operators.truss import k_truss

    chain = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(chain, "u long, v long")
    assert k_truss(df, 3).count() == 0
