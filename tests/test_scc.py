"""SCC via doubling closure (operators/scc.py) vs a brute mutual-reach."""

from __future__ import annotations

import hashlib
from collections import defaultdict


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _brute(edges):
    adj = defaultdict(set)
    nodes = set()
    for s, d in edges:
        nodes.update((s, d))
        if s != d:
            adj[s].add(d)

    def reach(u):
        seen, stack = {u}, [u]
        while stack:
            for w in adj[stack.pop()]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        return seen

    r = {u: reach(u) for u in nodes}
    return {u: min([u] + [v for v in r[u] if u in r[v]]) for u in nodes}


def _synth():
    edges = set()
    for i in range(300):
        s, d = _h(f"ss{i}", 50), _h(f"sd{i}", 50)
        if s != d:
            edges.add((s, d))
    ring = [(100 + i, 100 + (i + 1) % 6) for i in range(6)]       # one SCC
    chain = [(200 + i, 201 + i) for i in range(5)]                 # singletons
    two = [(300, 301), (301, 300)]                                 # 2-cycle
    merged = ring + [(100, 400), (400, 401), (401, 400), (401, 100)]
    return sorted(edges) + ring + chain + two + merged


def test_scc_matches_brute(spark):
    from osm_hadoop_spark.operators.scc import strongly_connected_components

    edges = _synth()
    df = spark.createDataFrame(edges, "s long, d long")
    got = {r.node: r.scc_id
           for r in strongly_connected_components(df).collect()}
    assert got == _brute(edges)
    # planted structure: the ring + the back-edged pair are ONE component
    assert {got[100 + i] for i in range(6)} == {100}
    assert got[400] == got[401] == 100
    assert all(got[200 + i] == 200 + i for i in range(6))
    assert got[300] == got[301] == 300


def test_scc_self_loop_and_dag(spark):
    from osm_hadoop_spark.operators.scc import strongly_connected_components

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (1, 3)], "s long, d long"
    )
    got = {r.node: r.scc_id
           for r in strongly_connected_components(df).collect()}
    assert got == {1: 1, 2: 2, 3: 3}
