"""Luby MIS (operators/mis.py) vs the sequential greedy it must equal."""

from __future__ import annotations

import hashlib
from collections import defaultdict


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _greedy(edges):
    """Sequential greedy MIS in (h60 priority, id) order — the exact set
    the parallel local-minimum rule must produce."""
    adj = defaultdict(set)
    nodes = set()
    for u, v in edges:
        if u != v:
            nodes.update((u, v))
            adj[u].add(v)
            adj[v].add(u)
    mis, blocked = set(), set()
    for u in sorted(nodes, key=lambda n: (_h60(f"mp{n}"), n)):
        if u not in blocked:
            mis.add(u)
            blocked |= adj[u] | {u}
    return {u: u in mis for u in nodes}


def _synth():
    edges = set()
    for i in range(500):
        u, v = _h60(f"mu{i}") % 70, _h60(f"mv{i}") % 70
        if u != v:
            edges.add((min(u, v), max(u, v)))
    # planted: a star (center blocked or blocker), a path, a K4
    star = [(100, 100 + i) for i in range(1, 8)]
    path = [(200 + i, 201 + i) for i in range(9)]
    k4 = [(300, 301), (300, 302), (300, 303), (301, 302), (301, 303),
          (302, 303)]
    return sorted(edges) + star + path + k4


def test_mis_equals_sequential_greedy(spark):
    from osm_hadoop_spark.operators.mis import luby_mis

    edges = _synth()
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.in_mis for r in luby_mis(df).collect()}
    assert got == _greedy(edges)


def test_mis_is_independent_and_maximal(spark):
    from osm_hadoop_spark.operators.mis import luby_mis

    edges = _synth()
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.in_mis for r in luby_mis(df).collect()}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    ins = {n for n, f in got.items() if f}
    assert not any(v in ins for u in ins for v in adj[u])      # independent
    assert all(adj[n] & ins for n in got if n not in ins)       # maximal
    # exactly one K4 member selected
    assert sum(1 for n in (300, 301, 302, 303) if n in ins) == 1
