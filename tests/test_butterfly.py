"""Butterfly census (operators/butterfly.py) vs an itertools brute."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from itertools import combinations


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _brute(edges):
    nbr = defaultdict(set)
    for u, r in edges:
        nbr[u].add(r)
    lefts = sorted(nbr)
    bf = wedges = pairs = 0
    for u1, u2 in combinations(lefts, 2):
        w = len(nbr[u1] & nbr[u2])
        if w:
            pairs += 1
            wedges += w
            bf += w * (w - 1) // 2
    return bf, wedges, pairs


def _synth():
    edges = {(_h(f"bu{i}", 30), _h(f"bp{i}", 40)) for i in range(400)}
    # planted K(2,2): exactly one butterfly among fresh vertices
    edges |= {(100, 200), (100, 201), (101, 200), (101, 201)}
    # a K(2,3) adds C(3,2)=3 butterflies
    edges |= {(110, 210), (110, 211), (110, 212),
              (111, 210), (111, 211), (111, 212)}
    return sorted(edges)


def test_butterfly_matches_brute(spark):
    from osm_hadoop_spark.operators.butterfly import butterfly_census

    edges = _synth()
    df = spark.createDataFrame(edges, "u long, p long")
    row = butterfly_census(df).collect()[0]
    bf, wedges, pairs = _brute(edges)
    assert (row.n_butterflies, row.n_wedges, row.n_pairs) == (bf, wedges, pairs)
    assert bf >= 4  # the planted K22 + K23 alone contribute 1 + 3


def test_butterfly_cap_removes_hub(spark):
    from osm_hadoop_spark.operators.butterfly import butterfly_census

    # hub right-vertex 999 touches everyone; capped away, only the K22
    # butterfly remains
    edges = [(u, 999) for u in range(20)]
    edges += [(1, 7), (1, 8), (2, 7), (2, 8)]
    df = spark.createDataFrame(edges, "u long, p long")
    full = butterfly_census(df).collect()[0]
    capped = butterfly_census(df, right_cap=5).collect()[0]
    assert full.n_butterflies > capped.n_butterflies
    assert (capped.n_butterflies, capped.n_pairs) == (1, 1)
