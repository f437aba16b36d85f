"""Way noding (operators/noding.py) vs an explicit per-way splitter."""

from __future__ import annotations

import hashlib

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _synth():
    rows = []
    for w in range(40):
        n = 2 + _h(f"len{w}", 7)
        for i in range(n):
            rows.append((w, i, _h(f"nd{w}_{i}", 60)))  # 60 nodes -> shared often
    # handcrafted: single-vertex way (no edges), way passing through a
    # junction twice (self-junction), two ways sharing an interior node,
    # way whose every node is a junction
    rows += [(100, 0, 900)]
    rows += [(101, 0, 901), (101, 1, 902), (101, 2, 903), (101, 3, 902), (101, 4, 904)]
    rows += [(102, 0, 910), (102, 1, 911), (102, 2, 912)]
    rows += [(103, 0, 920), (103, 1, 911), (103, 2, 921)]
    rows += [(104, 0, 910), (104, 1, 912)]
    return rows


def _brute(rows):
    from collections import Counter

    usage = Counter(nd for _, _, nd in rows)
    ways: dict[int, list] = {}
    for w, i, nd in rows:
        ways.setdefault(w, []).append((i, nd))
    out = {}
    for w, vs in ways.items():
        vs.sort()
        nodes = [nd for _, nd in vs]
        if len(nodes) < 2:
            continue
        bounds = [
            i
            for i in range(len(nodes))
            if i in (0, len(nodes) - 1) or usage[nodes[i]] >= 2
        ]
        for j in range(len(bounds) - 1):
            a, b = bounds[j], bounds[j + 1]
            out[(w, j)] = (nodes[a], nodes[b], b - a)
    return out


def test_noding_matches_brute(spark):
    from osm_hadoop_spark.operators.noding import node_ways

    rows = _synth()
    df = spark.createDataFrame(rows, "way_id long, ordinal int, node_id long")
    got = {
        (r.way_id, r.edge_idx): (r.from_node, r.to_node, r.n_segments)
        for r in node_ways(df).collect()
    }
    want = _brute(rows)
    assert got == want
    # the handcrafted cases exercise what they claim
    assert not any(w == 100 for w, _ in got)            # degenerate way
    assert got[(101, 0)][1] == 902 and got[(101, 1)][0] == 902  # self-junction
    assert (103, 1) in got                               # shared interior node
    # every multi-edge way chains: edge i's to_node == edge i+1's from_node
    for (w, j), (_, to_n, _) in got.items():
        if (w, j + 1) in got:
            assert got[(w, j + 1)][0] == to_n


def test_noding_segment_conservation(spark):
    """Sum of n_segments per way == n_vertices - 1 (nothing lost/duplicated)."""
    from osm_hadoop_spark.operators.noding import node_ways

    rows = _synth()
    df = spark.createDataFrame(rows, "way_id long, ordinal int, node_id long")
    per_way: dict[int, int] = {}
    for r in node_ways(df).collect():
        per_way[r.way_id] = per_way.get(r.way_id, 0) + r.n_segments
    from collections import Counter

    n_vertices = Counter(w for w, _, _ in rows)
    for w, total in per_way.items():
        assert total == n_vertices[w] - 1
