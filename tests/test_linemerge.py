"""Chain merging (operators/linemerge.py): union-find brute + crafted
topology — a 6-way chain, a Y junction (degree 3 breaks chains), a
3-way closed cycle (all nodes degree 2: one cyclic chain), a self-loop
way (degree-2 node but both ends its own: singleton), an isolated way,
and two ways connected at BOTH endpoints (parallel pair: one chain)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from osm_hadoop_spark.operators.linemerge import merge_chains


def _brute(ways):
    node_ways = defaultdict(list)
    for wid, na, nb, _ in ways:
        node_ways[na].append(wid)
        node_ways[nb].append(wid)
    parent = {wid: wid for wid, *_ in ways}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for node, ws in node_ways.items():
        if len(ws) == 2 and ws[0] != ws[1]:
            union(ws[0], ws[1])
    chains = defaultdict(lambda: [0, 0])
    for wid, _, _, ln in ways:
        # canonical min-id label needs full compression
        r = find(wid)
        while parent[r] != r:
            r = find(r)
        chains[r][0] += 1
        chains[r][1] += ln
    # min-id relabel (union by min above already guarantees it)
    return {c: (n, t) for c, (n, t) in chains.items()}


def _ways():
    def h(s, m):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m

    ways = [
        (i, h(f"lna{i}", 260), h(f"lnb{i}", 260), h(f"lle{i}", 100) + 1)
        for i in range(500)
    ]
    # crafted on reserved node ids >= 1000 and way ids >= 9000
    ways += [(9000 + j, 1000 + j, 1001 + j, 10) for j in range(6)]  # chain
    ways += [
        (9100, 1100, 1101, 5),  # Y: three ways meet at node 1101
        (9101, 1101, 1102, 5),
        (9102, 1101, 1103, 5),
    ]
    ways += [
        (9200, 1200, 1201, 7),  # closed triangle
        (9201, 1201, 1202, 7),
        (9202, 1202, 1200, 7),
    ]
    ways += [(9300, 1300, 1300, 3)]  # self-loop
    ways += [(9400, 1400, 1401, 2)]  # isolated
    ways += [(9500, 1500, 1501, 4), (9501, 1500, 1501, 4)]  # parallel pair
    return ways


def test_merge_chains_matches_union_find(spark):
    ways = _ways()
    df = spark.createDataFrame(ways, "way_id long, na long, nb long, len long")
    got = {
        r["chain_id"]: (r["n_ways"], r["total_len"])
        for r in merge_chains(df).collect()
    }
    want = _brute(ways)
    assert got == want
    # crafted topology behaved
    assert got[9000] == (6, 60)          # the 6-way chain merged
    assert got[9200] == (3, 21)          # the cycle is one chain
    assert got[9300] == (1, 3)           # self-loop stays singleton
    assert got[9400] == (1, 2)           # isolated stays singleton
    assert got[9500] == (2, 8)           # parallel pair merged
    # the Y junction: node 1101 has degree 3, so NO pair merges there;
    # 9100's other end (1100) is degree 1 -> all three stay singleton
    assert got[9100] == (1, 5) and got[9101] == (1, 5) and got[9102] == (1, 5)
    # hash-noise part produced real multi-way chains too
    assert max(n for c, (n, _) in got.items() if c < 9000) >= 3
