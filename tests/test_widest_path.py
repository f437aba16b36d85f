"""widest_path vs brute bounded-hop maximin enumeration."""

import itertools
import random

CAP = 1 << 62


def _brute(edges, sources, h):
    adj = {}
    for u, v, w in edges:
        if u != v:
            adj.setdefault(u, []).append((v, w))
            adj.setdefault(v, []).append((u, w))
    best = {s: CAP for s in sources}
    frontier = {s: CAP for s in sources}
    for _ in range(h):
        nxt = {}
        for u, wu in list(best.items()):
            for v, w in adj.get(u, ()):
                cand = min(wu, w)
                if cand > nxt.get(v, -1):
                    nxt[v] = cand
        for v, w in nxt.items():
            if w > best.get(v, -1):
                best[v] = w
        # bounded-hop Bellman-Ford: relax from full best each round
    return best


def _brute_paths(edges, sources, h):
    # independent check: enumerate ALL simple-ish paths up to h hops
    adj = {}
    for u, v, w in edges:
        if u != v:
            adj.setdefault(u, []).append((v, w))
            adj.setdefault(v, []).append((u, w))
    best = {}
    for s in sources:
        stack = [(s, CAP, 0)]
        while stack:
            n, w, d = stack.pop()
            if w > best.get(n, -1):
                best[n] = w
            if d < h:
                for v, ew in adj.get(n, ()):
                    stack.append((v, min(w, ew), d + 1))
    return best


def _run(spark, edges, sources, h):
    from osm_hadoop_spark.operators.routing import widest_path

    e = spark.createDataFrame(edges, "u: long, v: long, w: long")
    s = spark.createDataFrame([(x,) for x in sources], "node: long")
    got = {r["node"]: r["width"]
           for r in widest_path(e, s, max_hops=h).collect()}
    assert got == _brute(edges, sources, h)
    assert got == _brute_paths(edges, sources, h)
    return got


def test_two_route_bottleneck(spark):
    # wide-but-long vs narrow-but-short route to node 3
    edges = [(0, 1, 9), (1, 2, 9), (2, 3, 9), (0, 3, 4)]
    assert _run(spark, edges, [0], 1)[3] == 4
    assert _run(spark, edges, [0], 3)[3] == 9


def test_multi_source_and_unreached(spark):
    edges = [(0, 1, 5), (10, 11, 7), (20, 21, 1)]
    got = _run(spark, edges, [0, 10], 2)
    assert got[1] == 5 and got[11] == 7
    assert 20 not in got and 21 not in got


def test_random_vs_both_brutes(spark):
    rng = random.Random(12)
    edges = []
    for _ in range(60):
        u, v = rng.sample(range(18), 2)
        edges.append((u, v, rng.randint(1, 9)))
    for h in (1, 2, 4):
        _run(spark, edges, [0, 7], h)
