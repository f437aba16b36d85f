"""Multi-source BFS hop distance (operators/routing.py) vs an
independent Python brute-force BFS (collections.deque level-order with
full (node, source) expansion — a different algorithm than the
min-label frontier propagation the operator uses)."""

import random
from collections import deque

from pyspark.sql import functions as F


def _brute_bfs(edges, sources, max_hops):
    """Per-source BFS, then reduce to (min dist, min src at that dist)."""
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    best = {}  # node -> (dist, src)
    for s in sources:
        seen = {s: 0}
        q = deque([s])
        while q:
            n = q.popleft()
            d = seen[n]
            if d >= max_hops:
                continue
            for m in adj.get(n, ()):
                if m not in seen:
                    seen[m] = d + 1
                    q.append(m)
        for n, d in seen.items():
            cur = best.get(n)
            if cur is None or (d, s) < cur:
                best[n] = (d, s)
    return {n: ds for n, ds in best.items()}


def test_bfs_hops_matches_brute_force(spark):
    from osm_hadoop_spark.operators.routing import bfs_hops

    rng = random.Random(7)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(700)]
    sources = sorted(rng.sample(range(n), 5))

    e_df = spark.createDataFrame(edges, "u: long, v: long")
    s_df = spark.createDataFrame([(s,) for s in sources], "node: long")
    got = {
        r["node"]: (r["dist"], r["src_id"])
        for r in bfs_hops(e_df, s_df, max_hops=4, src="u", dst="v").collect()
    }
    assert got == _brute_bfs(edges, sources, 4)


def test_bfs_zero_hops_and_isolated_source(spark):
    from osm_hadoop_spark.operators.routing import bfs_hops

    e_df = spark.createDataFrame([(1, 2), (2, 3)], "u: long, v: long")
    s_df = spark.createDataFrame([(9,), (1,)], "node: long")
    got = {
        r["node"]: (r["dist"], r["src_id"])
        for r in bfs_hops(e_df, s_df, max_hops=0).collect()
    }
    # max_hops=0: only the sources themselves, including the isolated one
    assert got == {9: (0, 9), 1: (0, 1)}


def test_bfs_early_termination_saturated(spark):
    from osm_hadoop_spark.operators.routing import bfs_hops

    # path graph 0-1-2; ball saturates at hop 2 << max_hops
    e_df = spark.createDataFrame([(0, 1), (1, 2)], "u: long, v: long")
    s_df = spark.createDataFrame([(0,)], "node: long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_hops(e_df, s_df, max_hops=50).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_min_source_tie_break(spark):
    from osm_hadoop_spark.operators.routing import bfs_hops

    # node 5 is 1 hop from BOTH sources 10 and 2 -> label = min(2, 10)
    e_df = spark.createDataFrame([(10, 5), (2, 5)], "u: long, v: long")
    s_df = spark.createDataFrame([(10,), (2,)], "node: long")
    row = {
        r["node"]: (r["dist"], r["src_id"])
        for r in bfs_hops(e_df, s_df, max_hops=3).collect()
    }
    assert row[5] == (1, 2)
    # sources keep their own label even though they're 2 hops apart
    assert row[10] == (0, 10) and row[2] == (0, 2)


# --- weighted SSSP (operators/routing.py::sssp) ------------------------------


def _brute_sssp(edges, sources, max_hops):
    """Hop-capped Bellman-Ford DP: dist[h][v] = min over <=h-edge paths,
    labels lexicographic (dist, src) — an independent mechanism vs the
    operator's improved-frontier rounds."""
    sym = {}
    for u, v, w in edges:
        if u == v:
            continue
        sym.setdefault(u, {})
        sym.setdefault(v, {})
        sym[u][v] = min(sym[u].get(v, w), w)
        sym[v][u] = min(sym[v].get(u, w), w)
    best = {s: (0, s) for s in sources}
    for _ in range(max_hops):
        nxt = dict(best)
        for u, (d, s) in best.items():
            for v, w in sym.get(u, {}).items():
                cand = (d + w, s)
                if v not in nxt or cand < nxt[v]:
                    nxt[v] = cand
        best = nxt
    return best


def test_sssp_matches_brute_force(spark):
    from osm_hadoop_spark.operators.routing import sssp

    rng = random.Random(11)
    n = 60
    edges = list(
        {
            (rng.randrange(n), rng.randrange(n)): None
            for _ in range(150)
        }
    )
    edges = [(u, v, rng.randrange(1, 10)) for u, v in edges]
    sources = [1, 17, 42]
    got = {
        r["node"]: (r["dist"], r["src_id"])
        for r in sssp(
            spark.createDataFrame(edges, "u: long, v: long, w: long"),
            spark.createDataFrame([(s,) for s in sources], "node: long"),
            max_hops=4,
        ).collect()
    }
    assert got == _brute_sssp(edges, sources, 4)


def test_sssp_prefers_cheap_long_path(spark):
    from osm_hadoop_spark.operators.routing import sssp

    # 0-1-2-3 each weight 1, plus a direct 0-3 of weight 10: the 3-hop
    # path (dist 3) must beat the 1-hop shortcut found in round 1.
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10)]
    got = {
        r["node"]: (r["dist"], r["src_id"])
        for r in sssp(
            spark.createDataFrame(edges, "u: long, v: long, w: long"),
            spark.createDataFrame([(0,)], "node: long"),
            max_hops=3,
        ).collect()
    }
    assert got == {0: (0, 0), 1: (1, 0), 2: (2, 0), 3: (3, 0)}


def test_sssp_hop_cap_is_edge_count(spark):
    from osm_hadoop_spark.operators.routing import sssp

    # with max_hops=1 only the shortcut is reachable
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10)]
    got = {
        r["node"]: r["dist"]
        for r in sssp(
            spark.createDataFrame(edges, "u: long, v: long, w: long"),
            spark.createDataFrame([(0,)], "node: long"),
            max_hops=1,
        ).collect()
    }
    assert got == {0: 0, 1: 1, 3: 10}


def test_sssp_equal_dist_takes_min_source(spark):
    from osm_hadoop_spark.operators.routing import sssp

    # node 2 is distance 2 from both sources 1 and 3 -> label 1
    edges = [(1, 2, 2), (3, 2, 2)]
    got = {
        r["node"]: (r["dist"], r["src_id"])
        for r in sssp(
            spark.createDataFrame(edges, "u: long, v: long, w: long"),
            spark.createDataFrame([(1,), (3,)], "node: long"),
            max_hops=2,
        ).collect()
    }
    assert got[2] == (2, 1)


def test_pagerank_int_vs_python(spark):
    """pagerank_int must equal an independent dict-based integer power
    iteration on a handcrafted graph (hub, chain, triangle, isolated
    pair), and the total-mass bound must hold each output is
    deterministic integer arithmetic."""
    from osm_hadoop_spark.operators.routing import pagerank_int

    raw = [
        (1, 2), (1, 3), (1, 4), (1, 5),      # hub at 1
        (5, 6), (6, 7),                      # chain
        (10, 11), (11, 12), (12, 10),        # triangle
        (20, 21),                            # isolated pair
        (2, 2),                              # self-loop (dropped)
        (3, 1),                              # reverse duplicate (dedup)
    ]
    edges = spark.createDataFrame(raw, "u long, v long")
    rounds, scale, dn, dd = 3, 1_000_000, 85, 100

    adj = {}
    for u, v in raw:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    base = (scale * (dd - dn)) // dd
    pr = {n: scale for n in adj}
    for _ in range(rounds):
        contrib = {n: 0 for n in adj}
        for u, nbrs in adj.items():
            share = pr[u] // len(nbrs)
            for v in nbrs:
                contrib[v] += share
        pr = {n: base + (dn * contrib[n]) // dd for n in adj}

    got = {
        r["node"]: r["pr"]
        for r in pagerank_int(edges, rounds=rounds, scale=scale).collect()
    }
    assert got == pr
    # symmetry inside the triangle, hub dominance, and positive floor
    assert got[10] == got[11] == got[12]
    assert got[1] == max(got.values())
    assert min(got.values()) >= base


# --- temporal earliest arrival ----------------------------------------------


def _brute_ea(edges, seeds, rounds):
    ea = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(ea)
        for u, v, t in edges:
            if u in ea and t >= ea[u] and t < nxt.get(v, 1 << 60):
                nxt[v] = t
        ea = nxt
    return ea


def test_temporal_ea_matches_brute(spark):
    import hashlib

    from osm_hadoop_spark.operators.routing import temporal_earliest_arrival

    def h(s, m):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m

    edges = [
        (h(f"tu{i}", 60), h(f"tv{i}", 60), h(f"tt{i}", 50) + 1)
        for i in range(400)
    ]
    # crafted: an increasing chain from seed 0 (fully reachable), the
    # same chain with a time INVERSION (blocked past it — the property
    # static BFS gets wrong), an equal-time pair (passable, 2 rounds)
    edges += [(100, 101, 10), (101, 102, 20), (102, 103, 30)]
    edges += [(100, 111, 10), (111, 112, 5), (112, 113, 30)]
    edges += [(100, 121, 7), (121, 122, 7)]
    seeds = [0, 100]
    df = spark.createDataFrame(edges, "u long, v long, t long")
    sf = spark.createDataFrame([(s,) for s in seeds], "node long")
    for rounds in (1, 4):
        got = {
            r["node"]: r["ea"]
            for r in temporal_earliest_arrival(df, sf, rounds).collect()
        }
        assert got == _brute_ea(edges, seeds, rounds)
    got4 = _brute_ea(edges, seeds, 4)
    assert got4[103] == 30          # increasing chain flows through
    assert 113 not in got4          # inversion blocks: 5 < arrival 10
    assert got4[111] == 10
    assert got4[122] == 7           # equal times pass (non-decreasing)
    # a static BFS would have claimed 113 reachable — pin the divergence
    assert 113 in {v for _, v, _ in edges}


def test_temporal_ea_is_monotone_in_rounds(spark):
    import hashlib

    from osm_hadoop_spark.operators.routing import temporal_earliest_arrival

    def h(s, m):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m

    edges = [
        (h(f"mu{i}", 30), h(f"mv{i}", 30), h(f"mt{i}", 40) + 1)
        for i in range(150)
    ]
    df = spark.createDataFrame(edges, "u long, v long, t long")
    sf = spark.createDataFrame([(1,), (2,)], "node long")
    prev = None
    for rounds in (1, 2, 3):
        got = {
            r["node"]: r["ea"]
            for r in temporal_earliest_arrival(df, sf, rounds).collect()
        }
        if prev is not None:
            assert set(prev) <= set(got)
            for n, v in prev.items():
                assert got[n] <= v
        prev = got
