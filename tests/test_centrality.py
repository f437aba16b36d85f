"""Stress centrality (operators/centrality.py): sigma-BFS vs an
independent Python path counter, the Brandes level-sum identity
(total stress = sum over pairs of sigma_st * (d_st - 1)), and known
closed-form graphs."""

from collections import deque

from osm_hadoop_spark.operators.centrality import bfs_sigma, stress_centrality


def _brute_sigma(adj, s, H):
    dist, sig = {s: 0}, {s: 1}
    q = deque([s])
    while q:
        u = q.popleft()
        if dist[u] == H:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                sig[v] = 0
                q.append(v)
            if dist[v] == dist[u] + 1:
                sig[v] += sig[u]
    return dist, sig


def _mk(spark, base):
    edges = sorted(set(base) | {(v, u) for u, v in base})
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    return spark.createDataFrame(edges, "u long, v long"), adj


def test_bfs_sigma_matches_brute(spark):
    base = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (2, 8), (3, 7)]
    df, adj = _mk(spark, base)
    srcs = spark.createDataFrame([(0,), (3,), (6,)], "node long")
    got = {(r.s, r.node): (r.dist, r.sigma)
           for r in bfs_sigma(df, srcs, 4).collect()}
    want = {}
    for s in (0, 3, 6):
        dist, sig = _brute_sigma(adj, s, 4)
        for v, d in dist.items():
            want[(s, v)] = (d, sig[v])
    assert got == want


def test_stress_known_graphs(spark):
    # path 1-2-3-4: the unique shortest 1->4 path crosses 2 and 3
    df, _ = _mk(spark, [(1, 2), (2, 3), (3, 4)])
    s = spark.createDataFrame([(1,)], "node long")
    t = spark.createDataFrame([(4,)], "node long")
    got = {r.node: (r.stress, r.n_pairs)
           for r in stress_centrality(df, s, t, 3).collect()}
    assert got == {2: (1, 1), 3: (1, 1)}
    # diamond 1-2-4 / 1-3-4: two shortest paths, one through each middle
    df, _ = _mk(spark, [(1, 2), (2, 4), (1, 3), (3, 4)])
    got = {r.node: (r.stress, r.n_pairs)
           for r in stress_centrality(df, s, t, 3).collect()}
    assert got == {2: (1, 1), 3: (1, 1)}


def test_total_stress_identity(spark):
    # sum_v stress(v) = sum over counted pairs of sigma_st * (d_st - 1):
    # each of the sigma_st shortest paths contributes its d_st - 1
    # interior nodes exactly once (Brandes' counting identity)
    base = [(i, (i + 1) % 12) for i in range(12)] + [
        (0, 6), (1, 7), (3, 9), (2, 10), (4, 8),
    ]
    df, adj = _mk(spark, base)
    H = 4
    S = [0, 5, 9]
    T = [2, 7, 11]
    s = spark.createDataFrame([(x,) for x in S], "node long")
    t = spark.createDataFrame([(x,) for x in T], "node long")
    total = sum(r.stress for r in stress_centrality(df, s, t, H).collect())
    want = 0
    for a in S:
        dist, sig = _brute_sigma(adj, a, H)
        for b in T:
            if b != a and b in dist and dist[b] >= 1:
                want += sig[b] * (dist[b] - 1)
    assert total == want and want > 0
