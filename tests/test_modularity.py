"""modularity_census vs brute counting + closed-form partitions."""

import random

from pyspark.sql import functions as F


def _brute(edges, labels):
    canon = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    deg = {}
    for u, v in canon:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    out = {}
    for n, c in labels.items():
        r = out.setdefault(c, [0, 0, 0])
        r[0] += 1
        r[2] += deg.get(n, 0)
    for u, v in canon:
        if labels[u] == labels[v]:
            out[labels[u]][1] += 1
    return {c: tuple(r) for c, r in out.items()}


def _run(spark, edges, labels):
    from osm_hadoop_spark.operators.graphstats import modularity_census

    e = spark.createDataFrame(edges, "u: long, v: long")
    ldf = spark.createDataFrame(
        list(labels.items()), "node: long, community: long"
    )
    got = {
        r["community"]: (r["n_nodes"], r["e_in"], r["deg_sum"])
        for r in modularity_census(e, ldf).collect()
    }
    assert got == _brute(edges, labels)
    # identities: sum deg_sum = 2m, sum e_in <= m
    m = len({(min(u, v), max(u, v)) for u, v in edges if u != v})
    assert sum(v[2] for v in got.values()) == 2 * m
    assert sum(v[1] for v in got.values()) <= m
    return got


def test_two_cliques(spark):
    # two 4-cliques joined by one edge, labeled by clique: Q near-optimal
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges.append((3, 10))
    labels = {n: 0 for n in range(4)}
    labels.update({n: 1 for n in range(10, 14)})
    got = _run(spark, edges, labels)
    assert got[0] == (4, 6, 13)  # node 3 carries the cross edge
    assert got[1] == (4, 6, 13)


def test_single_community_closed_form(spark):
    # everything one community: e_in = m, deg_sum = 2m -> Q = 0
    edges = [(i, (i + 1) % 7) for i in range(7)]
    labels = {n: 42 for n in range(7)}
    got = _run(spark, edges, labels)
    assert got[42] == (7, 7, 14)


def test_random_vs_brute(spark):
    rng = random.Random(17)
    edges = [tuple(rng.sample(range(30), 2)) for _ in range(90)]
    labels = {n: n % 4 for n in range(30)}
    _run(spark, edges, labels)


def test_isolated_community_emits(spark):
    # a labeled node with no edges still appears (n_nodes=1, 0, 0)
    edges = [(1, 2)]
    labels = {1: 0, 2: 0, 99: 7}
    got = _run(spark, edges, labels)
    assert got[7] == (1, 0, 0)
