"""single_linkage_cut vs brute threshold components."""

import random


def _brute(edges, nodes, t):
    adj = {}
    for u, v, w in edges:
        if u != v and w <= t:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    label = {}
    for s in sorted(nodes):
        if s in label:
            continue
        comp = {s}
        stack = [s]
        while stack:
            n = stack.pop()
            for m in adj.get(n, ()):
                if m not in comp:
                    comp.add(m)
                    stack.append(m)
        root = min(comp)
        for n in comp:
            label.setdefault(n, root)
    return label


def _run(spark, edges, nodes, t):
    from osm_hadoop_spark.operators.linkage import single_linkage_cut

    e = spark.createDataFrame(edges, "u: long, v: long, w: long")
    n = spark.createDataFrame([(x,) for x in nodes], "id: long")
    got = {
        r["id"]: r["cluster"]
        for r in single_linkage_cut(e, n, t).collect()
    }
    assert got == _brute(edges, nodes, t)
    return got


def test_threshold_ladder_monotone(spark):
    rng = random.Random(3)
    nodes = list(range(40))
    edges = []
    for _ in range(120):
        u, v = rng.sample(nodes, 2)
        edges.append((u, v, rng.randint(1, 100)))
    prev = None
    for t in (0, 10, 35, 60, 100):
        got = _run(spark, edges, nodes, t)
        k = len(set(got.values()))
        if prev is not None:
            assert k <= prev  # raising the cut only merges
        prev = k


def test_isolated_nodes_singletons(spark):
    got = _run(spark, [(1, 2, 5)], [1, 2, 7, 9], 10)
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_cut_equals_full_graph_components(spark):
    # the MSF route must agree with direct thresholding even when the
    # graph has many parallel/cyclic heavy edges the forest drops
    edges = [(0, 1, 1), (1, 2, 1), (0, 2, 99), (2, 3, 50), (3, 4, 2),
             (4, 2, 49), (5, 6, 100)]
    for t in (1, 2, 49, 50, 99, 100):
        _run(spark, edges, list(range(7)), t)
