"""Triangle enumeration (operators/triangles.py) vs an itertools brute
force, plus degeneracy (duplicate / reversed / self-loop edges) and the
each-triangle-once guarantee."""

import random
from itertools import combinations


def _brute(edges):
    adj = set()
    for u, v in edges:
        if u != v:
            adj.add((min(u, v), max(u, v)))
    nodes = sorted({n for e in adj for n in e})
    return {
        (x, y, z)
        for x, y, z in combinations(nodes, 3)
        if (x, y) in adj and (y, z) in adj and (x, z) in adj
    }


def test_triangles_match_brute_force(spark):
    from osm_hadoop_spark.operators.triangles import triangles

    rng = random.Random(7)
    n = 40
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(220)]
    rows = triangles(
        spark.createDataFrame(edges, "u: long, v: long")
    ).collect()
    got = [(r["x"], r["y"], r["z"]) for r in rows]
    assert len(got) == len(set(got)), "a triangle was emitted twice"
    assert set(got) == _brute(edges)
    assert len(_brute(edges)) > 10, "test graph too sparse to mean anything"


def test_triangles_ignore_duplicates_and_loops(spark):
    from osm_hadoop_spark.operators.triangles import triangles

    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3), (3, 3), (1, 1)]
    rows = triangles(
        spark.createDataFrame(edges, "u: long, v: long")
    ).collect()
    assert [(r["x"], r["y"], r["z"]) for r in rows] == [(1, 2, 3)]


def test_triangles_skewed_hub(spark):
    from osm_hadoop_spark.operators.triangles import triangles

    # star (hub 0) carries no triangle; one fan pair is closed
    edges = [(0, i) for i in range(1, 30)] + [(5, 6)]
    rows = triangles(
        spark.createDataFrame(edges, "u: long, v: long")
    ).collect()
    assert [(r["x"], r["y"], r["z"]) for r in rows] == [(0, 5, 6)]


def test_clustering_coefficients(spark):
    """cc on a hand graph: K4 plus a pendant and a path."""
    from osm_hadoop_spark.operators.triangles import clustering_coefficients

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["u"]: (r["deg"], r["tri"], r["cc_q"]) for r in
           clustering_coefficients(df).collect()}
    # K4 interior nodes: deg 3, 3 triangles, cc = 1
    for u in range(3):
        assert got[u] == (3, 3, 1024)
    # node 3: deg 4 (K4 + pendant), still 3 triangles -> cc = 3/6
    assert got[3] == (4, 3, 512)
    # path interior nodes: deg 2, no triangle
    assert got[10] == (2, 0, 0)
    assert got[11] == (2, 0, 0)
    # degree-1 nodes excluded
    assert 12 not in got and len(got) == 6
