"""Degree-structure censuses (operators/graphstats.py): brute replays,
star/clique closed forms, empty-club emission."""

import random

from osm_hadoop_spark.operators.graphstats import (
    assortativity_sums,
    rich_club_census,
)


def _canon(edges):
    return {
        (min(u, v), max(u, v)) for u, v in edges if u != v
    }


def _degrees(es):
    d = {}
    for u, v in es:
        d[u] = d.get(u, 0) + 1
        d[v] = d.get(v, 0) + 1
    return d


def test_assortativity_matches_brute(spark):
    rng = random.Random(63)
    edges = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(120)]
    df = spark.createDataFrame(edges, "u long, v long")
    r = assortativity_sums(df).collect()[0]
    es = _canon(edges)
    d = _degrees(es)
    assert r.m == len(es)
    assert r.s_xy == sum(d[u] * d[v] for u, v in es)
    assert r.s_x == sum(d[u] + d[v] for u, v in es)
    assert r.s_x2 == sum(d[u] ** 2 + d[v] ** 2 for u, v in es)


def test_star_closed_form(spark):
    # star K1,5: every edge joins degree 5 with degree 1
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "u long, v long")
    r = assortativity_sums(df).collect()[0]
    assert (r.m, r.s_xy, r.s_x, r.s_x2) == (5, 25, 30, 130)


def test_rich_club(spark):
    rng = random.Random(65)
    edges = [(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(90)]
    df = spark.createDataFrame(edges, "u long, v long")
    es = _canon(edges)
    d = _degrees(es)
    got = {
        r.k: (r.n_nodes, r.n_edges)
        for r in rich_club_census(df, (0, 3, 6, 1000)).collect()
    }
    for k in (0, 3, 6, 1000):
        nodes = {n for n, dd in d.items() if dd > k}
        ne = sum(1 for u, v in es if u in nodes and v in nodes)
        assert got[k] == (len(nodes), ne)
    assert got[1000] == (0, 0)  # empty club emitted
