"""4-clique enumeration (operators/triangles.py): brute replay on
random graphs, K5 closed form, once-only emission."""

import itertools
import random

from osm_hadoop_spark.operators.triangles import four_cliques


def _brute(edges):
    es = set()
    nodes = set()
    for u, v in edges:
        if u != v:
            es.add((min(u, v), max(u, v)))
            nodes.update((u, v))
    out = []
    for quad in itertools.combinations(sorted(nodes), 4):
        if all(
            (a, b) in es for a, b in itertools.combinations(quad, 2)
        ):
            out.append(quad)
    return sorted(out)


def test_k5_closed_form(spark):
    edges = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = sorted(tuple(r) for r in four_cliques(df).collect())
    assert got == _brute(edges)
    assert len(got) == 5  # C(5,4)


def test_matches_brute_random(spark):
    rng = random.Random(41)
    edges = [
        (rng.randint(0, 25), rng.randint(0, 25)) for _ in range(160)
    ]
    df = spark.createDataFrame(edges, "u long, v long")
    got = sorted(tuple(r) for r in four_cliques(df).collect())
    want = _brute(edges)
    assert got == want
    assert len(got) == len(set(got))  # once-only emission


def test_no_clique(spark):
    # cycle of length 6: triangles absent, let alone 4-cliques
    edges = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(edges, "u long, v long")
    assert four_cliques(df).count() == 0
