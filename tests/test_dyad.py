"""dyad_census vs brute direction counting."""

import random


def _brute(arcs):
    a = {(s, d) for s, d in arcs if s != d}
    pairs = {}
    for s, d in a:
        pairs[(min(s, d), max(s, d))] = pairs.get((min(s, d), max(s, d)), 0) + 1
    nodes = {n for e in a for n in e}
    n = len(nodes)
    mutual = sum(1 for c in pairs.values() if c == 2)
    asym = sum(1 for c in pairs.values() if c == 1)
    return (n, len(a), mutual, asym, n * (n - 1) // 2 - mutual - asym)


def _run(spark, arcs):
    from osm_hadoop_spark.operators.graphstats import dyad_census

    df = spark.createDataFrame(arcs, "u: long, v: long")
    r = dyad_census(df).collect()[0]
    got = (r["n_nodes"], r["n_arcs"], r["mutual"], r["asym"], r["nulls"])
    assert got == _brute(arcs)
    return got


def test_closed_forms(spark):
    # 2-cycle = one mutual dyad; chain of 3 = two asym; nulls fill C(n,2)
    got = _run(spark, [(1, 2), (2, 1), (2, 3), (3, 4)])
    assert got == (4, 4, 1, 2, 3)


def test_dups_self_loops(spark):
    got = _run(spark, [(1, 2), (1, 2), (2, 2), (2, 1)])
    assert got == (2, 2, 1, 0, 0)


def test_random_vs_brute(spark):
    rng = random.Random(8)
    arcs = [tuple(rng.sample(range(25), 2)) for _ in range(150)]
    _run(spark, arcs)
