"""Personalized pagerank_int (seeds=) vs a python integer replay."""


def _replay(edges, seeds, rounds, scale=1000, dn=85, dd=100):
    sym = set()
    for u, v in edges:
        if u != v:
            sym.add((u, v))
            sym.add((v, u))
    nodes = sorted({u for u, _ in sym})
    deg = {n: sum(1 for a, _ in sym if a == n) for n in nodes}
    base = (scale * (dd - dn)) // dd
    pr = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(rounds):
        c = {n: 0 for n in nodes}
        for u, v in sym:
            c[v] += pr[u] // deg[u]
        pr = {
            n: (base if n in seeds else 0) + (dn * c[n]) // dd
            for n in nodes
        }
    return pr


def test_ppr_vs_replay(spark):
    from osm_hadoop_spark.operators.routing import pagerank_int

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (5, 6),
             (6, 4), (1, 3)]
    seeds = {0, 5}
    e = spark.createDataFrame(edges, "u: long, v: long")
    s = spark.createDataFrame([(x,) for x in sorted(seeds)], "node: long")
    got = {
        r["node"]: r["pr"]
        for r in pagerank_int(e, rounds=3, scale=1000, seeds=s).collect()
    }
    assert got == _replay(edges, seeds, 3)
    # proximity: the seed's neighbors outrank the far side of the graph
    assert got[1] > got[6] or got[4] > got[3]


def test_ppr_no_seeds_matches_global(spark):
    from osm_hadoop_spark.operators.routing import pagerank_int

    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    e = spark.createDataFrame(edges, "u: long, v: long")
    all_nodes = spark.createDataFrame([(i,) for i in range(4)], "node: long")
    g = {r["node"]: r["pr"]
         for r in pagerank_int(e, rounds=2, scale=1000).collect()}
    p = {r["node"]: r["pr"]
         for r in pagerank_int(e, rounds=2, scale=1000,
                               seeds=all_nodes).collect()}
    assert g == p  # seeding EVERY node is exactly the global run


def test_ppr_zero_far_mass_round1(spark):
    from osm_hadoop_spark.operators.routing import pagerank_int

    # a path: after 1 round, nodes 2+ hops from the seed hold 0
    edges = [(i, i + 1) for i in range(5)]
    e = spark.createDataFrame(edges, "u: long, v: long")
    s = spark.createDataFrame([(0,)], "node: long")
    got = {r["node"]: r["pr"]
           for r in pagerank_int(e, rounds=1, scale=1000, seeds=s).collect()}
    assert got[1] > 0 and got[2] == 0 and got[5] == 0
