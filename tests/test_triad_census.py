"""triad_census vs a brute all-triples classifier + per-type exemplars."""

import random
from itertools import combinations, permutations

BITS = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]
NAMES = {
    0: "003", 1: "012", 3: "102", 5: "021D", 6: "021C", 10: "021U",
    7: "111U", 11: "111D", 21: "030T", 25: "030C", 15: "201",
    23: "120U", 27: "120C", 30: "120D", 31: "210", 63: "300",
}


def _classify(arcset, tri):
    i, j, k = sorted(tri)
    nodes = (i, j, k)
    code = 0
    for b, (x, y) in enumerate(BITS):
        if (nodes[x], nodes[y]) in arcset:
            code |= 1 << b

    def recode(c, perm):
        arcs = set()
        for b, (x, y) in enumerate(BITS):
            if c >> b & 1:
                arcs.add((perm[x], perm[y]))
        out = 0
        for b, (x, y) in enumerate(BITS):
            if (x, y) in arcs:
                out |= 1 << b
        return out

    return NAMES[min(recode(code, p) for p in permutations(range(3)))]


def _brute(arcs):
    arcset = {(s, d) for s, d in arcs if s != d}
    nodes = sorted({n for e in arcset for n in e})
    out = {n: 0 for n in NAMES.values()}
    for tri in combinations(nodes, 3):
        out[_classify(arcset, tri)] += 1
    return out


def _run(spark, arcs):
    from osm_hadoop_spark.operators.graphstats import triad_census

    df = spark.createDataFrame(arcs, "u: long, v: long")
    got = {r["triad"]: r["n_triads"] for r in triad_census(df).collect()}
    want = _brute(arcs)
    assert got == want
    n = len({x for e in arcs for x in e if e[0] != e[1]})
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6
    return got


def test_exemplars_every_type(spark):
    # one hand-built 3-node exemplar per named type, padded with two
    # isolated-from-the-triple extra arcs so n > 3 exercises closed forms
    exemplars = {
        "012": [(0, 1)],
        "102": [(0, 1), (1, 0)],
        "021D": [(1, 0), (1, 2)],          # out-star from 1
        "021U": [(0, 1), (2, 1)],          # in-star into 1
        "021C": [(0, 1), (1, 2)],          # path
        "111U": [(0, 1), (1, 0), (0, 2)],  # pair sends out
        "111D": [(0, 1), (1, 0), (2, 0)],  # third sends in
        "030T": [(0, 1), (0, 2), (1, 2)],  # transitive
        "030C": [(0, 1), (1, 2), (2, 0)],  # cycle
        "201": [(0, 1), (1, 0), (0, 2), (2, 0)],
        "120U": [(0, 1), (1, 0), (0, 2), (1, 2)],
        "120D": [(0, 1), (1, 0), (2, 0), (2, 1)],
        "120C": [(0, 1), (1, 0), (0, 2), (2, 1)],
        "210": [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2)],
        "300": [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)],
    }
    for name, arcs in exemplars.items():
        got = _run(spark, arcs + [(10, 11)])
        assert got[name] >= 1, name


def test_random_vs_brute(spark):
    rng = random.Random(9)
    arcs = [tuple(rng.sample(range(13), 2)) for _ in range(40)]
    _run(spark, arcs)


def test_sparse_closed_forms_dominate(spark):
    # two disjoint arcs in a 6-node universe: mostly 003 and 012
    got = _run(spark, [(0, 1), (2, 3), (4, 5)])
    assert got["012"] == 3 * 4  # each arc with each third node
    assert got["003"] == 20 - 12
    assert sum(v for k, v in got.items() if k not in ("003", "012")) == 0
