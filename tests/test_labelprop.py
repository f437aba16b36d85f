"""Label propagation (routing.py::label_propagation).

Brute force is a literal synchronous dict-based round loop with the
same self-vote + (max count, min label) rule. Crafted graph: two
4-cliques joined by one bridge edge — LPA must converge each clique to
its minimum node id and keep the two communities distinct; plus a path
(labels flow from the low end) and round-count semantics (round 1 vs
round 3 differ on the path — pinning SYNCHRONOUS updates).
"""

from __future__ import annotations

from itertools import combinations

from osm_hadoop_spark.operators.routing import label_propagation


def _clique(ns):
    return list(combinations(ns, 2))

EDGES = (
    _clique([1, 2, 3, 4]) + _clique([10, 11, 12, 13]) + [(4, 10)]
    + [(20, 21), (21, 22), (22, 23), (23, 24)]  # path
)


def _brute(edges, rounds):
    nbr = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    lbl = {n: n for n in nbr}
    for _ in range(rounds):
        new = {}
        for n in nbr:
            votes = {}
            for m in nbr[n] | {n}:
                votes[lbl[m]] = votes.get(lbl[m], 0) + 1
            new[n] = min(votes, key=lambda l: (-votes[l], l))
        lbl = new
    return lbl


def test_labelprop_matches_brute(spark):
    df = spark.createDataFrame(EDGES, "u long, v long")
    for rounds in (1, 3):
        got = {
            r["node"]: r["community"]
            for r in label_propagation(df, rounds=rounds).collect()
        }
        assert got == _brute(EDGES, rounds), rounds


def test_labelprop_cliques_converge(spark):
    df = spark.createDataFrame(EDGES, "u long, v long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, rounds=3).collect()
    }
    assert {got[n] for n in (1, 2, 3, 4)} == {1}
    assert {got[n] for n in (11, 12, 13)} == {10}
    # the two cliques never merge through the bridge
    assert got[1] != got[11]


def test_labelprop_rounds_differ_on_path(spark):
    df = spark.createDataFrame(EDGES, "u long, v long")
    r1 = {r["node"]: r["community"]
          for r in label_propagation(df, rounds=1).collect()}
    r3 = {r["node"]: r["community"]
          for r in label_propagation(df, rounds=3).collect()}
    # label 20 reaches node 22 only after >1 synchronous rounds
    assert r1[22] != 20 and r3[22] == 20
