"""Common-neighbor link prediction (operators/linkpred.py).

Brute force with Python neighbor sets on a crafted graph exercising:
a triangle (all adjacent -> no candidates inside), a square (diagonals
are the candidates), a hub star (every leaf pair shares the hub), a
directed duplicate edge (symmetrization dedup), and a self-loop
(dropped). The degree-cap variant is pinned against a capped brute
force — hub-mediated pairs disappear, others survive.
"""

from __future__ import annotations

from itertools import combinations

from osm_hadoop_spark.operators.linkpred import common_neighbor_scores

# triangle 1-2-3; square 10-11-12-13; hub 20 with leaves 21..24;
# bridge 3-10; directed dup (1,2)+(2,1); self-loop (5,5)
EDGES = [
    (1, 2), (2, 3), (3, 1), (2, 1),
    (10, 11), (11, 12), (12, 13), (13, 10),
    (20, 21), (20, 22), (20, 23), (20, 24),
    (3, 10),
    (5, 5),
]


def _brute(edges, cap=None):
    nbr = {}
    for a, b in edges:
        if a == b:
            continue
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    out = {}
    for a, b in combinations(sorted(nbr), 2):
        if b in nbr[a]:
            continue
        common = nbr[a] & nbr[b]
        if cap is not None:
            common = {w for w in common if len(nbr[w]) <= cap}
        if common:
            out[(a, b)] = (len(common), len(nbr[a]), len(nbr[b]))
    return out


def test_linkpred_matches_brute(spark):
    df = spark.createDataFrame(EDGES, "u long, v long")
    got = {
        (r["a"], r["b"]): (r["cn"], r["deg_a"], r["deg_b"])
        for r in common_neighbor_scores(df).collect()
    }
    want = _brute(EDGES)
    assert got == want
    # square diagonals found with cn=2
    assert got[(10, 12)][0] == 2 and got[(11, 13)][0] == 2
    # hub leaves pairwise share exactly the hub
    assert got[(21, 22)] == (1, 1, 1)
    # triangle members are adjacent -> never candidates
    assert (1, 2) not in got and (2, 3) not in got
    # self-loop node never appears
    assert not any(5 in p for p in got)


def test_linkpred_degree_cap(spark):
    df = spark.createDataFrame(EDGES, "u long, v long")
    got = {
        (r["a"], r["b"]): (r["cn"], r["deg_a"], r["deg_b"])
        for r in common_neighbor_scores(df, max_center_degree=3).collect()
    }
    want = _brute(EDGES, cap=3)
    assert got == want
    # hub (deg 4) no longer mediates: leaf pairs gone
    assert (21, 22) not in got
    # square diagonals (centers have deg 2-3) survive
    assert (10, 12) in got


def test_linkpred_plan_no_cartesian(spark):
    df = spark.createDataFrame(EDGES, "u long, v long")
    plan = (
        common_neighbor_scores(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "Python" not in plan
