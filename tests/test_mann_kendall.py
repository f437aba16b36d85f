"""Mann-Kendall trend census (operators/spatialstats.py): closed-form
cases, scipy-free reference replay, tie correction, and cross-checks
against the textbook identities."""

import random

import pytest

from osm_hadoop_spark.operators.spatialstats import mann_kendall


def _ref_mk(vals):
    n = len(vals)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (vals[j] > vals[i]) - (vals[j] < vals[i])
    ties = {}
    for v in vals:
        ties[v] = ties.get(v, 0) + 1
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        c * (c - 1) * (2 * c + 5) for c in ties.values()
    )
    return n, s, var18


def _df(spark, cells):
    rows = [
        (cx, cy, t, v)
        for (cx, cy), vals in cells.items()
        for t, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "cx long, cy long, t long, v long")


def test_monotone_and_constant(spark):
    cells = {
        (0, 0): [1, 2, 3, 4, 5],      # strictly up: S = C(5,2) = 10
        (0, 1): [5, 4, 3, 2, 1],      # strictly down: S = -10
        (1, 0): [7, 7, 7, 7],         # constant: S = 0, var18 = 0
        (1, 1): [3],                   # singleton
    }
    got = {
        (r.cx, r.cy): (r.n, r.s_stat, r.var18)
        for r in mann_kendall(_df(spark, cells)).collect()
    }
    assert got[(0, 0)] == (5, 10, 5 * 4 * 15)
    assert got[(0, 1)] == (5, -10, 5 * 4 * 15)
    # constant: tie group of 4 cancels the whole variance
    assert got[(1, 0)] == (4, 0, 4 * 3 * 13 - 4 * 3 * 13)
    assert got[(1, 1)] == (1, 0, 0)


def test_matches_reference_random(spark):
    rng = random.Random(5)
    cells = {
        (k, k * 2): [rng.randint(0, 6) for _ in range(rng.randint(1, 25))]
        for k in range(10)
    }
    got = {
        (r.cx, r.cy): (r.n, r.s_stat, r.var18)
        for r in mann_kendall(_df(spark, cells)).collect()
    }
    for key, vals in cells.items():
        assert got[key] == _ref_mk(vals)


def test_t_order_not_insertion_order(spark):
    # same multiset, shuffled t: statistic follows t, not row order
    rows = [(0, 0, 2, 9), (0, 0, 0, 1), (0, 0, 1, 5)]
    df = spark.createDataFrame(rows, "cx long, cy long, t long, v long")
    r = mann_kendall(df).collect()[0]
    assert (r.n, r.s_stat) == (3, 3)  # 1 -> 5 -> 9 ascending
