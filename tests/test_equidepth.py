"""Equi-depth bins (profile.py::equi_depth_bins) vs a sorted brute."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _brute(rows, k):
    by = defaultdict(list)
    for key, v in rows:
        by[key].append(v)
    out = {}
    for key, vs in by.items():
        vs.sort()
        n = len(vs)
        for i in range(1, k + 1):
            out[(key, i)] = vs[math.ceil(i * n / k) - 1]
    return out


def test_equi_depth_matches_brute(spark):
    from osm_hadoop_spark.operators.profile import equi_depth_bins

    rows = [(_h(f"g{i}", 5), _h(f"v{i}", 1000)) for i in range(700)]
    rows += [(9, 42)]                      # singleton key: all 4 bins = 42
    df = spark.createDataFrame(rows, "k long, v long")
    got = {(r.k, r.bin): r.boundary
           for r in equi_depth_bins(df, "k", "v", 4).collect()}
    assert got == _brute(rows, 4)
    assert all(got[(9, i)] == 42 for i in range(1, 5))


def test_equi_depth_k_exceeds_n_and_ties(spark):
    from osm_hadoop_spark.operators.profile import equi_depth_bins

    # n=3 < k=5: bins 1..5 map onto ranks ceil(i*3/5) = 1,2,2,3,3
    rows = [(1, 10), (1, 20), (1, 30), (2, 7), (2, 7), (2, 7), (2, 7)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {(r.k, r.bin): r.boundary
           for r in equi_depth_bins(df, "k", "v", 5).collect()}
    assert {got[(1, i)] for i in (1,)} == {10}
    assert got[(1, 2)] == 20 and got[(1, 3)] == 20
    assert got[(1, 4)] == 30 and got[(1, 5)] == 30
    assert all(got[(2, i)] == 7 for i in range(1, 6))  # ties: any order ok
