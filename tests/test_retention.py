"""retention_cohorts + trend_stats (operators/timeseries.py) brute forces."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def test_retention_matches_brute(spark):
    from osm_hadoop_spark.operators.timeseries import retention_cohorts

    rows = [(_h(f"u{i}", 30), _h(f"d{i}", 14)) for i in range(500)]
    rows += [(200, 3), (200, 3), (200, 7), (201, 3)]  # dup day, singleton user
    df = spark.createDataFrame(rows, "user_id long, day long")
    got = {
        (r.cohort_day, r.day_k): (r.n_active, r.n_cohort)
        for r in retention_cohorts(df, day="day").collect()
    }

    days = defaultdict(set)
    for u, d in rows:
        days[u].add(d)
    first = {u: min(ds) for u, ds in days.items()}
    sizes = defaultdict(int)
    for u in days:
        sizes[first[u]] += 1
    want = defaultdict(int)
    for u, ds in days.items():
        for d in ds:
            want[(first[u], d - first[u])] += 1
    assert got == {k: (v, sizes[k[0]]) for k, v in want.items()}
    # k=0 row equals cohort size for every cohort
    for d0, n in sizes.items():
        assert got[(d0, 0)] == (n, n)


def test_trend_stats_match_brute(spark):
    from osm_hadoop_spark.operators.timeseries import trend_stats

    rows = [
        (_h(f"k{i}", 20), _h(f"x{i}", 100), _h(f"y{i}", 50) - 25)
        for i in range(600)
    ]
    rows += [(300, 5, 9), (301, 4, 1), (301, 4, 7)]  # n=1; constant-x (den=0)
    df = spark.createDataFrame(rows, "user_id long, x long, y long")
    got = {
        r.user_id: (r.n, r.sum_x, r.sum_y, r.slope_num, r.slope_den)
        for r in trend_stats(df).collect()
    }
    per = defaultdict(list)
    for k, x, y in rows:
        per[k].append((x, y))
    for k, pts in per.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sx2 = sum(x * x for x, _ in pts)
        assert got[k] == (n, sx, sy, n * sxy - sx * sy, n * sx2 - sx * sx)
    assert got[300][4] == 0 and got[301][4] == 0  # degenerate dens
    # a known two-point slope: (0,0),(2,6) -> slope 3 as 12/8? n*Σxy=2*12=24... check directly
    df2 = spark.createDataFrame([(9, 0, 0), (9, 2, 6)], "user_id long, x long, y long")
    r = trend_stats(df2).collect()[0]
    assert r.slope_num / r.slope_den == 3.0
