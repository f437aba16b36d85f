"""Kendall tau census (operators/timeseries.py): brute replay,
pair-partition identity, monotone closed forms."""

import random

from osm_hadoop_spark.operators.timeseries import kendall_tau_census


def _ref(pts):
    nc = nd = tx = ty = txy = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[j][0] - pts[i][0]
            dy = pts[j][1] - pts[i][1]
            if dx == 0 and dy == 0:
                txy += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif dx * dy > 0:
                nc += 1
            else:
                nd += 1
    return nc, nd, tx, ty, txy


def test_matches_brute(spark):
    rng = random.Random(43)
    groups = {
        k: [(rng.randint(0, 8), rng.randint(0, 8))
            for _ in range(rng.randint(1, 40))]
        for k in range(6)
    }
    rows = [
        (k, k * 1000 + i, xx, yy)
        for k, pts in groups.items()
        for i, (xx, yy) in enumerate(pts)
    ]
    df = spark.createDataFrame(rows, "key long, id long, x long, y long")
    got = {
        r.key: (r.n, r.nc, r.nd, r.tx, r.ty, r.txy)
        for r in kendall_tau_census(df).collect()
    }
    for k, pts in groups.items():
        n = len(pts)
        nc, nd, tx, ty, txy = _ref(pts)
        assert got[k] == (n, nc, nd, tx, ty, txy)
        assert nc + nd + tx + ty + txy == n * (n - 1) // 2


def test_monotone_closed_forms(spark):
    rows = (
        [(0, i, i, i * 2) for i in range(6)]        # perfectly concordant
        + [(1, i, i, -i) for i in range(5)]          # perfectly discordant
        + [(2, 0, 7, 7)]                             # singleton
    )
    df = spark.createDataFrame(rows, "key long, id long, x long, y long")
    got = {r.key: (r.n, r.nc, r.nd) for r in kendall_tau_census(df).collect()}
    assert got[0] == (6, 15, 0)
    assert got[1] == (5, 0, 10)
    assert got[2] == (1, 0, 0)
