"""Variogram census (operators/spatialstats.py): brute replay, Geary
cross-check at lag 1, and half-plane once-counting."""

import random

from osm_hadoop_spark.operators.spatialstats import (
    gearys_c_global,
    variogram_census,
)


def _ref(cells, max_lag2):
    out = {}
    pts = list(cells.items())
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (x1, y1), v1 = pts[i]
            (x2, y2), v2 = pts[j]
            l2 = (x1 - x2) ** 2 + (y1 - y2) ** 2
            if 0 < l2 <= max_lag2:
                n, s = out.get(l2, (0, 0))
                out[l2] = (n + 1, s + (v1 - v2) ** 2)
    return out


def _df(spark, cells):
    rows = [(x, y, v) for (x, y), v in cells.items()]
    return spark.createDataFrame(rows, "cx long, cy long, n long")


def test_matches_brute(spark):
    rng = random.Random(27)
    cells = {
        (x, y): rng.randint(0, 9)
        for x in range(8)
        for y in range(8)
        if rng.random() < 0.65
    }
    df = _df(spark, cells)
    got = {
        r.lag2: (r.n_pairs, r.sum_sq_diff)
        for r in variogram_census(df, 9).collect()
    }
    assert got == _ref(cells, 9)


def test_lag1_equals_geary_num(spark):
    rng = random.Random(28)
    cells = {(x, y): rng.randint(0, 9) for x in range(5) for y in range(5)}
    df = _df(spark, cells)
    vario = {
        r.lag2: (r.n_pairs, r.sum_sq_diff)
        for r in variogram_census(df, 2).collect()
    }
    g = gearys_c_global(df).collect()[0]
    # Geary counts directed rook pairs, variogram unordered: exactly 2x
    assert vario[1][0] * 2 == g.w_sum
    assert vario[1][1] * 2 == g.num
