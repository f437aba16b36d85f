"""Geary's C and Ripley's K census (operators/spatialstats.py):
pure-Python replays, textbook identities, and empty-radius emission."""

import random

from osm_hadoop_spark.operators.spatialstats import (
    gearys_c_global,
    ripley_k_census,
)


def _ref_geary(cells):
    n = len(cells)
    s = sum(v for _, _, v in cells)
    by_xy = {(x, y): v for x, y, v in cells}
    num = w = 0
    for x, y, v in cells:
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            if (x + dx, y + dy) in by_xy:
                d = v - by_xy[(x + dx, y + dy)]
                num += d * d
                w += 1
    den = sum((n * v - s) ** 2 for _, _, v in cells)
    return n, w, num, den


def test_geary_matches_reference(spark):
    rng = random.Random(2)
    cells = [
        (x, y, rng.randint(0, 9))
        for x in range(6)
        for y in range(6)
        if rng.random() < 0.7
    ]
    df = spark.createDataFrame(cells, "cx long, cy long, n long")
    r = gearys_c_global(df).collect()[0]
    assert (r.n_cells, r.w_sum, r.num, r.den_scaled) == _ref_geary(cells)


def test_geary_constant_surface_zero(spark):
    cells = [(x, y, 7) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(cells, "cx long, cy long, n long")
    r = gearys_c_global(df).collect()[0]
    assert r.num == 0 and r.den_scaled == 0
    assert r.w_sum == 2 * (2 * 4 * 3)  # directed rook edges of a 4x4 grid


def _ref_ripley(pts, radii):
    out = {}
    for r in radii:
        c = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dx = pts[i][0] - pts[j][0]
                dy = pts[i][1] - pts[j][1]
                if dx * dx + dy * dy <= r * r:
                    c += 1
        out[r] = c
    return out


def test_ripley_matches_brute(spark):
    rng = random.Random(6)
    pts = [(rng.randint(0, 120), rng.randint(0, 120)) for _ in range(300)]
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    radii = (5, 13, 40)
    got = {r.r: (r.n_pairs, r.n_points)
           for r in ripley_k_census(df, radii).collect()}
    want = _ref_ripley(pts, radii)
    assert got == {r: (want[r], len(pts)) for r in radii}
    # K is monotone in r
    assert got[5][0] <= got[13][0] <= got[40][0]


def test_ripley_empty_radius_emitted(spark):
    rows = [(0, 0, 0), (1, 1000, 1000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r.r: r.n_pairs for r in ripley_k_census(df, (3, 9)).collect()}
    assert got == {3: 0, 9: 0}
