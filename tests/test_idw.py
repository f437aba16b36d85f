import random

import pytest

from osm_hadoop_spark.operators.idw import IDW_Q, idw_grid


def _brute_idw(pts, cell, radius, scale=1024):
    """Cell-driven gather over ALL points — the opposite evaluation
    direction from the operator's per-point scatter."""
    out = {}
    # candidate cells: anything within the scatter reach of some point
    rc = radius // cell + 1
    cells = set()
    for px, py, _ in pts:
        hx, hy = px // cell, py // cell
        for dx in range(-rc, rc + 1):
            for dy in range(-rc, rc + 1):
                cells.add((hx + dx, hy + dy))
    for cx, cy in cells:
        num = den = n = 0
        for px, py, pv in pts:
            d2q = (2 * px - (2 * cx * cell + cell)) ** 2 + (
                2 * py - (2 * cy * cell + cell)
            ) ** 2
            if d2q <= 4 * radius * radius:
                w = IDW_Q // (1 + d2q)
                num += w * pv
                den += w
                n += 1
        if n:
            out[(cx, cy)] = (n, den, num, (num * scale) // den)
    return out


def test_idw_matches_gather_brute_force(spark):
    rng = random.Random(3)
    pts = [
        (rng.randrange(-100, 100), rng.randrange(-100, 100), rng.randrange(0, 50))
        for _ in range(60)
    ]
    df = spark.createDataFrame(pts, "x: long, y: long, v: long")
    got = {
        (r["cx"], r["cy"]): (r["npts"], r["den"], r["num"], r["val_q"])
        for r in idw_grid(df, cell_size=10, radius=25).collect()
    }
    assert got == _brute_idw(pts, 10, 25)


def test_idw_single_point_exact_value(spark):
    # one sample: every in-radius cell reports exactly v (w cancels)
    df = spark.createDataFrame([(5, 5, 7)], "x: long, y: long, v: long")
    rows = idw_grid(df, cell_size=10, radius=15, scale=1024).collect()
    assert rows, "sample's own cell must be in radius"
    for r in rows:
        assert r["val_q"] == 7 * 1024
        assert r["npts"] == 1


def test_idw_no_join_in_plan(spark):
    df = spark.createDataFrame([(5, 5, 7)], "x: long, y: long, v: long")
    plan = (
        idw_grid(df, cell_size=10, radius=15)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Python" not in plan


def test_idw_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, 0, 0)], "x: long, y: long, v: long")
    with pytest.raises(ValueError):
        idw_grid(df, cell_size=0, radius=5)
    with pytest.raises(ValueError):
        idw_grid(df, cell_size=5, radius=0)
