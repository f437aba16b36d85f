"""Viewshed census (operators/visibility.py::viewshed) vs the scalar
Bresenham + cross-multiplied blocking brute reused from the LOS tests."""

from __future__ import annotations

import hashlib

from osm_hadoop_spark.functions.raster import rasterize_segments_scalar
from osm_hadoop_spark.operators.visibility import viewshed

GRID = 30


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _los_visible(ox, oy, tx, ty, oh, th, dem, default=0):
    cells = rasterize_segments_scalar(ox, oy, tx, ty)
    if cells[0] != (ox, oy):
        cells.reverse()
    big_k = len(cells) - 1
    if big_k < 2:
        return 1
    for j in range(1, big_k):
        if dem.get(cells[j], default) * big_k >= oh * (big_k - j) + th * j:
            return 0
    return 1


def _brute_viewshed(observers, dem, r, default=0):
    out = {}
    for oid, ox, oy, oh in observers:
        n_vis = 0
        n = 0
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                if dx == 0 and dy == 0:
                    continue
                n += 1
                tx, ty = ox + dx, oy + dy
                th = dem.get((tx, ty), default)
                n_vis += _los_visible(ox, oy, tx, ty, oh, th, dem, default)
        out[oid] = (n, n_vis)
    return out


def _dem():
    cells = {}
    for i in range(500):
        cx, cy = _h(f"wx{i}", GRID), _h(f"wy{i}", GRID)
        cells[(cx, cy)] = max(cells.get((cx, cy), 0), _h(f"we{i}", 1200) + 1)
    return cells


def test_viewshed_matches_brute(spark):
    dem = _dem()
    observers = [
        (i, _h(f"vx{i}", GRID), _h(f"vy{i}", GRID), _h(f"vh{i}", 800) + 300)
        for i in range(12)
    ]
    odf = spark.createDataFrame(
        observers, "obs_id long, ox long, oy long, oh long"
    )
    ddf = spark.createDataFrame(
        [(cx, cy, e) for (cx, cy), e in dem.items()],
        "cx long, cy long, elev long",
    )
    got = {r.obs_id: (r.n_cells, r.n_visible)
           for r in viewshed(odf, ddf, radius=5).collect()}
    want = _brute_viewshed(observers, dem, 5)
    assert got == want
    vis = [v for _, v in want.values()]
    assert min(vis) < max(vis)  # the terrain actually blocks something


def test_viewshed_wall_ring_blocks_everything_beyond(spark):
    # observer at height 10 in a pit; a solid ring of height-10000 wall
    # at Chebyshev distance 2. Distance-1 cells are trivially visible
    # (d_fast < 2), the 16 wall TOPS are visible (the target IS the
    # terrain surface — you see the wall face), and everything beyond
    # is blocked by the wall.
    wall = [
        (x, y, 10_000)
        for x in range(8, 13) for y in range(8, 13)
        if max(abs(x - 10), abs(y - 10)) == 2
    ]
    odf = spark.createDataFrame([(1, 10, 10, 10)],
                                "obs_id long, ox long, oy long, oh long")
    ddf = spark.createDataFrame(wall, "cx long, cy long, elev long")
    row = viewshed(odf, ddf, radius=4).collect()[0]
    assert row.n_cells == 80
    assert row.n_visible == 8 + 16  # adjacent ring + the wall tops
