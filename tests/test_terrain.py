"""Horn terrain (operators/terrain.py): brute force with math.atan2.

The independent anchor computes the Horn gradient with plain Python
ints and classifies the aspect sector via `math.atan2` on the descent
vector — a genuinely different formulation from the operator's
sign/|u|-vs-|v| integer ladder — then both are compared on the same
hash-noise DEM plus crafted features: a uniform east-facing ramp (every
interior cell must land in one known sector with identical gx), a flat
plateau (aspect 0), and a single spike (all 8 sectors around it).
"""

from __future__ import annotations

import hashlib
import math

from osm_hadoop_spark.operators.terrain import horn_terrain

GRID = 20
# D8-coded sectors clockwise from east, y down: [k*45,(k+1)*45) -> code
_CODES = [1, 2, 4, 8, 16, 32, 64, 128]


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _dem():
    cells = {}
    for i in range(260):
        cx, cy = _h(f"tx{i}", GRID), _h(f"ty{i}", GRID)
        cells[(cx, cy)] = max(cells.get((cx, cy), 0), _h(f"te{i}", 900) + 1)
    # east-facing ramp: elev increases with x -> descent is due west
    for x in range(30, 38):
        for y in range(30, 38):
            cells[(x, y)] = 100 * (x - 29)
    # flat plateau
    for x in range(50, 54):
        for y in range(50, 54):
            cells[(x, y)] = 400
    # spike: the 8 cells around it slope away in all 8 sectors
    cells[(70, 70)] = 5000
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx or dy:
                cells[(70 + dx, 70 + dy)] = 10
    return cells


def _brute(dem, default=0):
    def at(x, y):
        return dem.get((x, y), default)

    out = {}
    for (cx, cy) in dem:
        nw, n, ne = at(cx - 1, cy - 1), at(cx, cy - 1), at(cx + 1, cy - 1)
        w, e = at(cx - 1, cy), at(cx + 1, cy)
        sw, s, se = at(cx - 1, cy + 1), at(cx, cy + 1), at(cx + 1, cy + 1)
        gx = (ne + 2 * e + se) - (nw + 2 * w + sw)
        gy = (sw + 2 * s + se) - (nw + 2 * n + ne)
        g2 = gx * gx + gy * gy
        if g2 == 0:
            aspect = 0
        else:
            u, v = -gx, -gy
            if u == 0 or v == 0 or abs(u) == abs(v):
                # exact wedge boundary = exact compass direction; the
                # half-open rule assigns it to its own sector
                key = (0 if u == 0 else (1 if u > 0 else -1),
                       0 if v == 0 else (1 if v > 0 else -1))
                aspect = {
                    (1, 0): 1, (1, 1): 2, (0, 1): 4, (-1, 1): 8,
                    (-1, 0): 16, (-1, -1): 32, (0, -1): 64, (1, -1): 128,
                }[key]
            else:
                # strict wedge interior: the true angle is bounded away
                # from any boundary, so float atan2 cannot cross it
                ang = math.degrees(math.atan2(v, u)) % 360.0
                aspect = _CODES[int(ang // 45.0) % 8]
        out[(cx, cy)] = (gx, gy, g2, aspect, -(gx + gy))
    return out


def test_horn_matches_brute(spark):
    dem = _dem()
    df = spark.createDataFrame(
        [(x, y, e) for (x, y), e in dem.items()], "cx long, cy long, elev long"
    )
    got = {
        (r.cx, r.cy): (r.gx, r.gy, r.g2, r.aspect, r.shade)
        for r in horn_terrain(df).collect()
    }
    assert set(got) == set(dem)
    want = _brute(dem)
    diffs = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not diffs, dict(list(diffs.items())[:5])


def test_horn_crafted_features(spark):
    dem = _dem()
    df = spark.createDataFrame(
        [(x, y, e) for (x, y), e in dem.items()], "cx long, cy long, elev long"
    )
    got = {
        (r.cx, r.cy): (r.gx, r.gy, r.g2, r.aspect, r.shade)
        for r in horn_terrain(df).collect()
    }
    # ramp interior: gx = 8*100, gy = 0, descent due west (code 16)
    for x in range(32, 36):
        for y in range(32, 36):
            gx, gy, g2, aspect, shade = got[(x, y)]
            assert (gx, gy, aspect) == (800, 0, 16)
            assert g2 == 800 * 800 and shade == -800
    # plateau interior: flat
    for x in (51, 52):
        for y in (51, 52):
            assert got[(x, y)][3] == 0
    # spike ring: each neighbor's descent points away from the spike
    ring_codes = {
        got[(70 + dx, 70 + dy)][3]
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if dx or dy
    }
    assert len(ring_codes) == 8
