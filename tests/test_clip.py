"""Liang-Barsky tile clipping (operators/clip.py) vs a Fraction brute force.

The brute force is an INDEPENDENT algorithm: it walks every tile in the
segment's envelope, intersects the parametric segment with the tile's
four half-planes using exact ``fractions.Fraction`` interval clamping
(no candidate ladder, no normalized denominators), and compares the
resulting entry/exit POINTS as reduced rationals.  The operator's raw
numerator/denominator encoding is validated by reducing it the same way.
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _brute_clip(x1, y1, x2, y2, xl, xr, yl, yr):
    """Exact interval clamp; returns ((ax, ay), (bx, by)) Fractions or None."""
    t0, t1 = Fraction(0), Fraction(1)
    dx, dy = x2 - x1, y2 - y1
    for p, q in ((-dx, x1 - xl), (dx, xr - x1), (-dy, y1 - yl), (dy, yr - y1)):
        if p == 0:
            if q < 0:
                return None
            continue
        t = Fraction(q, p)
        if p < 0:
            t0 = max(t0, t)
        else:
            t1 = min(t1, t)
    if t0 > t1:
        return None
    return (
        (x1 + dx * t0, y1 + dy * t0),
        (x1 + dx * t1, y1 + dy * t1),
    )


def _synth_segments(n):
    segs = []
    for i in range(n):
        x1, y1 = _h(f"x{i}", 200) - 100, _h(f"y{i}", 200) - 100
        x2 = x1 + _h(f"dx{i}", 61) - 30
        y2 = y1 + _h(f"dy{i}", 61) - 30
        segs.append((i % 40, i, x1, y1, x2, y2))
    # degenerate + boundary cases: axis-aligned on a tile edge, a point
    # segment, a segment along a grid line, corner grazes
    segs += [
        (90, 900, 0, 0, 16, 0),       # along the y=0 grid line
        (91, 901, 16, -5, 16, 5),     # along the x=16 grid line
        (92, 902, 3, 3, 3, 3),        # degenerate point
        (93, 903, -1, -1, 1, 1),      # corner graze at (0,0)
        (94, 904, 15, 15, 17, 17),    # crosses corner (16,16)
        (95, 905, 0, 15, 31, 17),     # shallow crossing of y=16
    ]
    return segs


def test_clip_matches_fraction_brute_force(spark):
    from osm_hadoop_spark.operators.clip import clip_segments

    cell = 16
    segs = _synth_segments(220)
    df = spark.createDataFrame(
        segs, "way_id int, seg_id int, x1 int, y1 int, x2 int, y2 int"
    )
    got = {}
    for r in clip_segments(df, cell=cell).collect():
        a = (Fraction(r.ax_num, r.a_den), Fraction(r.ay_num, r.a_den))
        b = (Fraction(r.bx_num, r.b_den), Fraction(r.by_num, r.b_den))
        got[(r.seg_id, r.tx, r.ty)] = (a, b)

    want = {}
    for way_id, seg_id, x1, y1, x2, y2 in segs:
        for tx in range(min(x1, x2) // cell, max(x1, x2) // cell + 1):
            for ty in range(min(y1, y2) // cell, max(y1, y2) // cell + 1):
                hit = _brute_clip(
                    x1, y1, x2, y2,
                    tx * cell, (tx + 1) * cell, ty * cell, (ty + 1) * cell,
                )
                if hit is not None:
                    want[(seg_id, tx, ty)] = hit

    assert got == want
    # sanity: the synthetic set actually exercises multi-tile clips
    assert len(want) > len(segs)


def test_clip_endpoints_inside_tile(spark):
    from osm_hadoop_spark.operators.clip import clip_segments

    cell = 16
    df = spark.createDataFrame(
        _synth_segments(120), "way_id int, seg_id int, x1 int, y1 int, x2 int, y2 int"
    )
    for r in clip_segments(df, cell=cell).collect():
        assert r.a_den > 0 and r.b_den > 0
        for num_x, num_y, den in (
            (r.ax_num, r.ay_num, r.a_den),
            (r.bx_num, r.by_num, r.b_den),
        ):
            assert r.tx * cell * den <= num_x <= (r.tx + 1) * cell * den
            assert r.ty * cell * den <= num_y <= (r.ty + 1) * cell * den


def test_clip_plan_is_join_free(spark):
    from osm_hadoop_spark.operators.clip import clip_segments

    df = spark.createDataFrame(
        [(0, 0, 1, 2, 40, 37)], "way_id int, seg_id int, x1 int, y1 int, x2 int, y2 int"
    )
    plan = clip_segments(df, cell=16)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan
