"""Segment-crossing join (operators/overlay.py) vs an O(n^2) brute force."""

from __future__ import annotations

import hashlib

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _sign(v):
    return (v > 0) - (v < 0)


def _brute_intersect(a, b):
    (ax1, ay1, ax2, ay2), (bx1, by1, bx2, by2) = a, b

    def cross(ox, oy, px, py, qx, qy):
        return _sign((px - ox) * (qy - oy) - (py - oy) * (qx - ox))

    def on_seg(px, py, qx, qy, rx, ry):
        return min(px, qx) <= rx <= max(px, qx) and min(py, qy) <= ry <= max(py, qy)

    d1 = cross(bx1, by1, bx2, by2, ax1, ay1)
    d2 = cross(bx1, by1, bx2, by2, ax2, ay2)
    d3 = cross(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = cross(ax1, ay1, ax2, ay2, bx2, by2)
    if d1 != d2 and d3 != d4 and 0 not in (d1, d2, d3, d4):
        return True
    return (
        (d1 == 0 and on_seg(bx1, by1, bx2, by2, ax1, ay1))
        or (d2 == 0 and on_seg(bx1, by1, bx2, by2, ax2, ay2))
        or (d3 == 0 and on_seg(ax1, ay1, ax2, ay2, bx1, by1))
        or (d4 == 0 and on_seg(ax1, ay1, ax2, ay2, bx2, by2))
    )


def _synth_segments(n):
    segs = []
    for i in range(n):
        x1, y1 = _h(f"x{i}", 120) - 60, _h(f"y{i}", 120) - 60
        x2 = x1 + _h(f"dx{i}", 41) - 20
        y2 = y1 + _h(f"dy{i}", 41) - 20
        segs.append((i % 40, i, x1, y1, x2, y2))  # 40 ways
    # handcrafted exact-touch / collinear / shared-endpoint cases
    segs += [
        (90, 900, 0, 0, 10, 0), (91, 901, 5, 0, 5, 7),     # T-touch
        (92, 902, 20, 20, 30, 20), (93, 903, 25, 20, 28, 20),  # collinear overlap
        (94, 904, 40, 40, 50, 50), (95, 905, 50, 50, 60, 40),  # shared endpoint
        (96, 906, -50, -50, -40, -50), (97, 907, -30, -50, -20, -50),  # collinear disjoint
    ]
    return segs


@pytest.fixture(scope="module")
def seg_df(spark):
    segs = _synth_segments(300)
    return (
        spark.createDataFrame(
            segs, "way_id long, seg_id long, x1 long, y1 long, x2 long, y2 long"
        ).cache(),
        segs,
    )


@pytest.mark.parametrize("cell", [8, 64])
def test_crossings_match_brute(spark, seg_df, cell):
    from osm_hadoop_spark.operators.overlay import segment_crossings

    df, segs = seg_df
    got = {
        (r["way_a"], r["seg_a"], r["way_b"], r["seg_b"])
        for r in segment_crossings(df, cell=cell).collect()
    }
    want = set()
    for (wa, sa, *a) in segs:
        for (wb, sb, *b) in segs:
            if wa < wb and _brute_intersect(tuple(a), tuple(b)):
                want.add((wa, sa, wb, sb))
    assert got == want
    assert len(want) > 50
    # the handcrafted touch/collinear pairs are present
    assert (90, 900, 91, 901) in want
    assert (92, 902, 93, 903) in want
    assert (94, 904, 95, 905) in want
    assert (96, 906, 97, 907) not in want


def test_crossings_plan_no_cross_product(spark, seg_df):
    from osm_hadoop_spark.operators.overlay import segment_crossings

    df, _ = seg_df
    plan = (
        segment_crossings(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _synth_polylines(n_ways, n_pts):
    """Random-walk polylines; segment i connects vertex i to i+1."""
    segs = []
    for w in range(n_ways):
        x, y = _h(f"px{w}", 200) - 100, _h(f"py{w}", 200) - 100
        for i in range(n_pts - 1):
            nx = x + _h(f"pdx{w}_{i}", 41) - 20
            ny = y + _h(f"pdy{w}_{i}", 41) - 20
            segs.append((w, i, x, y, nx, ny))
            x, y = nx, ny
    # handcrafted: figure-eight (revisits a vertex), proper bowtie cross,
    # simple convex ring left open (no violation)
    segs += [
        (500, 0, 0, 0, 10, 0), (500, 1, 10, 0, 10, 10),
        (500, 2, 10, 10, 0, 0), (500, 3, 0, 0, -10, 10),   # revisit (0,0): 0x3
        (501, 0, 0, 0, 10, 10), (501, 1, 10, 10, 10, 0),
        (501, 2, 10, 0, 0, 10),                              # seg2 crosses seg0
        (502, 0, 0, 0, 10, 0), (502, 1, 10, 0, 12, 8),
        (502, 2, 12, 8, 2, 9),                               # simple, no pairs
    ]
    return segs


@pytest.mark.parametrize("cell", [8, 64])
def test_self_intersections_match_brute(spark, cell):
    from osm_hadoop_spark.operators.overlay import self_intersections

    segs = _synth_polylines(60, 8)
    df = spark.createDataFrame(
        segs, "way_id long, seg_id long, x1 long, y1 long, x2 long, y2 long"
    )
    got = {
        (r["way_id"], r["seg_a"], r["seg_b"])
        for r in self_intersections(df, cell=cell).collect()
    }
    want = set()
    for (wa, sa, *a) in segs:
        for (wb, sb, *b) in segs:
            if wa == wb and sa + 1 < sb and _brute_intersect(tuple(a), tuple(b)):
                want.add((wa, sa, sb))
    assert got == want
    assert (500, 0, 3) in want
    assert (501, 0, 2) in want
    assert not any(w == 502 for w, _, _ in want)
    assert len(want) > 10
