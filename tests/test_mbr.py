"""Minimum rotated rectangle (operators/mbr.py): kernel vs an
independent all-pairs-direction brute force, sandwich invariants
(hull area <= MBR <= bbox), known closed-form cases, and the Spark
surface end to end."""

import random
from fractions import Fraction

import numpy as np
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.mbr import _row_mbr, min_rotated_rect


def _brute_mbr(pts):
    """Min over EVERY distinct point-pair direction (superset of the
    hull-edge directions the kernel scans; any direction bounds from
    above, and Freeman-Shapira says some hull edge attains the min —
    so equality with the kernel proves both)."""
    best = None
    uniq = sorted(set(pts))
    for i, (ax, ay) in enumerate(uniq):
        for bx, by in uniq[i + 1:]:
            ex, ey = bx - ax, by - ay
            den = ex * ex + ey * ey
            alo = [ex * (px - ax) + ey * (py - ay) for px, py in uniq]
            per = [ex * (py - ay) - ey * (px - ax) for px, py in uniq]
            num = (max(alo) - min(alo)) * (max(per) - min(per))
            cand = Fraction(num, den)
            if best is None or cand < best:
                best = cand
    return best


def _shoelace2(ring):
    s = 0
    h = len(ring)
    for i in range(h):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % h]
        s += ax * by - bx * ay
    return abs(s)


def test_known_cases():
    # axis-aligned 3x2 rectangle: MBR = bbox = 6
    xs = np.array([0, 3, 3, 0], dtype=np.int64)
    ys = np.array([0, 0, 2, 2], dtype=np.int64)
    h, num, den, bbox = _row_mbr(xs, ys)
    assert (h, num, den, bbox) == (4, 6, 1, 6)
    # 45-degree square with vertices on axes: area 2, bbox 4
    xs = np.array([1, 2, 1, 0], dtype=np.int64)
    ys = np.array([0, 1, 2, 1], dtype=np.int64)
    h, num, den, bbox = _row_mbr(xs, ys)
    assert (h, num, den, bbox) == (4, 2, 1, 4)
    # degenerate: collinear -> area 0/1
    xs = np.array([0, 5, 9], dtype=np.int64)
    ys = np.array([0, 5, 9], dtype=np.int64)
    assert _row_mbr(xs, ys) == (2, 0, 1, 81)
    xs = np.array([7], dtype=np.int64)
    ys = np.array([3], dtype=np.int64)
    assert _row_mbr(xs, ys) == (1, 0, 1, 0)


def test_kernel_matches_all_directions_brute():
    rng = random.Random(7)
    for trial in range(30):
        n = rng.randrange(3, 14)
        pts = [(rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(n)]
        xs = np.array([p[0] for p in pts], dtype=np.int64)
        ys = np.array([p[1] for p in pts], dtype=np.int64)
        h, num, den, bbox = _row_mbr(xs, ys)
        if h <= 2:
            assert (num, den) == (0, 1)
            continue
        assert Fraction(num, den) == _brute_mbr(pts), pts
        # sandwich: hull area <= MBR area <= bbox area, all exact
        from osm_hadoop_spark.operators.hull import chain_hull

        ring = [tuple(map(int, p)) for p in chain_hull(xs, ys)]
        assert 2 * num >= _shoelace2(ring) * den
        assert num <= bbox * den


def test_spark_surface(spark):
    rows = [
        (1, [0, 3, 3, 0], [0, 0, 2, 2]),
        (2, [1, 2, 1, 0], [0, 1, 2, 1]),
        (3, [4, 4, 4], [1, 5, 9]),
    ]
    df = spark.createDataFrame(rows, "g long, xs array<long>, ys array<long>")
    got = {r.g: (r.n_hull, r.mbr_num, r.mbr_den, r.bbox_area)
           for r in min_rotated_rect(df).collect()}
    assert got == {1: (4, 6, 1, 6), 2: (4, 2, 1, 4), 3: (2, 0, 1, 0)}
