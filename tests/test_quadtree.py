"""Quadtree partitioner (operators/quadtree.py) vs a recursive splitter.

The brute force is the textbook TOP-DOWN RECURSION (split any cell over
cap until it fits or the depth limit) — an entirely different mechanism
from the engine's closed-form ancestor-count rule — plus structural
invariants checkable without any reference implementation: the leaves
are disjoint (no leaf is an ancestor of another) and their occupancies
sum to the input size (exact cover).
"""

from __future__ import annotations

import hashlib

import pytest

S, CAP, D = 8, 12, 4  # 256x256 domain


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _synth_points(n):
    pts = []
    for i in range(n):
        # heavy cluster + uniform background -> real skew
        if _h(f"m{i}", 10) < 4:
            pts.append((40 + _h(f"cx{i}", 12), 200 + _h(f"cy{i}", 12)))
        else:
            pts.append((_h(f"ux{i}", 256), _h(f"uy{i}", 256)))
    return pts


def _brute(points):
    """Textbook recursion."""
    leaves = {}

    def rec(depth, cx, cy, pts):
        if len(pts) <= CAP or depth == D:
            leaves[(depth, cx, cy)] = len(pts)
            return
        shift = S - (depth + 1)
        kids = {}
        for x, y in pts:
            kids.setdefault((x >> shift, y >> shift), []).append((x, y))
        for (kx, ky), kp in kids.items():
            rec(depth + 1, kx, ky, kp)

    rec(0, 0, 0, points)
    return leaves


def test_quadtree_matches_recursive_splitter(spark):
    from osm_hadoop_spark.operators.quadtree import quadtree_leaves

    pts = _synth_points(900)
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r.depth, r.cx, r.cy): r.n_points
        for r in quadtree_leaves(df, size_pow=S, cap=CAP, max_depth=D).collect()
    }
    assert got == _brute(pts)
    # the skewed cluster actually forces depth-limited leaves
    assert any(d == D and n > CAP for (d, _, _), n in got.items())
    assert any(d == 0 or d == 1 for (d, _, _), n in got.items()) or len(got) > 1


def test_quadtree_leaves_are_exact_disjoint_cover(spark):
    from osm_hadoop_spark.operators.quadtree import quadtree_leaves

    pts = _synth_points(700)
    df = spark.createDataFrame(pts, "x int, y int")
    leaves = quadtree_leaves(df, size_pow=S, cap=CAP, max_depth=D).collect()
    assert sum(r.n_points for r in leaves) == len(pts)  # exact cover
    cells = {(r.depth, r.cx, r.cy) for r in leaves}
    for d, cx, cy in cells:  # no leaf is an ancestor of another
        for dd, ax, ay in cells:
            if dd < d:
                assert (cx >> (d - dd), cy >> (d - dd)) != (ax, ay)


def test_quadtree_single_point_and_cap_boundary(spark):
    from osm_hadoop_spark.operators.quadtree import quadtree_leaves

    one = spark.createDataFrame([(5, 7)], "x int, y int")
    got = quadtree_leaves(one, size_pow=S, cap=1, max_depth=D).collect()
    assert [(r.depth, r.cx, r.cy, r.n_points) for r in got] == [(0, 0, 0, 1)]

    # exactly cap points in one spot -> root stays unsplit
    dup = spark.createDataFrame([(9, 9)] * 12, "x int, y int")
    got = quadtree_leaves(dup, size_pow=S, cap=12, max_depth=D).collect()
    assert [(r.depth, r.n_points) for r in got] == [(0, 12)]

    # cap+1 identical points -> forced leaf at max depth
    dup = spark.createDataFrame([(9, 9)] * 13, "x int, y int")
    got = quadtree_leaves(dup, size_pow=S, cap=12, max_depth=D).collect()
    assert [(r.depth, r.n_points) for r in got] == [(D, 13)]
