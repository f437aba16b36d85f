import random
from itertools import combinations

import pytest

from osm_hadoop_spark.operators.hull import chain_hull, convex_hull


def _brute_hull(points):
    """Extreme-point set by the EXCLUSION definition (independent of the
    monotone chain): p is NOT a hull vertex iff it lies on the closed
    segment between two other distinct points, or strictly inside a
    triangle of three others. Exact integer arithmetic."""
    pts = sorted(set(points))

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    out = set()
    for p in pts:
        others = [q for q in pts if q != p]
        on_seg = any(
            cross(a, b, p) == 0
            and min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
            for a, b in combinations(others, 2)
        )
        in_tri = any(
            (s1 > 0 and s2 > 0 and s3 > 0) or (s1 < 0 and s2 < 0 and s3 < 0)
            for a, b, c in combinations(others, 3)
            for s1, s2, s3 in [
                (cross(a, b, p), cross(b, c, p), cross(c, a, p))
            ]
        )
        if not (on_seg or in_tri):
            out.add(p)
    return out


def _chain_set(points):
    import numpy as np

    xs = np.array([p[0] for p in points], dtype=np.int64)
    ys = np.array([p[1] for p in points], dtype=np.int64)
    return {(int(x), int(y)) for x, y in chain_hull(xs, ys)}


@pytest.mark.parametrize("seed", range(6))
def test_chain_matches_exclusion_brute_force(seed):
    rng = random.Random(seed)
    # tiny coordinate range forces duplicates and collinear runs
    pts = [(rng.randrange(0, 7), rng.randrange(0, 7)) for _ in range(30)]
    assert _chain_set(pts) == _brute_hull(pts)


def test_chain_degenerate_cases():
    assert _chain_set([(3, 4)]) == {(3, 4)}
    assert _chain_set([(3, 4), (3, 4)]) == {(3, 4)}
    assert _chain_set([(0, 0), (5, 5)]) == {(0, 0), (5, 5)}
    # all collinear: only the two extremes survive
    assert _chain_set([(0, 0), (1, 1), (2, 2), (3, 3)]) == {(0, 0), (3, 3)}
    # square with edge midpoints and center: corners only
    sq = [(0, 0), (2, 0), (2, 2), (0, 2), (1, 0), (2, 1), (1, 2), (0, 1), (1, 1)]
    assert _chain_set(sq) == {(0, 0), (2, 0), (2, 2), (0, 2)}


def test_hull_merge_is_associative():
    # hull(A u B) == hull(vertices(hull(A)) u vertices(hull(B))) — the
    # property the two-level distributed aggregate relies on
    rng = random.Random(42)
    a = [(rng.randrange(0, 50), rng.randrange(0, 50)) for _ in range(40)]
    b = [(rng.randrange(20, 90), rng.randrange(20, 90)) for _ in range(40)]
    direct = _chain_set(a + b)
    merged = _chain_set(list(_chain_set(a)) + list(_chain_set(b)))
    assert merged == direct


def test_convex_hull_operator(spark):
    rng = random.Random(7)
    rows = []
    truth = {}
    for fid in range(12):
        n = rng.randrange(1, 25)
        pts = [(rng.randrange(-8, 9), rng.randrange(-8, 9)) for _ in range(n)]
        rows.append((fid, [p[0] for p in pts], [p[1] for p in pts]))
        truth[fid] = _brute_hull(pts)
    df = spark.createDataFrame(
        rows, "way_id: long, xs: array<long>, ys: array<long>"
    )
    got = {}
    for r in convex_hull(df).collect():
        got.setdefault(r["way_id"], set()).add((r["hx"], r["hy"]))
    assert got == truth
