"""Discrete 1-center (operators/hull.py::discrete_one_center) vs brute.

The operator prunes the inner max to hull vertices; the brute twin scans
every point as both candidate and target. Equality proves the pruning.
"""

from __future__ import annotations

import hashlib


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _brute(xs, ys):
    pts = list(zip(xs, ys))
    best = None
    for cx, cy in pts:
        r2 = max((cx - x) ** 2 + (cy - y) ** 2 for x, y in pts)
        key = (r2, cx, cy)
        if best is None or key < best:
            best = key
    return best


def _synth():
    feats = []
    for w in range(60):
        n = 2 + _h(f"n{w}", 12)
        xs = [_h(f"x{w}_{i}", 1000) - 500 for i in range(n)]
        ys = [_h(f"y{w}_{i}", 1000) - 500 for i in range(n)]
        feats.append((w, xs, ys))
    feats.append((900, [0, 10], [0, 0]))          # 2 points
    feats.append((901, [0, 5, 10], [0, 0, 0]))    # collinear, interior center
    feats.append((902, [3, 3, 3], [4, 4, 4]))     # all-duplicate
    feats.append((903, [0, 0, 10, 10, 5], [0, 10, 0, 10, 5]))  # square+center
    return feats


def test_one_center_matches_brute(spark):
    from osm_hadoop_spark.operators.hull import discrete_one_center

    feats = _synth()
    df = spark.createDataFrame(
        feats, "way_id long, xs array<bigint>, ys array<bigint>"
    )
    got = {
        r["way_id"]: (r["r2"], r["cx"], r["cy"], r["n_pts"])
        for r in discrete_one_center(df).collect()
    }
    assert len(got) == len(feats)
    for w, xs, ys in feats:
        r2, cx, cy = _brute(xs, ys)
        assert got[w] == (r2, cx, cy, len(xs)), w
    # hand-checks: square's center site wins with r2 = 50; dup -> r2 0
    assert got[903][:3] == (50, 5, 5)
    assert got[902][:3] == (0, 3, 4)
    assert got[901][:3] == (25, 5, 0)
