"""Douglas-Peucker: kernel invariants + Spark operator equivalence to a
plain recursive reference implementation."""

import numpy as np
import pytest

from osm_hadoop_spark.operators.simplify import douglas_peucker_indices, simplify_ways


def _dp_reference(xs, ys, eps):
    """Straightforward recursive DP (the textbook form) — independent of
    the iterative kernel under test."""
    def rec(i0, i1, keep):
        if i1 - i0 < 2:
            return
        x0, y0, x1, y1 = xs[i0], ys[i0], xs[i1], ys[i1]
        dx, dy = x1 - x0, y1 - y0
        len2 = dx * dx + dy * dy
        best, best_j = -1.0, -1
        for j in range(i0 + 1, i1):
            if len2 == 0.0:
                c2 = (xs[j] - x0) ** 2 + (ys[j] - y0) ** 2
                rhs = eps * eps
            else:
                cr = dx * (ys[j] - y0) - (xs[j] - x0) * dy
                c2 = cr * cr
                rhs = eps * eps * len2
            if c2 > best:
                best, best_j, best_rhs = c2, j, rhs
        if best > best_rhs:
            keep.add(best_j)
            rec(i0, best_j, keep)
            rec(best_j, i1, keep)

    keep = {0, len(xs) - 1}
    rec(0, len(xs) - 1, keep)
    return sorted(keep)


def test_collinear_collapses_to_endpoints():
    xs = np.arange(10, dtype=float)
    ys = 2.0 * xs + 1.0
    assert list(douglas_peucker_indices(xs, ys, 0.5)) == [0, 9]


def test_endpoints_always_kept_and_short_lines_untouched():
    assert list(douglas_peucker_indices(np.array([1.0]), np.array([2.0]), 1.0)) == [0]
    assert list(
        douglas_peucker_indices(np.array([0.0, 5.0]), np.array([0.0, 0.0]), 1.0)
    ) == [0, 1]


def test_closed_ring_degenerate_base():
    # first == last: the base span has len2 == 0 -> point-distance rule
    xs = np.array([0.0, 10.0, 10.0, 0.0, 0.0])
    ys = np.array([0.0, 0.0, 10.0, 10.0, 0.0])
    kept = list(douglas_peucker_indices(xs, ys, 1.0))
    assert kept[0] == 0 and kept[-1] == 4 and len(kept) >= 4


def test_spike_kept_flat_noise_dropped():
    xs = np.arange(101, dtype=float)
    ys = np.zeros(101)
    ys[1::2] = 0.3   # sub-eps zigzag
    ys[50] = 20.0    # a real spike
    kept = list(douglas_peucker_indices(xs, ys, 1.0))
    assert 50 in kept
    assert len(kept) <= 7


@pytest.mark.parametrize("seed", range(5))
def test_matches_recursive_reference(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 120))
    xs = np.cumsum(rng.uniform(0.1, 2.0, n))
    ys = rng.normal(0, 5, n)
    eps = float(rng.uniform(0.5, 6.0))
    assert list(douglas_peucker_indices(xs, ys, eps)) == _dp_reference(xs, ys, eps)


def test_dropped_points_within_eps_of_kept_segments():
    rng = np.random.default_rng(9)
    xs = np.cumsum(rng.uniform(0.1, 2.0, 200))
    ys = rng.normal(0, 3, 200)
    eps = 2.0
    kept = douglas_peucker_indices(xs, ys, eps)
    # DP guarantee: every dropped point is within eps of its leaf span's
    # chord
    for a, b in zip(kept[:-1], kept[1:]):
        x0, y0, x1, y1 = xs[a], ys[a], xs[b], ys[b]
        dx, dy = x1 - x0, y1 - y0
        len2 = dx * dx + dy * dy
        for j in range(a + 1, b):
            cr = dx * (ys[j] - y0) - (xs[j] - x0) * dy
            assert cr * cr <= eps * eps * len2 + 1e-9


def test_spark_operator_matches_kernel(spark):
    rng = np.random.default_rng(21)
    rows = []
    want = {}
    for wid in range(6):
        n = int(rng.integers(2, 80))
        xs = np.cumsum(rng.uniform(0.1, 2.0, n))
        ys = rng.normal(0, 4, n)
        rows.append((wid, [float(v) for v in xs], [float(v) for v in ys]))
        idx = douglas_peucker_indices(xs, ys, 1.5)
        want[wid] = list(zip(xs[idx], ys[idx]))
    df = spark.createDataFrame(rows, "way_id long, xs array<double>, ys array<double>")
    got = {}
    for r in simplify_ways(df, eps=1.5).collect():
        got.setdefault(r["way_id"], []).append((r["ord"], r["x"], r["y"]))
    for wid in want:
        pts = [(x, y) for _, x, y in sorted(got[wid])]
        assert pts == want[wid], wid
