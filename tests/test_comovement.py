"""Companion detection (operators/trajectory.py::comovement) vs brute.

Engine candidates come from a per-tick 3x3 grid-blocked join; the brute
twin enumerates ALL pairs per tick. Equality proves the blocking is
lossless for Chebyshev distance <= radius with cell = floor(coord/r).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _synth(n_users: int = 40, ticks: int = 24):
    rows = []
    for u in range(n_users):
        bx, by = _h(f"bx{u}", 60), _h(f"by{u}", 60)
        for t in range(ticks):
            if _h(f"gap{u}_{t}", 5) == 0:  # missing ticks break runs
                continue
            rows.append(
                (u, t, bx + _h(f"wx{u}_{t}", 4), by + _h(f"wy{u}_{t}", 4))
            )
    # planted convoy: two users glued together for ticks 100..109
    rows += [(900, t, 7, 7) for t in range(100, 110)]
    rows += [(901, t, 9, 10) for t in range(100, 110)]
    return rows


def _brute(rows, r, min_run):
    by_tick = defaultdict(dict)
    for u, t, x, y in rows:
        by_tick[t][u] = (x, y)
    co = defaultdict(list)
    for t, pos in by_tick.items():
        us = sorted(pos)
        for i, a in enumerate(us):
            for b in us[i + 1:]:
                ax, ay = pos[a]
                bx, by = pos[b]
                if max(abs(ax - bx), abs(ay - by)) <= r:
                    co[(a, b)].append(t)
    out = {}
    for pair, ts in co.items():
        ts.sort()
        runs, cur = [], 1
        for p, q in zip(ts, ts[1:]):
            if q == p + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        eps = sum(1 for x in runs if x >= min_run)
        if eps:
            out[pair] = (
                eps,
                max(runs),
                sum(x for x in runs if x >= min_run),
            )
    return out


def test_comovement_matches_brute(spark):
    from osm_hadoop_spark.operators.trajectory import comovement

    rows = _synth()
    df = spark.createDataFrame(rows, "user_id long, tick long, x long, y long")
    got = {
        (r["a"], r["b"]): (r["episodes"], r["max_run"], r["co_ticks"])
        for r in comovement(df, radius=5, min_run=3).collect()
    }
    assert got == _brute(rows, r=5, min_run=3)
    assert got[(900, 901)] == (1, 10, 10)  # the planted convoy


def test_comovement_run_splitting(spark):
    """A gap tick splits a run; sub-min_run fragments don't qualify."""
    from osm_hadoop_spark.operators.trajectory import comovement

    rows = []
    for t in [0, 1, 2, 4, 5, 10]:  # runs of 3, 2, 1 co-located ticks
        rows += [(1, t, 0, 0), (2, t, 1, 1)]
    df = spark.createDataFrame(rows, "user_id long, tick long, x long, y long")
    out = comovement(df, radius=2, min_run=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"]) == (1, 2)
    assert (r["episodes"], r["max_run"], r["co_ticks"]) == (1, 3, 3)


def test_comovement_radius_boundary(spark):
    """Chebyshev exactly == radius qualifies; radius+1 does not — including
    across a grid-cell boundary (the blocking's worst case)."""
    from osm_hadoop_spark.operators.trajectory import comovement

    rows = []
    for t in range(3):
        rows += [(1, t, 4, 0), (2, t, 9, 0)]   # dist 5 == r, cells 0 vs 1
        rows += [(3, t, 20, 0), (4, t, 26, 0)]  # dist 6 > r
    df = spark.createDataFrame(rows, "user_id long, tick long, x long, y long")
    got = {(r["a"], r["b"]) for r in comovement(df, radius=5, min_run=2).collect()}
    assert got == {(1, 2)}
