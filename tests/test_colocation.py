"""Co-location participation (operators/colocation.py) vs brute pairs."""

from __future__ import annotations

import hashlib
from collections import defaultdict


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _brute(pts, r):
    part = defaultdict(set)
    tot = defaultdict(int)
    for i, x, y, c in pts:
        tot[c] += 1
    for i, (ia, xa, ya, ca) in enumerate(pts):
        for ib, xb, yb, cb in pts[i + 1:]:
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r:
                part[(ca, cb)].add(ia)
                part[(cb, ca)].add(ib)
    return {k: (len(v), tot[k[0]]) for k, v in part.items()}


def _synth():
    pts = [
        (i, _h(f"x{i}", 400), _h(f"y{i}", 400), _h(f"c{i}", 3))
        for i in range(250)
    ]
    # planted: class 0 point with a class 1 point 5 away and a far class 2
    pts += [(900, 1000, 1000, 0), (901, 1005, 1000, 1), (902, 2000, 2000, 2)]
    return pts


def test_colocation_matches_brute(spark):
    from osm_hadoop_spark.operators.colocation import colocation_participation

    pts = _synth()
    df = spark.createDataFrame(pts, "id long, x long, y long, cls long")
    got = {(r.cls, r.other_cls): (r.n_participating, r.n_total)
           for r in colocation_participation(df, radius=40).collect()}
    assert got == _brute(pts, 40)


def test_colocation_isolated_pair_directions(spark):
    from osm_hadoop_spark.operators.colocation import colocation_participation

    pts = [(1, 0, 0, 0), (2, 10, 0, 1), (3, 10000, 0, 1), (4, 10010, 0, 1)]
    df = spark.createDataFrame(pts, "id long, x long, y long, cls long")
    got = {(r.cls, r.other_cls): (r.n_participating, r.n_total)
           for r in colocation_participation(df, radius=40).collect()}
    # one 0-1 pair; the far (1,1) pair participates both of its points
    assert got == {(0, 1): (1, 1), (1, 0): (1, 3), (1, 1): (2, 3)}
