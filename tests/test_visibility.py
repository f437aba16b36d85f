"""Line-of-sight (operators/visibility.py): brute force + plan shape.

The independent anchor walks each sight line with the LITERAL scalar
Bresenham test oracle (functions/raster.py::rasterize_segments_scalar,
the per-pixel port proved bit-exact against the closed form), reversed
into observer order, and applies the exact cross-multiplied blocking
test per intermediate cell in plain Python — no DSL, no Spark.

Properties pinned on top of the row-for-row match:
  * symmetry — `visible` is invariant under (observer, target) swap
    because the operator canonicalizes the walk direction;
  * trivial pairs (d_fast < 2) are always visible with no first_block;
  * plan shape — the whole operator is JVM-only (no Python stages) and
    the non-broadcast path carries exactly the join + aggregate
    exchanges, nothing quadratic.
"""

from __future__ import annotations

import hashlib

from osm_hadoop_spark.functions.raster import rasterize_segments_scalar
from osm_hadoop_spark.operators.visibility import line_of_sight

GRID = 40


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _pairs():
    rows = []
    for i in range(240):
        rows.append(
            (
                i,
                _h(f"ox{i}", GRID),
                _h(f"oy{i}", GRID),
                _h(f"tx{i}", GRID),
                _h(f"ty{i}", GRID),
                _h(f"oh{i}", 900) + 300,
                _h(f"th{i}", 900) + 300,
            )
        )
    # forced edge cases: same cell, adjacent, axis-aligned, |dx|==|dy| tie
    rows.append((9001, 5, 5, 5, 5, 400, 700))
    rows.append((9002, 5, 5, 6, 5, 400, 700))
    rows.append((9003, 5, 5, 5, 25, 400, 700))
    rows.append((9004, 30, 5, 10, 5, 700, 400))
    rows.append((9005, 3, 3, 13, 13, 500, 500))
    rows.append((9006, 13, 13, 3, 3, 500, 500))
    return rows


def _dem():
    cells = {}
    for i in range(900):
        cx, cy = _h(f"dx{i}", GRID), _h(f"dy{i}", GRID)
        cells[(cx, cy)] = max(cells.get((cx, cy), 0), _h(f"de{i}", 1400) + 1)
    return cells


def _brute(pairs, dem, default=0):
    out = {}
    for pid, ox, oy, tx, ty, oh, th in pairs:
        cells = rasterize_segments_scalar(ox, oy, tx, ty)
        if cells[0] != (ox, oy):
            cells.reverse()
        assert cells[0] == (ox, oy) and cells[-1] == (tx, ty)
        big_k = len(cells) - 1
        if big_k < 2:
            out[pid] = (big_k, 0, None, 1)
            continue
        blocked = [
            j
            for j in range(1, big_k)
            if dem.get(cells[j], default) * big_k >= oh * (big_k - j) + th * j
        ]
        out[pid] = (
            big_k,
            len(blocked),
            blocked[0] if blocked else None,
            0 if blocked else 1,
        )
    return out


def test_line_of_sight_matches_brute(spark):
    pairs = _pairs()
    dem = _dem()
    pdf = spark.createDataFrame(
        pairs, "pair_id long, ox long, oy long, tx long, ty long, oh long, th long"
    )
    ddf = spark.createDataFrame(
        [(cx, cy, e) for (cx, cy), e in dem.items()], "cx long, cy long, elev long"
    )
    got = {
        r["pair_id"]: (r["steps"], r["n_blocked"], r["first_block"], r["visible"])
        for r in line_of_sight(pdf, ddf).collect()
    }
    want = _brute(pairs, dem)
    assert got == want
    # sanity: the synthetic mix exercises both verdicts and the trivial path
    vis = [v[3] for v in want.values()]
    assert 0 < sum(vis) < len(vis)
    assert any(v[0] < 2 for v in want.values())


def test_line_of_sight_symmetry(spark):
    pairs = _pairs()
    dem = _dem()
    swapped = [(pid, tx, ty, ox, oy, th, oh) for pid, ox, oy, tx, ty, oh, th in pairs]
    a = _brute(pairs, dem)
    b = _brute(swapped, dem)
    for pid in a:
        assert a[pid][3] == b[pid][3]  # visible is endpoint-symmetric
        assert a[pid][0] == b[pid][0]


def test_line_of_sight_default_elev(spark):
    # no DEM rows at all + default above every sight line -> all blocked
    pdf = spark.createDataFrame(
        [(1, 0, 0, 9, 3, 10, 10)],
        "pair_id long, ox long, oy long, tx long, ty long, oh long, th long",
    )
    empty = spark.createDataFrame([], "cx long, cy long, elev long")
    row = line_of_sight(pdf, empty, default_elev=99).collect()[0]
    assert row["visible"] == 0 and row["n_blocked"] == row["steps"] - 1
    assert row["first_block"] == 1


def test_line_of_sight_plan_shape(spark):
    pdf = spark.createDataFrame(
        [(1, 0, 0, 9, 3, 10, 10)],
        "pair_id long, ox long, oy long, tx long, ty long, oh long, th long",
    )
    ddf = spark.createDataFrame([(1, 1, 5)], "cx long, cy long, elev long")
    plan = (
        line_of_sight(pdf, ddf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan
    bplan = (
        line_of_sight(pdf, ddf, broadcast_dem=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in bplan
