"""Marching squares (operators/contour.py): topology proof + brute force.

Two independent anchors:

  * a table-free TOPOLOGY property derived from the cell set alone:
    every emitted endpoint is the midpoint of a crossing edge (adjacent
    cells straddling the threshold), and every crossing edge carries
    exactly TWO endpoints — so the segments tile closed loops around
    every inside region (Jordan-style closure, no reference to the case
    table);
  * an independent Python brute force that classifies each block from
    the cell set and reads its own copy of the standard table.
"""

from __future__ import annotations

import hashlib

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _synth_cells():
    cells = {(_h(f"cx{i}", 40), _h(f"cy{i}", 20)) for i in range(260)}
    # handcrafted shapes: isolated cell, 2x2 solid, plus-shape (saddle
    # neighborhoods), diagonal pair (both saddle cases), 1-wide bridge
    cells |= {(100, 100)}
    cells |= {(110, 100), (111, 100), (110, 101), (111, 101)}
    cells |= {(121, 100), (120, 101), (121, 101), (122, 101), (121, 102)}
    cells |= {(130, 100), (131, 101)}          # case-5/10 saddles
    cells |= {(140, 100), (141, 100), (142, 100)}
    return sorted(cells)


def _brute(cells):
    cs = set(cells)
    bot, rgt, top, lft = (1, 0), (2, 1), (1, 2), (0, 1)
    table = {
        0: [], 1: [(lft, bot)], 2: [(bot, rgt)], 3: [(lft, rgt)],
        4: [(rgt, top)], 5: [(lft, bot), (rgt, top)], 6: [(bot, top)],
        7: [(lft, top)], 8: [(top, lft)], 9: [(bot, top)],
        10: [(bot, rgt), (top, lft)], 11: [(rgt, top)], 12: [(rgt, lft)],
        13: [(bot, rgt)], 14: [(lft, bot)], 15: [],
    }
    out = set()
    blocks = {(cx - dx, cy - dy) for cx, cy in cs for dx in (0, 1) for dy in (0, 1)}
    for bx, by in blocks:
        m = (
            ((bx, by) in cs) * 1 + ((bx + 1, by) in cs) * 2
            + ((bx + 1, by + 1) in cs) * 4 + ((bx, by + 1) in cs) * 8
        )
        for i, (a, b) in enumerate(table[m]):
            out.add((bx, by, m, i,
                     2 * bx + a[0], 2 * by + a[1], 2 * bx + b[0], 2 * by + b[1]))
    return out


def test_marching_squares_matches_brute_force(spark):
    from osm_hadoop_spark.operators.contour import marching_squares

    cells = _synth_cells()
    df = spark.createDataFrame(cells, "cx int, cy int")
    got = {
        (r.bx, r.by, r.mask, r.seg, r.x1d, r.y1d, r.x2d, r.y2d)
        for r in marching_squares(df).collect()
    }
    assert got == _brute(cells)


def test_marching_squares_closed_loops(spark):
    """Table-free topology: endpoints sit on crossing edges, two each."""
    from osm_hadoop_spark.operators.contour import marching_squares

    cells = _synth_cells()
    cs = set(cells)
    crossing = {}  # doubled midpoint -> required
    for cx, cy in cs:
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            if (cx + dx, cy + dy) not in cs:
                crossing[(2 * cx + dx, 2 * cy + dy)] = 2

    df = spark.createDataFrame(cells, "cx int, cy int")
    seen: dict[tuple[int, int], int] = {}
    for r in marching_squares(df).collect():
        for p in ((r.x1d, r.y1d), (r.x2d, r.y2d)):
            assert p in crossing, f"endpoint {p} not on a crossing edge"
            seen[p] = seen.get(p, 0) + 1
    assert seen == crossing  # every crossing edge covered exactly twice


def test_marching_squares_plan_single_exchange(spark):
    from osm_hadoop_spark.operators.contour import marching_squares

    df = spark.createDataFrame([(0, 0), (1, 0)], "cx int, cy int")
    plan = marching_squares(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # partial agg + final agg exchange
    assert "Python" not in plan
