"""Morphological cell ops vs independent Python set arithmetic, plus the
algebraic laws (anti-extensivity of opening, extensivity of closing,
idempotence) on a fixture with a hole (closing must fill) and an island
(opening must remove)."""

from __future__ import annotations

import pytest

from osm_hadoop_spark.operators.morphology import (
    close_cells,
    dilate_cells,
    erode_cells,
    open_cells,
)


@pytest.fixture(scope="module")
def grid(spark):
    # 7x7 block with a hole at (3,3), plus an isolated island at (20,20)
    cells = [(x, y) for x in range(7) for y in range(7) if (x, y) != (3, 3)]
    cells.append((20, 20))
    return spark.createDataFrame(cells, "cx long, cy long"), set(cells)


def _brute_dilate(s, r):
    return {(x + dx, y + dy) for x, y in s
            for dx in range(-r, r + 1) for dy in range(-r, r + 1)}


def _brute_erode(s, r):
    return {(x, y) for x, y in _brute_dilate(s, r)  # candidates superset
            if all((x + dx, y + dy) in s
                   for dx in range(-r, r + 1) for dy in range(-r, r + 1))}


def _collect(df):
    return {(r["cx"], r["cy"]) for r in df.collect()}


def test_dilate_erode_vs_brute(spark, grid):
    df, s = grid
    for r in (1, 2):
        assert _collect(dilate_cells(df, r)) == _brute_dilate(s, r)
        assert _collect(erode_cells(df, r)) == _brute_erode(s, r)


def test_close_fills_hole_open_drops_island(spark, grid):
    df, s = grid
    closed = _collect(close_cells(df, 1))
    opened = _collect(open_cells(df, 1))
    assert (3, 3) in closed            # hole filled
    assert (20, 20) not in opened      # island removed
    assert opened <= s <= closed       # anti-extensive / extensive
    # idempotence: closing the closed set changes nothing
    closed_df = spark.createDataFrame(sorted(closed), "cx long, cy long")
    assert _collect(close_cells(closed_df, 1)) == closed
    # brute cross-check of the compositions
    assert closed == _brute_erode(_brute_dilate(s, 1), 1)
    assert opened == _brute_dilate(_brute_erode(s, 1), 1)


def test_morphology_stays_jvm(spark, grid):
    df, _ = grid
    plan = close_cells(df, 1)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Join" not in plan
