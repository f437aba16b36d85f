"""Join-count statistics (operators/autocorr.py) vs an independent brute
force: dict-based cell binning, explicit 4-neighbor enumeration, and the
textbook CSR expectation formulas computed with Python bigints."""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.autocorr import cell_census, join_count_stats


@pytest.fixture(scope="module")
def pts(spark):
    # deterministic mixed layout: a dense block (black cells), a sparse
    # fringe (white cells), and isolated singletons
    rows = []
    i = 0
    for gx in range(6):
        for gy in range(6):
            if (gx + gy) % 5 == 0:
                continue  # unoccupied holes
            # left half dense (black), right half sparse (white) — all
            # three adjacency classes occur, incl. the BW frontier
            k = 3 if gx < 3 else 1
            for j in range(k):
                rows.append((i, gx * 10 + (j % 3), gy * 10 + (j // 3)))
                i += 1
    return spark.createDataFrame(rows, "id long, x long, y long")


def _brute(rows, cell, black_min):
    cells = {}
    for _, x, y in rows:
        key = (x // cell, y // cell)
        cells[key] = cells.get(key, 0) + 1
    black = {k: n >= black_min for k, n in cells.items()}
    obs = {"BB": 0, "WW": 0, "BW": 0}
    for (cx, cy), ba in black.items():
        for nk in [(cx + 1, cy), (cx, cy + 1)]:
            if nk in black:
                bb = black[nk]
                obs["BB" if ba and bb else "WW" if not ba and not bb else "BW"] += 1
    n = len(cells)
    nb = sum(black.values())
    j = sum(obs.values())
    exp = {
        "BB": Fraction(j * nb * (nb - 1), n * (n - 1)),
        "WW": Fraction(j * (n - nb) * (n - nb - 1), n * (n - 1)),
        "BW": Fraction(j * 2 * nb * (n - nb), n * (n - 1)),
    }
    return obs, exp, n, nb


def test_join_counts_match_brute(spark, pts):
    rows = [(r["id"], r["x"], r["y"]) for r in pts.collect()]
    obs, exp, n, nb = _brute(rows, 10, 2)
    assert 0 < nb < n  # fixture really is mixed

    out = join_count_stats(pts, cell_size=10, black_min=2)
    got = {r["pair_cls"]: r for r in out.collect()}
    assert {k: r["observed"] for k, r in got.items()} == {
        k: v for k, v in obs.items() if v > 0
    }
    for k, r in got.items():
        assert Fraction(r["expect_num"], r["expect_den"]) == exp[k]

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan  # only broadcast 1-row totals


def test_join_counts_sum_identity(spark, pts):
    """Sum of observed pair counts == total adjacencies == sum of CSR
    expectations (the rationals partition J exactly)."""
    out = join_count_stats(pts, cell_size=10, black_min=2).collect()
    j = sum(r["observed"] for r in out)
    s = sum(Fraction(r["expect_num"], r["expect_den"]) for r in out)
    # expectations of absent classes are 0 only if that class truly has
    # zero probability; with all three classes present they must sum to J
    assert len(out) == 3 and s == j


def test_cell_census_exact(spark, pts):
    got = {
        (r["cx"], r["cy"]): r["n"]
        for r in cell_census(pts, 10).collect()
    }
    brute = {}
    for r in pts.collect():
        key = (r["x"] // 10, r["y"] // 10)
        brute[key] = brute.get(key, 0) + 1
    assert got == brute


def test_label_hot_regions_vs_union_find(spark, pts):
    """label_hot_regions must equal an independent union-find labeling
    over the same black-cell adjacency (incl. isolated singletons)."""
    from osm_hadoop_spark.operators.autocorr import label_hot_regions

    rows = [(r["x"], r["y"]) for r in pts.collect()]
    cells = {}
    for x, y in rows:
        key = (x // 10, y // 10)
        cells[key] = cells.get(key, 0) + 1
    black = {k for k, n in cells.items() if n >= 2}

    parent = {k: k for k in black}

    def find(k):
        while parent[k] != k:
            parent[k] = parent[parent[k]]
            k = parent[k]
        return k

    for cx, cy in black:
        for nk in [(cx + 1, cy), (cx, cy + 1)]:
            if nk in black:
                ra, rb = find((cx, cy)), find(nk)
                if ra != rb:
                    parent[ra] = rb

    off, mult = 1 << 20, 1 << 21

    def pack(c):
        return (c[0] + off) * mult + (c[1] + off)

    groups = {}
    for k in black:
        groups.setdefault(find(k), []).append(k)
    want = set()
    for members in groups.values():
        region = min(pack(m) for m in members)
        n_cells = len(members)
        n_points = sum(cells[m] for m in members)
        xs = [m[0] for m in members]; ys = [m[1] for m in members]
        want.add((region, n_cells, n_points, min(xs), max(xs), min(ys), max(ys)))

    got = {
        (r["region"], r["n_cells"], r["n_points"],
         r["min_cx"], r["max_cx"], r["min_cy"], r["max_cy"])
        for r in label_hot_regions(pts, cell_size=10, black_min=2).collect()
    }
    assert got == want and len(want) > 1
    # fixture must exercise both multi-cell regions and singletons
    sizes = sorted(n for _, n, *_ in want)
    assert sizes[0] >= 1 and sizes[-1] > 1
