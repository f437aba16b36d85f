"""Polygon dissolve (operators/dissolve.py) vs a union-find brute force."""

from __future__ import annotations

import hashlib

import pytest


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _cells(n: int, w: int):
    """Deterministic occupied unit cells on a w x w grid (deduped)."""
    seen = {}
    for i in range(n):
        cx, cy = _h(f"bx{i}", w), _h(f"by{i}", w)
        seen.setdefault((cx, cy), cx * w + cy)
    return [
        (pid, [cx, cx + 1, cx + 1, cx], [cy, cy, cy + 1, cy + 1])
        for (cx, cy), pid in seen.items()
    ]


def _brute_dissolve(cells):
    """{poly_id: (region_id, boundary_edges)} — union-find over shared
    edges, boundary = edges with exactly one incidence."""
    edges = {}
    for pid, xs, ys in cells:
        n = len(xs)
        for i in range(n):
            a = (xs[i], ys[i])
            b = (xs[(i + 1) % n], ys[(i + 1) % n])
            edges.setdefault((min(a, b), max(a, b)), []).append(pid)

    parent = {pid: pid for pid, _, _ in cells}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for polys in edges.values():
        for p in polys[1:]:
            ra, rb = find(polys[0]), find(p)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    region = {}
    for pid in parent:
        members = [q for q in parent if find(q) == find(pid)]
        region[pid] = min(members)
    boundary = {pid: 0 for pid in parent}
    for polys in edges.values():
        if len(polys) == 1:
            boundary[polys[0]] += 1
    return {pid: (region[pid], boundary[pid]) for pid in parent}


@pytest.fixture(scope="module")
def cell_polys(spark):
    cells = _cells(300, 20)  # dense 20x20 -> large merged blobs
    df = spark.createDataFrame(
        cells, "poly_id long, xs array<long>, ys array<long>"
    ).cache()
    return df, cells


def test_dissolve_matches_brute_force(spark, cell_polys):
    from osm_hadoop_spark.operators.dissolve import dissolve

    df, cells = cell_polys
    got = {
        r["poly_id"]: (r["region_id"], r["boundary_edges"])
        for r in dissolve(df).collect()
    }
    want = _brute_dissolve(cells)
    assert got == want
    regions = {v[0] for v in want.values()}
    assert 1 < len(regions) < len(cells), "must actually merge"


def test_dissolve_isolated_and_boundary_sum(spark):
    from osm_hadoop_spark.operators.dissolve import dissolve

    # two touching cells + one isolated: one region of 2, one singleton;
    # region boundary = 4+4-2 (the shared edge cancels)
    cells = [
        (1, [0, 1, 1, 0], [0, 0, 1, 1]),
        (2, [1, 2, 2, 1], [0, 0, 1, 1]),
        (9, [5, 6, 6, 5], [5, 5, 6, 6]),
    ]
    df = spark.createDataFrame(cells, "poly_id long, xs array<long>, ys array<long>")
    rows = {r["poly_id"]: r for r in dissolve(df).collect()}
    assert rows[1]["region_id"] == rows[2]["region_id"] == 1
    assert rows[9]["region_id"] == 9
    assert rows[1]["boundary_edges"] + rows[2]["boundary_edges"] == 6
    assert rows[9]["boundary_edges"] == 4
