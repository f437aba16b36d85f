"""S2 envelope cover (functions/s2_cover.py): superset contract + shape.

The SQL twin is pinned by the s2_cover_l7 driver oracle (bit-exact
recursive-CTE replay of the subdivision); these tests pin the geometric
contract the cover-join relies on."""

from __future__ import annotations

import numpy as np

from osm_hadoop_spark.functions import s2
from osm_hadoop_spark.functions.s2_cover import cells_for_envelope_s2


def test_superset_property_random_rects():
    """Every cell containing any point of the rect MUST be in the cover
    (the filter-and-refine contract: false negatives are corruption,
    false positives are just refine work)."""
    rng = np.random.default_rng(11)
    for _ in range(30):
        lon0 = rng.uniform(-175, 170)
        lat0 = rng.uniform(-85, 80)
        lon1 = min(lon0 + rng.uniform(0.1, 8), 180.0)
        lat1 = min(lat0 + rng.uniform(0.1, 8), 90.0)
        level = int(rng.integers(3, 11))
        cells, _env = cells_for_envelope_s2(
            np.array([lon0]), np.array([lat0]),
            np.array([lon1]), np.array([lat1]), level,
        )
        cover = set(cells.tolist())
        pl = rng.uniform(lon0, lon1, 500)
        pa = rng.uniform(lat0, lat1, 500)
        inside = set(s2.cell_for_lonlat(pl, pa, level).tolist())
        assert inside <= cover


def test_cover_is_tight_not_trivial():
    """The conservative relaxations must not blow the cover up: for a
    mid-latitude rect the cover is within 2x of the cells actually hit
    by dense sampling."""
    rng = np.random.default_rng(3)
    cells, _ = cells_for_envelope_s2(
        np.array([10.0]), np.array([40.0]), np.array([18.0]), np.array([46.0]), 9
    )
    pl = rng.uniform(10, 18, 200000)
    pa = rng.uniform(40, 46, 200000)
    hit = set(s2.cell_for_lonlat(pl, pa, 9).tolist())
    assert hit <= set(cells.tolist())
    assert len(cells) <= 2 * len(hit)


def test_pole_and_seam_rects():
    rng = np.random.default_rng(5)
    # polar cap rect: all lons
    cells, _ = cells_for_envelope_s2(
        np.array([-180.0]), np.array([87.0]), np.array([180.0]), np.array([90.0]), 6
    )
    pl = rng.uniform(-180, 180, 3000)
    pa = rng.uniform(87, 90, 3000)
    assert set(s2.cell_for_lonlat(pl, pa, 6).tolist()) <= set(cells.tolist())
    # rect hugging the seam on the west side (planar, no wrap)
    cells, _ = cells_for_envelope_s2(
        np.array([-180.0]), np.array([-10.0]), np.array([-174.0]), np.array([-2.0]), 7
    )
    pl = rng.uniform(-180, -174, 3000)
    pa = rng.uniform(-10, -2, 3000)
    assert set(s2.cell_for_lonlat(pl, pa, 7).tolist()) <= set(cells.tolist())


def test_multi_envelope_indexing():
    """env_idx must tag each cell with its source rect; per-envelope
    covers equal the single-envelope computation."""
    lon0 = np.array([0.0, 100.0, -60.0])
    lat0 = np.array([0.0, 30.0, -45.0])
    lon1 = lon0 + 3.0
    lat1 = lat0 + 2.0
    cells, env = cells_for_envelope_s2(lon0, lat0, lon1, lat1, 8)
    for k in range(3):
        solo, _ = cells_for_envelope_s2(
            lon0[k : k + 1], lat0[k : k + 1], lon1[k : k + 1], lat1[k : k + 1], 8
        )
        assert set(cells[env == k].tolist()) == set(solo.tolist())


def test_adaptive_cover_compact_disjoint_superset():
    """adaptive=True: mixed levels, disjoint leaf ranges, never larger
    than the flat cover, and still a superset of every point's cell."""
    rng = np.random.default_rng(21)
    for _ in range(15):
        lon0 = rng.uniform(-170, 160)
        lat0 = rng.uniform(-80, 72)
        lon1 = lon0 + rng.uniform(1, 10)
        lat1 = lat0 + rng.uniform(1, 8)
        level = int(rng.integers(5, 11))
        args = (np.array([lon0]), np.array([lat0]), np.array([lon1]), np.array([lat1]), level)
        flat, _ = cells_for_envelope_s2(*args)
        adap, _ = cells_for_envelope_s2(*args, adaptive=True)
        assert len(adap) <= len(flat)
        lo, hi = s2.cell_range_min(adap), s2.cell_range_max(adap)
        order = np.argsort(lo)
        assert (lo[order][1:] > hi[order][:-1]).all()  # disjoint
        pl = rng.uniform(lon0, lon1, 300)
        pa = rng.uniform(lat0, lat1, 300)
        leaf = s2.cell_for_lonlat(pl, pa, 30)
        assert all(((leaf[k] >= lo) & (leaf[k] <= hi)).any() for k in range(len(leaf)))
