"""Antimeridian behavior pins (round-2 verdict item 10).

Two deliberately different rules, both property-tested here:

- `tiles_for_envelope_flat` is PLANAR / no-wrap: [lon_min, lon_max] is a
  closed interval on the clipped lon axis (the reference's JTS Envelope
  model — a JTS envelope cannot represent a wrapping interval). A
  dateline-straddling geometry therefore covers (nearly) the whole x
  range; the reference mitigates exactly this with the F6 long-geometry
  guard upstream, and so do we.
- `grid_disk` WRAPS x around the antimeridian and clips y at the poles:
  a ring around a cell is a local neighborhood, not an envelope.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_hadoop_spark.functions.tiles import (
    _xtile,
    _ytile,
    grid_disk,
    pack_tile,
    tile_bounds,
    tiles_for_envelope_flat,
    unpack_tile,
)

lons = st.floats(min_value=-180.0, max_value=180.0,
                 allow_nan=False, allow_infinity=False)
lats = st.floats(min_value=-85.0, max_value=85.0,
                 allow_nan=False, allow_infinity=False)
zooms = st.integers(min_value=1, max_value=14)


spans = st.floats(min_value=0.0, max_value=1.5,
                  allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(lon=lons, lat=lats, dlon=spans, dlat=spans, z=zooms)
def test_envelope_cover_is_contiguous_no_wrap(lon, lat, dlon, dlat, z):
    """The cover's x set is EXACTLY the contiguous [xtile(lon_min),
    xtile(lon_max)] range — never wrapped, never holed, no duplicates.

    Spans are bounded (<= 1.5 deg) so the cover stays small at z=14; the
    whole-world case is pinned separately below."""
    lon_min, lon_max = lon, min(180.0, lon + dlon)
    lat_min, lat_max = lat, min(85.0, lat + dlat)
    tiles, idx = tiles_for_envelope_flat(
        np.array([lon_min]), np.array([lat_min]),
        np.array([lon_max]), np.array([lat_max]), z,
    )
    assert (idx == 0).all()
    assert len(np.unique(tiles)) == len(tiles)
    _tz, tx, ty = unpack_tile(tiles)
    x0 = int(_xtile(np.array([lon_min]), z)[0])
    x1 = int(_xtile(np.array([lon_max]), z)[0])
    y0 = int(_ytile(np.array([lat_max]), z)[0])
    y1 = int(_ytile(np.array([lat_min]), z)[0])
    assert set(tx.tolist()) == set(range(x0, x1 + 1))
    assert set(ty.tolist()) == set(range(y0, y1 + 1))
    # soundness: every covered tile's bounds intersect the (clipped) envelope
    bxmin, bymin, bxmax, bymax = tile_bounds(tiles)
    eps = 1e-9  # open/closed edge tolerance at tile boundaries
    assert (bxmax >= lon_min - eps).all() and (bxmin <= lon_max + eps).all()


@settings(max_examples=100, deadline=None)
@given(lon=lons, lat=lats, z=zooms)
def test_envelope_cover_completeness_contains_point_tile(lon, lat, z):
    """Any point inside the envelope lands in a covered tile."""
    tiles, _ = tiles_for_envelope_flat(
        np.array([lon - 0.5]), np.array([lat - 0.5]),
        np.array([lon + 0.5]), np.array([lat + 0.5]), z,
    )
    pt = pack_tile(z, _xtile(np.array([lon]), z), _ytile(np.array([lat]), z))
    assert pt[0] in set(tiles.tolist())


@given(z=zooms)
@settings(max_examples=30, deadline=None)
def test_dateline_straddle_covers_whole_x_range(z):
    """The pinned no-wrap consequence: an envelope from just-east-of-the-
    antimeridian to just-west-of-it spans the WHOLE x range (this is the
    behavior the F6 guard exists to keep out of the spatial join)."""
    n = 1 << z
    tiles, _ = tiles_for_envelope_flat(
        np.array([-179.9]), np.array([0.0]),
        np.array([179.9]), np.array([1.0]), z,
    )
    _tz, tx, _ty = unpack_tile(tiles)
    x0 = int(_xtile(np.array([-179.9]), z)[0])
    x1 = int(_xtile(np.array([179.9]), z)[0])
    assert set(tx.tolist()) == set(range(x0, x1 + 1))
    # near-whole-world: a WRAPPING interpretation would cover only the two
    # thin slivers (< 0.2 degrees) at the seam; the planar rule covers all
    # but those slivers (each at most ceil(0.1/360 * n) + 1 tiles wide)
    import math

    sliver = math.ceil(0.1 / 360.0 * n) + 1
    assert x1 - x0 + 1 >= max(1, n - 2 * sliver)


@settings(max_examples=200, deadline=None)
@given(lon=lons, lat=lats, z=zooms, k=st.integers(min_value=1, max_value=3))
def test_grid_disk_wraps_x_clips_y(lon, lat, z, k):
    """grid_disk == the set of cells at Chebyshev distance <= k with x
    wrapped mod 2^z and y clipped to [0, 2^z) — computed independently."""
    n = 1 << z
    cx = int(_xtile(np.array([lon]), z)[0])
    cy = int(_ytile(np.array([lat]), z)[0])
    got, src = grid_disk(pack_tile(z, np.array([cx]), np.array([cy])), k)
    assert (src == 0).all()
    want = {
        (z, (cx + dx) % n, cy + dy)
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
        if 0 <= cy + dy < n
    }
    gz, gx, gy = unpack_tile(got)
    assert set(zip(gz.tolist(), gx.tolist(), gy.tolist())) == want
    # no duplicates even when the wrap folds the ring onto itself (small n)
    assert len(got) == len(want)


def test_grid_disk_wrap_is_symmetric_at_the_seam():
    """x=0 sees x=n-1 and vice versa (the wrap the envelope cover refuses)."""
    z, k = 5, 1
    n = 1 << z
    left, _ = grid_disk(pack_tile(z, np.array([0]), np.array([7])), k)
    right, _ = grid_disk(pack_tile(z, np.array([n - 1]), np.array([7])), k)
    _lz, lx, _ly = unpack_tile(left)
    _rz, rx, _ry = unpack_tile(right)
    assert (n - 1) in lx.tolist() and 0 in rx.tolist()
