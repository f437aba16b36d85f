"""Property + golden tests for the pure-NumPy kernels (no Spark needed)."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_hadoop_spark.functions.geometry import (
    envelopes_flat,
    format_linestring_wkt,
    linestring_length_flat,
    parse_wkt_batch,
)
from osm_hadoop_spark.functions.grid import (
    GlobalGrid,
    RasterGrid,
    flip_y,
    pack_xy,
    unpack_xy,
)
from osm_hadoop_spark.functions.raster import (
    rasterize_segments,
    rasterize_segments_scalar,
)
from osm_hadoop_spark.functions.spatial import (
    point_in_polygon_pairs,
    point_polyline_dist_sq,
    polyline_box_intersects,
    segment_box_intersects,
)
from osm_hadoop_spark.functions.tiles import (
    grid_disk,
    pack_tile,
    tile_bounds,
    tile_for_point,
    tiles_for_envelope_flat,
    unpack_tile,
)

coord = st.integers(min_value=-10_000, max_value=10_000)


@settings(max_examples=300, deadline=None)
@given(coord, coord, coord, coord)
def test_bresenham_matches_reference_algorithm(x1, y1, x2, y2):
    """Closed form == literal Rasterizer.java:22-134 loop, pixel order included."""
    px, py, _ = rasterize_segments(
        np.array([x1]), np.array([y1]), np.array([x2]), np.array([y2])
    )
    ref = rasterize_segments_scalar(x1, y1, x2, y2)
    assert list(zip(px.tolist(), py.tolist())) == ref


@settings(max_examples=100, deadline=None)
@given(coord, coord, coord, coord)
def test_bresenham_endpoint_containment_and_connectivity(x1, y1, x2, y2):
    px, py, _ = rasterize_segments(
        np.array([x1]), np.array([y1]), np.array([x2]), np.array([y2])
    )
    pix = set(zip(px.tolist(), py.tolist()))
    assert (x1, y1) in pix and (x2, y2) in pix
    # 8-connectivity along the plotted order
    for i in range(1, len(px)):
        assert max(abs(px[i] - px[i - 1]), abs(py[i] - py[i - 1])) == 1


def test_bresenham_batch_equals_loop():
    rng = np.random.default_rng(7)
    pts = rng.integers(-300, 300, size=(500, 4))
    px, py, si = rasterize_segments(pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3])
    for i in range(pts.shape[0]):
        ref = rasterize_segments_scalar(*map(int, pts[i]))
        got = list(zip(px[si == i].tolist(), py[si == i].tolist()))
        assert got == ref


def test_global_grid_snap_golden():
    """GlobalGrid.scala:19-28 formula at the 43200x21600 grid."""
    g = GlobalGrid(43200, 21600)
    x, y = g.snap(np.array([0.0, -180.0, 179.999, -2.0]), np.array([0.0, -90.0, 89.999, -1.0]))
    assert x.tolist() == [21600, 0, 43199, 21360]
    assert y.tolist() == [10800, 0, 21599, 10680]


def test_snap_truncates_toward_zero_not_floor():
    """Scala .toInt truncation: (-0.4).toInt == 0, floor would give -1."""
    g = RasterGrid(origin_x=10.0, origin_y=50.0, pixel_size_x=1.0, pixel_size_y=1.0)
    x, y = g.snap(np.array([9.6]), np.array([50.4]))  # (lon-10)/1 = -0.4
    assert x.tolist() == [0]
    assert y.tolist() == [0]


@settings(max_examples=100, deadline=None)
@given(st.floats(-180, 180, allow_nan=False), st.floats(-90, 90, allow_nan=False))
def test_snap_monotonic(lon, lat):
    g = GlobalGrid(43200, 21600)
    x1, _ = g.snap(np.array([lon]), np.array([lat]))
    x2, _ = g.snap(np.array([min(lon + 0.01, 180.0)]), np.array([lat]))
    assert x2[0] >= x1[0]


@settings(max_examples=200, deadline=None)
@given(st.integers(-(2**31), 2**31 - 1), st.integers(-(2**31), 2**31 - 1))
def test_pack_unpack_roundtrip(x, y):
    x2, y2 = unpack_xy(pack_xy(np.array([x]), np.array([y])))
    assert (x2[0], y2[0]) == (x, y)


def test_flip_y():
    assert flip_y(np.array([0, 21599]), 21600).tolist() == [21599, 0]


@settings(max_examples=200, deadline=None)
@given(
    st.floats(-179.9, 179.9, allow_nan=False),
    st.floats(-84.9, 84.9, allow_nan=False),
    st.integers(0, 18),
)
def test_tile_point_in_own_bounds(lon, lat, z):
    t = tile_for_point(np.array([lon]), np.array([lat]), z)
    zz, xx, yy = unpack_tile(t)
    assert zz[0] == z and 0 <= xx[0] < 2**z and 0 <= yy[0] < 2**z
    lon_min, lat_min, lon_max, lat_max = tile_bounds(t)
    assert lon_min[0] - 1e-9 <= lon <= lon_max[0] + 1e-9
    assert lat_min[0] - 1e-6 <= lat <= lat_max[0] + 1e-6


def test_tiles_for_envelope_covers_point_tiles():
    rng = np.random.default_rng(3)
    for _ in range(50):
        lon = rng.uniform(-170, 169, 2)
        lat = rng.uniform(-80, 79, 2)
        env = (min(lon), min(lat), max(lon), max(lat))
        tiles, _ = tiles_for_envelope_flat(
            np.array([env[0]]), np.array([env[1]]), np.array([env[2]]), np.array([env[3]]), 6
        )
        tset = set(tiles.tolist())
        # corner points must land in covered tiles
        for lo, la in [(env[0], env[1]), (env[2], env[3]), (env[0], env[3]), (env[2], env[1])]:
            assert tile_for_point(np.array([lo]), np.array([la]), 6)[0] in tset


def test_grid_disk_counts_and_wrap():
    t = tile_for_point(np.array([179.9]), np.array([0.0]), 4)
    cells, src = grid_disk(t, 1)
    assert len(cells) == 9  # x wraps, y unclipped at equator
    z, x, y = unpack_tile(cells)
    assert (x == 0).any()  # wrapped across antimeridian


def test_tms_flip():
    t_xyz = tile_for_point(np.array([0.5]), np.array([0.5]), 10, tms=False)
    t_tms = tile_for_point(np.array([0.5]), np.array([0.5]), 10, tms=True)
    _, _, y_xyz = unpack_tile(t_xyz)
    _, _, y_tms = unpack_tile(t_tms)
    assert y_xyz[0] + y_tms[0] == 2**10 - 1


def test_wkt_roundtrip_and_format():
    wkt = "LINESTRING (-2 -1, -4 -3, -6 -5)"
    xs, ys, cnt = parse_wkt_batch([wkt])
    assert format_linestring_wkt(xs, ys) == wkt
    assert cnt.tolist() == [3]
    xs, ys, cnt = parse_wkt_batch(["LINESTRING (0.5 1.25, 2 3)"])
    assert format_linestring_wkt(xs, ys) == "LINESTRING (0.5 1.25, 2 3)"


def test_length_and_envelope_flat():
    xs, ys, cnt = parse_wkt_batch(
        ["LINESTRING (0 0, 3 4)", "LINESTRING (0 0, 1 0, 1 1)"]
    )
    assert linestring_length_flat(xs, ys, cnt).tolist() == [5.0, 2.0]
    xmin, ymin, xmax, ymax = envelopes_flat(xs, ys, cnt)
    assert xmin.tolist() == [0, 0] and xmax.tolist() == [3, 1]
    assert ymax.tolist() == [4, 1]


def test_segment_box_intersects_cases():
    # crossing, inside, outside, touching-corner diagonal
    r = segment_box_intersects(
        np.array([-1.0, 0.25, -2.0, -1.0]),
        np.array([0.5, 0.25, -2.0, 2.0]),
        np.array([2.0, 0.75, -1.5, 2.0]),
        np.array([0.5, 0.75, -1.5, -1.0]),
        np.array([0.0, 0.0, 0.0, 0.0]),
        np.array([0.0, 0.0, 0.0, 0.0]),
        np.array([1.0, 1.0, 1.0, 1.0]),
        np.array([1.0, 1.0, 1.0, 1.0]),
    )
    assert r.tolist() == [True, True, False, True]


def test_pip_square_and_concave():
    # unit square
    poly_x = np.array([0.0, 1.0, 1.0, 0.0] * 2)
    poly_y = np.array([0.0, 0.0, 1.0, 1.0] * 2)
    counts = np.array([4, 4])
    inside = point_in_polygon_pairs(
        np.array([0.5, 1.5]), np.array([0.5, 0.5]), poly_x, poly_y, counts
    )
    assert inside.tolist() == [True, False]
    # concave "C" shape: point in the notch is outside
    cx = np.array([0, 4, 4, 1, 1, 4, 4, 0], dtype=float)
    cy = np.array([0, 0, 1, 1, 3, 3, 4, 4], dtype=float)
    got = point_in_polygon_pairs(
        np.array([2.0, 0.5]), np.array([2.0, 2.0]),
        np.concatenate([cx, cx]), np.concatenate([cy, cy]), np.array([8, 8]),
    )
    assert got.tolist() == [False, True]


def test_polyline_box_and_distance():
    xs, ys, cnt = parse_wkt_batch(["LINESTRING (0 0, 10 0)", "LINESTRING (0 5, 10 5)"])
    hit = polyline_box_intersects(
        xs, ys, cnt,
        np.array([4.0, 4.0]), np.array([-1.0, -1.0]),
        np.array([6.0, 6.0]), np.array([1.0, 1.0]),
    )
    assert hit.tolist() == [True, False]
    d = point_polyline_dist_sq(np.array([5.0, 5.0]), np.array([3.0, 3.0]), xs, ys, cnt)
    assert d.tolist() == [9.0, 4.0]
