"""Web-mercator (XYZ) / TMS tile math + hierarchical quadkey cell index.

The reference delegates tile math to the external artifact
org.roadlessforest:osm-hbase:0.1 (pom.xml:56-59; classes TmsTileCalculator /
MercatorTileCalculator — source not present). We implement the standard
slippy-map formulas natively, vectorized (call sites:
buffer/RoadlessRoadCount.scala:144 tilesForEnvelope,
rasterstats/ImageRegions.scala:114 tileForCoordinate).

The same (z, x, y) quadtree doubles as the engine's hierarchical cell index
(H3/S2 role in the north rule — neither library ships in this container):
packed 64-bit ids, parent/children navigation, and k-ring `grid_disk` for
kNN candidate expansion. A quadkey cell is an S2-style space-filling index
over the web-mercator projection; polyfill of an envelope is exact (it IS
the tile cover).

Conventions:
  - XYZ (google/slippy): y = 0 at the north edge, grows south.
  - TMS: y flipped, y_tms = 2^z - 1 - y_xyz (the reference's TmsTile).
  - packed id = (z << 58) | (x << 29) | y  (config.py bit layout).
"""

from __future__ import annotations

import numpy as np

from osm_hadoop_spark.config import TILE_X_SHIFT, TILE_XY_MASK, TILE_Z_SHIFT

MAX_MERC_LAT = 85.05112877980659


def pack_tile(z: np.ndarray | int, x: np.ndarray | int, y: np.ndarray | int) -> np.ndarray:
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (z << TILE_Z_SHIFT) | (x << TILE_X_SHIFT) | y


def unpack_tile(tile_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    t = np.asarray(tile_id, dtype=np.int64)
    z = t >> TILE_Z_SHIFT
    x = (t >> TILE_X_SHIFT) & TILE_XY_MASK
    y = t & TILE_XY_MASK
    return z, x, y


def _xtile(lon: np.ndarray, z: int) -> np.ndarray:
    n = np.int64(1) << z
    xt = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    return np.clip(xt, 0, n - 1)


def _ytile(lat: np.ndarray, z: int) -> np.ndarray:
    n = np.int64(1) << z
    lat = np.clip(lat, -MAX_MERC_LAT, MAX_MERC_LAT)
    lat_rad = np.radians(lat)
    yt = np.floor(
        (1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    return np.clip(yt, 0, n - 1)


def tile_for_point(lon: np.ndarray, lat: np.ndarray, z: int, tms: bool = False) -> np.ndarray:
    """(lon, lat) -> packed tile id at zoom z (E10; ImageRegions.scala:114)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    xt = _xtile(lon, z)
    yt = _ytile(lat, z)
    if tms:
        yt = ((np.int64(1) << z) - 1) - yt
    return pack_tile(z, xt, yt)


def tile_bounds(tile_id: np.ndarray, tms: bool = False):
    """packed id -> (lon_min, lat_min, lon_max, lat_max) of the tile envelope."""
    z, x, y = unpack_tile(np.asarray(tile_id, dtype=np.int64))
    n = (np.int64(1) << z).astype(np.float64)
    if tms:
        y = (np.int64(1) << z) - 1 - y
    lon_min = x / n * 360.0 - 180.0
    lon_max = (x + 1) / n * 360.0 - 180.0
    lat_max = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / n))))
    lat_min = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (y + 1) / n))))
    return lon_min, lat_min, lon_max, lat_max


def tiles_for_envelope_flat(
    lon_min: np.ndarray,
    lat_min: np.ndarray,
    lon_max: np.ndarray,
    lat_max: np.ndarray,
    z: int,
    tms: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Tile cover ("polyfill") of many envelopes at once (E9).

    Returns (tile_id, env_idx) flat arrays: every candidate tile touching each
    envelope plus the index of the source envelope. Mirrors
    TmsTileCalculator.tilesForEnvelope semantics (all tiles whose envelope
    intersects the query envelope) — the filter stage of the filter-and-refine
    spatial join (J3).

    Antimeridian rule (pinned by tests/test_tiles_antimeridian.py): the
    envelope is PLANAR — [lon_min, lon_max] is a closed interval on the
    clipped [-180, 180] axis and the x cover never wraps. This matches the
    reference's JTS Envelope model (a JTS envelope cannot represent a
    wrapping interval): a geometry whose vertices straddle the dateline
    gets a near-whole-world x cover, and the reference's own mitigation is
    the F6 long-geometry guard (drop > 50 planar degrees) upstream, which
    this engine applies in the same place (operators/rasterize.py,
    plans/pipeline.py). `grid_disk` below intentionally differs: a ring
    around a CELL is a local neighborhood, so its x DOES wrap.
    """
    lon_min = np.asarray(lon_min, dtype=np.float64)
    lat_min = np.asarray(lat_min, dtype=np.float64)
    lon_max = np.asarray(lon_max, dtype=np.float64)
    lat_max = np.asarray(lat_max, dtype=np.float64)

    x0 = _xtile(lon_min, z)
    x1 = _xtile(lon_max, z)
    # xyz y grows southward: north edge (lat_max) has the smaller y
    y0 = _ytile(lat_max, z)
    y1 = _ytile(lat_min, z)

    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    counts = nx * ny
    total = int(counts.sum())
    env_idx = np.repeat(np.arange(lon_min.shape[0], dtype=np.int64), counts)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    k = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)

    nyr = np.repeat(ny, counts)
    xs = np.repeat(x0, counts) + k // nyr
    ys = np.repeat(y0, counts) + k % nyr
    if tms:
        ys = ((np.int64(1) << z) - 1) - ys
    return pack_tile(z, xs, ys), env_idx


def cell_parent(tile_id: np.ndarray, steps: int = 1) -> np.ndarray:
    """Quadtree parent `steps` levels up (cell-index navigation)."""
    z, x, y = unpack_tile(tile_id)
    return pack_tile(z - steps, x >> steps, y >> steps)


def cell_children(tile_id: int) -> np.ndarray:
    """The 4 children one level down."""
    z, x, y = unpack_tile(np.asarray([tile_id]))
    zc, xc, yc = z[0] + 1, x[0] << 1, y[0] << 1
    xs = np.array([xc, xc + 1, xc, xc + 1], dtype=np.int64)
    ys = np.array([yc, yc, yc + 1, yc + 1], dtype=np.int64)
    return pack_tile(np.full(4, zc, dtype=np.int64), xs, ys)


def grid_disk(tile_id: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """All cells within Chebyshev distance k of each input cell (H3
    `grid_disk` analog) — kNN candidate ring expansion (J6).

    x wraps around the antimeridian; y is clipped at the poles.
    Returns (cell_id, src_idx) flat arrays.
    """
    z, x, y = unpack_tile(np.asarray(tile_id, dtype=np.int64))
    n_in = x.shape[0]
    side = 2 * k + 1
    d = np.arange(-k, k + 1, dtype=np.int64)
    ddx = np.repeat(d, side)
    ddy = np.tile(d, side)

    xs = (x[:, None] + ddx[None, :]).ravel()
    ys = (y[:, None] + ddy[None, :]).ravel()
    zs = np.repeat(z, side * side)
    src = np.repeat(np.arange(n_in, dtype=np.int64), side * side)

    n = np.int64(1) << zs
    xs = np.mod(xs, n)  # wrap antimeridian
    keep = (ys >= 0) & (ys < n)  # clip poles
    cells, src = pack_tile(zs[keep], xs[keep], ys[keep]), src[keep]
    # a disk wider than the ring (2k+1 >= 2^z) folds onto itself after the
    # wrap; dedupe so each (src, cell) appears exactly once — downstream
    # candidate joins rely on at-most-once multiplicity
    if n.size and (2 * k + 1) >= int(n.min()):
        uniq = np.unique(np.stack([src, cells], axis=1), axis=0)
        src, cells = uniq[:, 0], uniq[:, 1]
    return cells, src
