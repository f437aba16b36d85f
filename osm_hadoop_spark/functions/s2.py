"""S2 cell index, from scratch, vectorized (no s2geometry/s2sphere import).

The north rule mandates "H3/S2 cell-indexed tile assignment"; neither
library ships in this container, so this module implements the public S2
cell-id scheme natively in NumPy (the quadkey index in functions/tiles.py
remains the kNN ring / raster workhorse — this is the spherical
cell-assignment index the rule names):

  lon/lat -> unit vector -> cube face (6 faces) -> (u, v) face coords
  -> quadratic S/T transform (area-uniformizing, the s2geometry
  S2_QUADRATIC_PROJECTION) -> 30-level (i, j) grid -> Hilbert curve
  position -> 64-bit cell id:

      bits 63..61  face (0..5)
      bits 60..(61-2L) Hilbert position at level L (2 bits/level)
      next bit     sentinel 1 (marks the level; trailing zeros below)

Properties this encoding buys at 100 TB (and tests pin):
  - a cell's children occupy a contiguous id range -> hierarchical
    containment is a RANGE predicate (cell_range_min/max), so a
    cover-join is a sort-merge range join, no polygon math on the big side;
  - Hilbert continuity -> adjacent ids are spatially near, so
    range-partitioning by cell id is a spatial partitioner (low shuffle
    fan-out for neighborhood queries);
  - no polar singularity (unlike web-mercator tiles): faces 2/5 cover the
    poles with the same cell-size bounds as the equator.

Two independent implementations of the Hilbert traversal live here: the
production 4-bit lookup-table walk (`cell_from_face_ij`, 8 chunks) and a
per-level scalar reference (`_cell_from_face_ij_scalar`, 30 steps) used by
tests; the driver oracle re-derives the same ids a third way (recursive
SQL CTE in __spark_entry__.py). All constants are the published
s2geometry tables (s2coords.h kPosToIJ/kIJtoPos/kPosToOrientation).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_SWAP = 1
_INVERT = 2
_LOOKUP_BITS = 4

# s2coords.h: traversal order of the 4 children within a cell, per parent
# orientation. ij is encoded as i*2 + j.
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.int64
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)

# 4-level (256-cell) expansion of the base pattern: index (ij<<2)|orient ->
# (pos<<2)|orient and its inverse. Built once, iteratively.
_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup() -> None:
    # depth-first expansion of InitLookupCell (s2cell_id.cc) without
    # recursion: stack of (level, i, j, orig_orientation, pos, orientation)
    for orig in (0, _SWAP, _INVERT, _SWAP | _INVERT):
        stack = [(0, 0, 0, orig, 0, orig)]
        while stack:
            level, i, j, orig_o, pos, orient = stack.pop()
            if level == _LOOKUP_BITS:
                ij = (i << _LOOKUP_BITS) + j
                _LOOKUP_POS[(ij << 2) + orig_o] = (pos << 2) + orient
                _LOOKUP_IJ[(pos << 2) + orig_o] = (ij << 2) + orient
                continue
            r = _POS_TO_IJ[orient]
            for idx in range(4):
                stack.append(
                    (
                        level + 1,
                        (i << 1) + (int(r[idx]) >> 1),
                        (j << 1) + (int(r[idx]) & 1),
                        orig_o,
                        (pos << 2) + idx,
                        orient ^ int(_POS_TO_ORIENT[idx]),
                    )
                )


_init_lookup()


# ---------------------------------------------------------------------------
# sphere -> face/(u,v) -> (s,t) -> (i,j)
# ---------------------------------------------------------------------------


def _xyz_from_lonlat(lon: np.ndarray, lat: np.ndarray):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lon, dtype=np.float64))
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def _face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Cube-face selection + gnomonic (u, v), replicating
    S2::XYZtoFaceUV's LargestAbsComponent tie-breaks exactly (the oracle
    SQL re-states the same comparison tree)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp >= 0, axis, axis + 3)
    # per-face (u, v) = gnomonic ratios (s2coords.h ValidFaceXYZtoUV)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),  # face 0 (+x)
            (lambda: -x / y, lambda: z / y),  # face 1 (+y)
            (lambda: -x / z, lambda: -y / z),  # face 2 (+z)
            (lambda: z / x, lambda: y / x),  # face 3 (-x)
            (lambda: z / y, lambda: -x / y),  # face 4 (-y)
            (lambda: -y / z, lambda: -x / z),  # face 5 (-z)
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face.astype(np.int64), u, v


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    """S2_QUADRATIC_PROJECTION UVtoST: area-uniformizing, and exactly
    invertible in SQL (sqrt is correctly rounded in IEEE, so the oracle's
    sqrt matches bit-for-bit)."""
    with np.errstate(invalid="ignore"):  # the unselected where-branch
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _uv_from_st(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _ij_from_st(s: np.ndarray) -> np.ndarray:
    n = np.int64(1) << MAX_LEVEL
    return np.clip(np.floor(s * n).astype(np.int64), 0, n - 1)


# ---------------------------------------------------------------------------
# (face, i, j) <-> cell id (Hilbert walk)
# ---------------------------------------------------------------------------


def cell_from_face_ij(
    face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int = MAX_LEVEL
) -> np.ndarray:
    """Vectorized S2CellId::FromFaceIJ: 8 chunks of 4 (i, j) bit pairs
    through the lookup table. Returns the SIGNED two's-complement view of
    the uint64 id (faces 4-5 map to negative int64 — the standard way S2
    ids are stored in BIGINT columns)."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    n = face.astype(np.uint64) << np.uint64(60)
    bits = face & _SWAP
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits = bits + (((i >> (k * 4)) & mask) << 6) + (((j >> (k * 4)) & mask) << 2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 8)
        bits &= _SWAP | _INVERT
    leaf = n * np.uint64(2) + np.uint64(1)
    if level < MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
        leaf = (leaf & ~((lsb << np.uint64(1)) - np.uint64(1))) | lsb
    return leaf.view(np.int64)


def _cell_from_face_ij_scalar(face: int, i: int, j: int, level: int = MAX_LEVEL) -> int:
    """Per-level reference implementation (tests only): walks one (i, j)
    bit pair per step using the base 4x4 tables — an independent path that
    must agree with the 4-bit lookup walk bit-for-bit."""
    orient = face & _SWAP
    pos = 0
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = int(_IJ_TO_POS[orient][ij])
        pos = (pos << 2) | p
        orient ^= int(_POS_TO_ORIENT[p])
    uid = (face << 61) | (pos << 1) | 1
    if level < MAX_LEVEL:
        lsb = 1 << (2 * (MAX_LEVEL - level))
        uid = (uid & ~(2 * lsb - 1)) | lsb
    return uid - (1 << 64) if uid >= (1 << 63) else uid


def cell_to_face_ij(cell_id: np.ndarray):
    """Inverse Hilbert walk (S2CellId::ToFaceIJOrientation): id -> (face,
    i, j) of the id's sentinel leaf (for level-L cells, a leaf inside the
    cell). Vectorized via the inverse lookup table."""
    u = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    face = (u >> np.uint64(61)).astype(np.int64)
    bits = face & _SWAP
    i = np.zeros(u.shape, dtype=np.int64)
    j = np.zeros(u.shape, dtype=np.int64)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        bits = bits + (
            (
                ((u >> np.uint64(k * 2 * _LOOKUP_BITS + 1)).astype(np.int64))
                & ((1 << (2 * nbits)) - 1)
            )
            << 2
        )
        bits = _LOOKUP_IJ[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return face, i, j


# ---------------------------------------------------------------------------
# public surface
# ---------------------------------------------------------------------------


def cell_for_lonlat(lon: np.ndarray, lat: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """(lon, lat) degrees -> S2 cell id at `level` (signed int64)."""
    x, y, z = _xyz_from_lonlat(lon, lat)
    face, uu, vv = _face_uv(x, y, z)
    i = _ij_from_st(_st_from_uv(uu))
    j = _ij_from_st(_st_from_uv(vv))
    return cell_from_face_ij(face, i, j, level)


def cell_level(cell_id: np.ndarray) -> np.ndarray:
    """Level from the sentinel bit (position of the lowest set bit)."""
    u = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    # lsb is a power of two <= 2^60: float64 log2 is exact there
    p = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - p // 2


def cell_parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at `level` (caller guarantees level <= cell_level(id))."""
    u = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((u & ~((lsb << np.uint64(1)) - np.uint64(1))) | lsb).view(np.int64)


def cell_children(cell_id: int) -> np.ndarray:
    """The 4 children one level down, in Hilbert order (contiguous ids)."""
    u = np.asarray([cell_id], dtype=np.int64).view(np.uint64)[0]
    lsb = u & (~u + np.uint64(1))
    child_lsb = lsb >> np.uint64(2)
    start = u - lsb + child_lsb
    step = child_lsb << np.uint64(1)
    kids = start + np.arange(4, dtype=np.uint64) * step
    return kids.view(np.int64)


def cell_range_min(cell_id: np.ndarray) -> np.ndarray:
    """Smallest leaf id contained in the cell — with cell_range_max this
    makes descendant containment a closed-interval predicate on int64
    (valid in SIGNED order too: all descendants share the face bits, so
    the two's-complement sign never flips within a range)."""
    u = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    return (u - lsb + np.uint64(1)).view(np.int64)


def cell_range_max(cell_id: np.ndarray) -> np.ndarray:
    """Largest leaf id contained in the cell."""
    u = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    return (u + lsb - np.uint64(1)).view(np.int64)


def cell_to_lonlat(cell_id: np.ndarray):
    """Representative point (center of the sentinel leaf) in degrees."""
    face, i, j = cell_to_face_ij(cell_id)
    n = float(1 << MAX_LEVEL)
    s = (i.astype(np.float64) + 0.5) / n
    t = (j.astype(np.float64) + 0.5) / n
    u = _uv_from_st(s)
    v = _uv_from_st(t)
    one = np.ones_like(u)
    # face -> xyz (s2coords.h FaceUVtoXYZ)
    xyz_by_face = [
        (one, u, v),
        (-u, one, v),
        (-u, -v, one),
        (-one, -v, -u),
        (v, -one, -u),
        (v, u, -one),
    ]
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (xe, ye, ze) in enumerate(xyz_by_face):
        m = face == f
        x[m], y[m], z[m] = xe[m], ye[m], ze[m]
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat
