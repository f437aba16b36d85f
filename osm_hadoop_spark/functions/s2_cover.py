"""S2 envelope cover ("polyfill"): lat/lng rect -> level-L cell set.

The S2 analog of `tiles.tiles_for_envelope_flat` (E9) — the filter stage
of a cover-join on the spherical index. Contract: the result is a
SUPERSET of every level-L cell that intersects the rect (what a
filter-and-refine join needs), with tight bounds everywhere except two
documented conservative relaxations.

Method: breadth-first subdivision from the 6 face cells, pruning with
closed-form interval arithmetic — uniform across faces, no per-face case
analysis:

  cell (f, i, j, L) -> uv box (quadratic ST, exact monotone bounds)
  -> xyz component intervals (each of x,y,z is one of +-1, +-u, +-v)
  -> lat interval  via atan2(z, hypot(|x|,|y|)) monotonicity
  -> lon interval  via atan2 corner extremes (continuous case)

The lat interval is EXACT for any uv box. The lon interval is exact for
boxes not touching the antimeridian seam or the pole; the two
relaxations (both conservative — they only ADD cells):
  - a box crossing the negative-x axis (the +-180 seam) counts as
    covering all longitudes;
  - a box containing the origin in the xy-plane (a pole) counts as
    covering all longitudes (which is geometrically true at the pole).

The rect itself is PLANAR (no antimeridian wrap), matching the engine's
pinned envelope rule (tiles.py antimeridian note; the reference's JTS
Envelope model).

All arrays, no Python-per-cell: each BFS level expands the surviving
frontier x4 and prunes vectorized, so cover cost is O(result size), the
same complexity class as the quadkey polyfill.
"""

from __future__ import annotations

import numpy as np

from osm_hadoop_spark.functions.s2 import MAX_LEVEL, _uv_from_st, cell_from_face_ij

# FaceUVtoXYZ component selectors (s2coords.h): for each face, each of
# x,y,z is one of the six "interval atoms": +1, -1, +u, -u, +v, -v.
_ATOM_ONE, _ATOM_NEG_ONE, _ATOM_U, _ATOM_NEG_U, _ATOM_V, _ATOM_NEG_V = range(6)
_FACE_XYZ = np.array(
    [
        [_ATOM_ONE, _ATOM_U, _ATOM_V],          # face 0: ( 1,  u,  v)
        [_ATOM_NEG_U, _ATOM_ONE, _ATOM_V],      # face 1: (-u,  1,  v)
        [_ATOM_NEG_U, _ATOM_NEG_V, _ATOM_ONE],  # face 2: (-u, -v,  1)
        [_ATOM_NEG_ONE, _ATOM_NEG_V, _ATOM_NEG_U],  # face 3
        [_ATOM_V, _ATOM_NEG_ONE, _ATOM_NEG_U],  # face 4
        [_ATOM_V, _ATOM_U, _ATOM_NEG_ONE],      # face 5
    ],
    dtype=np.int64,
)


def _atom_interval(atom, u0, u1, v0, v1):
    """Interval [lo, hi] of one xyz component over the uv box."""
    ones = np.ones_like(u0)
    lo = np.select(
        [atom == _ATOM_ONE, atom == _ATOM_NEG_ONE, atom == _ATOM_U,
         atom == _ATOM_NEG_U, atom == _ATOM_V],
        [ones, -ones, u0, -u1, v0],
        default=-v1,
    )
    hi = np.select(
        [atom == _ATOM_ONE, atom == _ATOM_NEG_ONE, atom == _ATOM_U,
         atom == _ATOM_NEG_U, atom == _ATOM_V],
        [ones, -ones, u1, -u0, v1],
        default=-v0,
    )
    return lo, hi


def _abs_interval(lo, hi):
    spans0 = (lo <= 0.0) & (hi >= 0.0)
    alo = np.where(spans0, 0.0, np.minimum(np.abs(lo), np.abs(hi)))
    ahi = np.maximum(np.abs(lo), np.abs(hi))
    return alo, ahi


def _cell_latlon_bounds(face, i, j, lvl):
    """Exact lat interval + conservative lon interval (RADIANS) of cells
    (face, i, j) at per-cell level `lvl` (i, j in cell units at lvl).

    Stays in radians and uses sqrt(a*a + b*b) rather than np.hypot: every
    operation is then a correctly-rounded IEEE primitive (+ * / sqrt) or
    atan2, so the DuckDB oracle can replicate the interval arithmetic
    bit-for-bit (the same cross-engine argument as functions/s2.py,
    validated there over the exhaustive fixture lattice)."""
    n = (2.0 ** lvl)
    u0 = _uv_from_st(i / n)
    u1 = _uv_from_st((i + 1) / n)
    v0 = _uv_from_st(j / n)
    v1 = _uv_from_st((j + 1) / n)

    ax = _FACE_XYZ[face, 0]
    ay = _FACE_XYZ[face, 1]
    az = _FACE_XYZ[face, 2]
    xlo, xhi = _atom_interval(ax, u0, u1, v0, v1)
    ylo, yhi = _atom_interval(ay, u0, u1, v0, v1)
    zlo, zhi = _atom_interval(az, u0, u1, v0, v1)

    # lat = atan2(z, hypot(x, y)); decreasing in hypot for z>0, increasing
    # for z<0 -> pair extreme z with the opposite hypot extreme
    axlo, axhi = _abs_interval(xlo, xhi)
    aylo, ayhi = _abs_interval(ylo, yhi)
    hyp_lo = np.sqrt(axlo * axlo + aylo * aylo)
    hyp_hi = np.sqrt(axhi * axhi + ayhi * ayhi)
    lat_lo = np.arctan2(zlo, np.where(zlo >= 0.0, hyp_hi, hyp_lo))
    lat_hi = np.arctan2(zhi, np.where(zhi >= 0.0, hyp_lo, hyp_hi))

    # lon = atan2(y, x): corner extremes when continuous; full circle when
    # the box contains the origin (pole) or crosses the negative-x axis
    # (antimeridian seam) — both conservative
    # one condition covers both relaxations: a box with any x <= 0 whose
    # y-interval spans 0 either contains the origin (pole) or crosses the
    # negative-x axis (the seam)
    spans_y0 = (ylo <= 0.0) & (yhi >= 0.0)
    full = (xlo <= 0.0) & spans_y0
    c = np.stack(
        [
            np.arctan2(ylo, xlo), np.arctan2(ylo, xhi),
            np.arctan2(yhi, xlo), np.arctan2(yhi, xhi),
        ]
    )
    lon_lo = np.where(full, -np.pi, c.min(axis=0))
    lon_hi = np.where(full, np.pi, c.max(axis=0))
    return lat_lo, lat_hi, lon_lo, lon_hi


def cells_for_envelope_s2(
    lon_min: np.ndarray,
    lat_min: np.ndarray,
    lon_max: np.ndarray,
    lat_max: np.ndarray,
    level: int,
    adaptive: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Cover of many planar lat/lng rects at once.

    Returns (cell_id, env_idx) flat arrays — every level-`level` cell
    whose (conservative) bound intersects each rect, tagged with the
    source envelope index. Same output shape as
    tiles.tiles_for_envelope_flat (E9's S2 twin).

    adaptive=True emits the MIXED-LEVEL cover (S2RegionCoverer shape): a
    cell whose conservative bound lies fully inside the rect is emitted
    at its coarse level and never subdivided — bound ⊇ truth, so
    bound-inside implies truly-inside; only boundary cells subdivide down
    to `level`. The compact result is exactly what
    operators/s2_join.s2_containment_join consumes (mixed levels)."""
    # rect bounds to radians ONCE (np.radians == x * (pi/180), identical
    # to DuckDB radians() — the established cross-engine primitive)
    lon_min = np.radians(np.asarray(lon_min, dtype=np.float64))
    lat_min = np.radians(np.asarray(lat_min, dtype=np.float64))
    lon_max = np.radians(np.asarray(lon_max, dtype=np.float64))
    lat_max = np.radians(np.asarray(lat_max, dtype=np.float64))
    n_env = lon_min.shape[0]

    # frontier: (env, face, i, j) at the current BFS level
    env = np.repeat(np.arange(n_env, dtype=np.int64), 6)
    face = np.tile(np.arange(6, dtype=np.int64), n_env)
    i = np.zeros(env.shape[0], dtype=np.int64)
    j = np.zeros(env.shape[0], dtype=np.int64)

    out_cells: list[np.ndarray] = []
    out_env: list[np.ndarray] = []
    for lvl in range(0, level + 1):
        lat_lo, lat_hi, lon_lo, lon_hi = _cell_latlon_bounds(face, i, j, lvl)
        keep = (
            (lat_hi >= lat_min[env]) & (lat_lo <= lat_max[env])
            & (lon_hi >= lon_min[env]) & (lon_lo <= lon_max[env])
        )
        if adaptive and lvl < level:
            inside = keep & (
                (lat_lo >= lat_min[env]) & (lat_hi <= lat_max[env])
                & (lon_lo >= lon_min[env]) & (lon_hi <= lon_max[env])
            )
            if inside.any():
                shift = MAX_LEVEL - lvl
                out_cells.append(
                    cell_from_face_ij(
                        face[inside], i[inside] << shift, j[inside] << shift, lvl
                    )
                )
                out_env.append(env[inside])
            keep = keep & ~inside
        env, face, i, j = env[keep], face[keep], i[keep], j[keep]
        if lvl == level:
            break
        # expand each survivor into its 4 children (i,j doubling)
        env = np.repeat(env, 4)
        face = np.repeat(face, 4)
        di = np.tile(np.array([0, 0, 1, 1], dtype=np.int64), keep.sum())
        dj = np.tile(np.array([0, 1, 0, 1], dtype=np.int64), keep.sum())
        i = np.repeat(i << 1, 4) + di
        j = np.repeat(j << 1, 4) + dj

    shift = MAX_LEVEL - level
    out_cells.append(cell_from_face_ij(face, i << shift, j << shift, level))
    out_env.append(env)
    return np.concatenate(out_cells), np.concatenate(out_env)
