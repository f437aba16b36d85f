"""Hexagonal binning: nearest-center assignment on an offset lattice.

The north rule asks for H3/S2-style cell indexing; the S2 family is
implemented from scratch (functions/s2.py), and this module adds the
HEXAGONAL side the same way — no h3 library in the container, so the
hex grid is defined from first principles: centers on an offset integer
lattice (odd rows shifted half a column), cells = the Voronoi regions
of those centers, which are hexagons whenever sy >= sx / sqrt(3).
Everything stays in exact int64 arithmetic — no trig, no floats — so a
DuckDB twin reproduces every assignment bit-for-bit.

Center (c, r) sits at (c * sx + (r & 1) * sx/2,  r * sy). A point's
nearest center is provably among 4 candidates — rows {r0, r0+1} with
r0 = floor(py / sy), and in each row cols {c0, c0+1} with c0 =
floor((px - off_r) / sx):

  proof sketch: within a row the nearest column is one of the two
  flooring neighbors (1-D); across rows, any center in row r0 - 1 (or
  r0 + 2) is at least sy away vertically, while the best of rows
  {r0, r0+1} is within sqrt((sx/2)^2 + (sy/2)^2) — so the far row can
  only win if sy^2 < (sx/2)^2 + (sy/2)^2, i.e. sy < sx / sqrt(3),
  exactly the regime excluded by the hexagonal-lattice condition.

Ties (equidistant centers — points on cell edges) break by the
lexicographic (d2, r, c) struct minimum, pinned in tests and mirrored
in the oracle's ORDER BY. The assignment is ONE whole-stage-codegen
projection: a 4-element inline struct array + array_min — no explode,
no join, no shuffle, no Python. The (r, c) pair is the hex cell id;
density is a plain hash agg on it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_SX, HEX_SY = 16, 14  # sy >= sx/sqrt(3) = 9.24 — hexagonal regime


def hex_cell_cols(
    px: Column, py: Column, sx: int = HEX_SX, sy: int = HEX_SY
) -> dict[str, Column]:
    """Nearest hex center of integer point (px, py) -> {hr, hc, d2}."""
    if sx % 2 or sx <= 0 or sy <= 0:
        raise ValueError("sx must be positive even, sy positive")
    if 4 * sy * sy < sx * sx + sy * sy:  # sy < sx/sqrt(3)
        raise ValueError("lattice not hexagonal: need sy >= sx/sqrt(3)")
    px = px.cast("bigint")
    py = py.cast("bigint")
    r0 = F.floor(py.cast("double") / sy).cast("bigint")

    def cand(dr: int, dc: int) -> Column:
        r = r0 + dr
        off = (r % 2 != 0).cast("bigint") * (sx // 2)
        c = F.floor((px - off).cast("double") / sx).cast("bigint") + dc
        cx = c * sx + off
        cy = r * sy
        d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
        return F.struct(d2.alias("d2"), r.alias("hr"), c.alias("hc"))

    best = F.array_min(
        F.array(cand(0, 0), cand(0, 1), cand(1, 0), cand(1, 1))
    )
    return {"hr": best["hr"], "hc": best["hc"], "d2": best["d2"]}


def hex_neighbors(hr: Column, hc: Column) -> Column:
    """Ring-1 neighborhood of offset-lattice hex cell (hr, hc): the cell
    itself + its 6 adjacent hexes, as an array<struct<hr, hc>>.

    Offset-coordinate adjacency depends on row parity: same-row
    neighbors are c +- 1; the two cells in each adjacent row are
    (c - 1, c) for EVEN rows and (c, c + 1) for ODD rows (odd rows sit
    half a column to the right). Pure inline array construction — the
    hex analog of the quadkey index's grid_disk (functions/tiles.py).
    """
    hr = hr.cast("bigint")
    hc = hc.cast("bigint")
    odd = (hr % 2 != 0).cast("bigint")  # works for negative rows too

    def cell(r: Column, c: Column) -> Column:
        return F.struct(r.alias("hr"), c.alias("hc"))

    return F.array(
        cell(hr, hc),
        cell(hr, hc - 1),
        cell(hr, hc + 1),
        cell(hr - 1, hc - 1 + odd),
        cell(hr - 1, hc + odd),
        cell(hr + 1, hc - 1 + odd),
        cell(hr + 1, hc + odd),
    )


def hex_parent_cols(
    hr: Column, hc: Column, factor: int = 3,
    sx: int = HEX_SX, sy: int = HEX_SY,
) -> dict[str, Column]:
    """Parent hex cell on a `factor`-times-coarser lattice — the engine's
    H3-style multiresolution rollup (no aperture-7 rotation: the parent
    is simply the nearest center of the scaled lattice, the same
    Voronoi definition as the base grid, so parenting is ONE more
    hex_cell_cols projection over the child's center coordinates).

    A hexagonal lattice scaled uniformly stays hexagonal
    (sy*f >= sx*f / sqrt(3) iff sy >= sx / sqrt(3)), so the 4-candidate
    proof in hex_cell_cols carries over unchanged. Children straddling a
    parent boundary go to whichever coarse center is nearest — parents
    are exact Voronoi cells of the coarse lattice, but (like H3's
    aperture-7) a child's AREA may overlap two parents; the rollup
    assigns each child atomically by its center (the standard
    compromise, documented).
    """
    hr = hr.cast("bigint")
    hc = hc.cast("bigint")
    cx = hc * sx + (hr % 2 != 0).cast("bigint") * (sx // 2)
    cy = hr * sy
    return hex_cell_cols(cx, cy, sx * factor, sy * factor)
