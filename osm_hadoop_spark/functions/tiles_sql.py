"""JVM (Catalyst Column) twins of the numpy tile kernels in tiles.py.

Single home for the SQL-side slippy-tile math shared by the streaming tile
counts (streaming/tiles.py) and the codegen cover strategy
(operators/tile_join.py, cover_impl='jvm'). The y-tile uses the
asinh-expanded ln form — textually the same expression the DuckDB oracles
use (`__spark_entry__._duck_yt`); numpy arcsinh / java Math.log / duckdb ln
agree to <= 1 ulp, and `test_tile_join.py::test_jvm_ytile_scan_matches_numpy`
pins identical assignment on every derivable fixture latitude at every
zoom in use (the same methodology that established oracle parity).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from osm_hadoop_spark.config import TILE_X_SHIFT, TILE_Z_SHIFT
from osm_hadoop_spark.functions.tiles import MAX_MERC_LAT


def sql_xtile(lon: Column, z: int) -> Column:
    n = 1 << z
    xt = F.floor((lon + 180.0) / 360.0 * n).cast("bigint")
    return F.least(F.greatest(xt, F.lit(0)), F.lit(n - 1))


def sql_ytile(lat: Column, z: int) -> Column:
    n = 1 << z
    clamped = F.least(F.greatest(lat, F.lit(-MAX_MERC_LAT)), F.lit(MAX_MERC_LAT))
    t = F.tan(F.radians(clamped))
    yt = F.floor(
        (1.0 - F.log(t + F.sqrt(t * t + 1.0)) / F.lit(math.pi)) / 2.0 * n
    ).cast("bigint")
    return F.least(F.greatest(yt, F.lit(0)), F.lit(n - 1))


def sql_tile_bounds_xyz(z: int, xt: Column, yt: Column):
    """JVM twin of tiles.tile_bounds for xyz-oriented (xt, yt) columns:
    -> (bxmin, bymin, bxmax, bymax). Identical arithmetic order to the
    numpy kernel (tiles.py:80-83). Equivalence scope (round-5 ADVICE):
    the x bounds are exact (dyadic arithmetic); the y bounds go through
    Math.sinh vs np.sinh, which agree on every input exercised by the
    fixtures and sweeps (pinned by test_tile_join.py jvm-refine parity)
    but are not GUARANTEED identical to the last ulp on arbitrary data —
    a last-ulp difference can flip a boundary-GRAZING segment between the
    jvm and arrow refine paths. The 'pair set identical' claim in
    assign_tiles is therefore data-dependent (empirically pinned), not
    structural; both paths remain individually exact refines of their own
    bounds."""
    n = float(1 << z)
    xtd = xt.cast("double")
    ytd = yt.cast("double")
    bxmin = xtd / F.lit(n) * F.lit(360.0) - F.lit(180.0)
    bxmax = (xtd + F.lit(1.0)) / F.lit(n) * F.lit(360.0) - F.lit(180.0)
    bymax = F.degrees(
        F.atan(F.sinh(F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * ytd / F.lit(n))))
    )
    bymin = F.degrees(
        F.atan(
            F.sinh(
                F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * (ytd + F.lit(1.0)) / F.lit(n))
            )
        )
    )
    return bxmin, bymin, bxmax, bymax


def sql_segment_box_hit(
    ax: Column, ay: Column, bx: Column, by: Column,
    bxmin: Column, bymin: Column, bxmax: Column, bymax: Column,
) -> Column:
    """JVM twin of spatial.segment_box_intersects — exact segment vs
    axis-aligned box, same three-step test and the same arithmetic order
    as the numpy kernel (spatial.py:35-53), so float results agree
    bit-for-bit (both IEEE-754 double, identical op sequence)."""
    bbox = (
        (F.least(ax, bx) <= bxmax)
        & (F.greatest(ax, bx) >= bxmin)
        & (F.least(ay, by) <= bymax)
        & (F.greatest(ay, by) >= bymin)
    )
    inside1 = (ax >= bxmin) & (ax <= bxmax) & (ay >= bymin) & (ay <= bymax)
    inside2 = (bx >= bxmin) & (bx <= bxmax) & (by >= bymin) & (by <= bymax)
    dx = bx - ax
    dy = by - ay
    c1 = dx * (bymin - ay) - dy * (bxmin - ax)
    c2 = dx * (bymin - ay) - dy * (bxmax - ax)
    c3 = dx * (bymax - ay) - dy * (bxmin - ax)
    c4 = dx * (bymax - ay) - dy * (bxmax - ax)
    zero = F.lit(0.0)
    all_pos = (c1 > zero) & (c2 > zero) & (c3 > zero) & (c4 > zero)
    all_neg = (c1 < zero) & (c2 < zero) & (c3 < zero) & (c4 < zero)
    return bbox & (inside1 | inside2 | ~(all_pos | all_neg))


def sql_point_segment_dist_sq(
    px: Column, py: Column, x1: Column, y1: Column, x2: Column, y2: Column
) -> Column:
    """JVM twin of spatial.point_segment_dist_sq — same arithmetic order
    (project parameter t, clip to [0,1], squared residual), so float
    results agree bit-for-bit with the numpy kernel."""
    dx = x2 - x1
    dy = y2 - y1
    len_sq = dx * dx + dy * dy
    zero = F.lit(0.0)
    t_raw = ((px - x1) * dx + (py - y1) * dy) / F.when(len_sq == zero, F.lit(1.0)).otherwise(len_sq)
    t = F.least(F.greatest(F.when(len_sq > zero, t_raw).otherwise(zero), zero), F.lit(1.0))
    cx = x1 + t * dx
    cy = y1 + t * dy
    ex = px - cx
    ey = py - cy
    return ex * ex + ey * ey


def _sql_seg_seg_dist_sq(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> Column:
    """min over the 4 endpoint-vs-other-segment distances — the exact
    structure of spatial.segment_box_dist_sq's inner helper."""
    d1 = sql_point_segment_dist_sq(ax1, ay1, bx1, by1, bx2, by2)
    d2 = sql_point_segment_dist_sq(ax2, ay2, bx1, by1, bx2, by2)
    d3 = sql_point_segment_dist_sq(bx1, by1, ax1, ay1, ax2, ay2)
    d4 = sql_point_segment_dist_sq(bx2, by2, ax1, ay1, ax2, ay2)
    return F.least(F.least(d1, d2), F.least(d3, d4))


def sql_segment_box_dist_sq(
    x1: Column, y1: Column, x2: Column, y2: Column,
    bxmin: Column, bymin: Column, bxmax: Column, bymax: Column,
) -> Column:
    """JVM twin of spatial.segment_box_dist_sq: 0 when the segment
    intersects the box, else min distance over the 4 box edges — identical
    min-combination order to the numpy kernel so ties and last-ulp values
    agree (both IEEE-754 double, same op sequence)."""
    inter = sql_segment_box_hit(x1, y1, x2, y2, bxmin, bymin, bxmax, bymax)
    d = _sql_seg_seg_dist_sq(x1, y1, x2, y2, bxmin, bymin, bxmax, bymin)
    d = F.least(d, _sql_seg_seg_dist_sq(x1, y1, x2, y2, bxmax, bymin, bxmax, bymax))
    d = F.least(d, _sql_seg_seg_dist_sq(x1, y1, x2, y2, bxmax, bymax, bxmin, bymax))
    d = F.least(d, _sql_seg_seg_dist_sq(x1, y1, x2, y2, bxmin, bymax, bxmin, bymin))
    return F.when(inter, F.lit(0.0)).otherwise(d)


def sql_point_box_clamp_dist_sq(
    px: Column, py: Column,
    bxmin: Column, bymin: Column, bxmax: Column, bymax: Column,
) -> Column:
    """JVM twin of the vertex-clamp distance in spatial.polyline_box_dist_sq
    (np.clip(v, bmin, bmax) - v, squared sum) — needed for exact parity on
    buffered refines: the Arrow kernel takes the min of segment-edge
    distances AND vertex-clamp distances, whose last-ulp values can differ
    for points straddling an edge projection."""
    cx = F.least(F.greatest(px, bxmin), bxmax) - px
    cy = F.least(F.greatest(py, bymin), bymax) - py
    return cx * cx + cy * cy


def sql_pack_tile(z: int, xt: Column, yt: Column) -> Column:
    """JVM twin of tiles.pack_tile: (z << 58) | (x << 29) | y — disjoint
    bit ranges, so | == +."""
    return (
        F.lit(int(z) << TILE_Z_SHIFT) + F.shiftleft(xt, TILE_X_SHIFT) + yt
    ).cast("long")
