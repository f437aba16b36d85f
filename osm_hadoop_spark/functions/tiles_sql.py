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
    numpy kernel (tiles.py:80-83); the inverse mercator uses Math.sinh vs
    np.sinh — both correctly rounded on this data (pinned by
    test_tile_join.py jvm-refine parity)."""
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


def sql_polyline_box_hit(
    xs: Column, ys: Column, bxmin: Column, bymin: Column, bxmax: Column, bymax: Column
) -> Column:
    """JVM twin of spatial.polyline_box_intersects: ANY segment of the
    (xs, ys) polyline hits the box — `exists()` over 1-based segment
    indices, short-circuiting per row inside codegen. Single-vertex
    'lines' degrade to point-in-box, same as the Arrow kernel."""
    npts = F.size(xs)
    point_hit = (
        (F.element_at(xs, 1) >= bxmin)
        & (F.element_at(xs, 1) <= bxmax)
        & (F.element_at(ys, 1) >= bymin)
        & (F.element_at(ys, 1) <= bymax)
    )
    seg_hit = F.exists(
        F.sequence(F.lit(1), npts - 1),
        lambda i: sql_segment_box_hit(
            F.element_at(xs, i), F.element_at(ys, i),
            F.element_at(xs, i + 1), F.element_at(ys, i + 1),
            bxmin, bymin, bxmax, bymax,
        ),
    )
    return F.when(npts == 1, point_hit).otherwise(seg_hit)


def sql_pack_tile(z: int, xt: Column, yt: Column) -> Column:
    """JVM twin of tiles.pack_tile: (z << 58) | (x << 29) | y — disjoint
    bit ranges, so | == +."""
    return (
        F.lit(int(z) << TILE_Z_SHIFT) + F.shiftleft(xt, TILE_X_SHIFT) + yt
    ).cast("long")
