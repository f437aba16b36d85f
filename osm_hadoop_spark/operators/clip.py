"""Exact Liang-Barsky segment clipping to a tile grid.

The per-tile extract the reference's tiling story implies but never
ships as a standalone kernel: given integer-coordinate segments and a
square tile grid of size ``cell``, emit each (segment, tile) pair the
segment passes through TOGETHER WITH the exact clipped endpoints inside
that tile. This is what a tile renderer / per-tile vector extract needs
(the reference rasterizes whole ways per image instead —
SparkRasterizer's Bresenham loop, see operators/rasterize.py E5 — so a
tile-local clip is the missing dual of its tile cover J3).

Design:

  * the candidate (segment, tile) pairs come from the same envelope
    cover discipline as operators/overlay.py — two ``sequence``
    explodes, NO join: clipping is a per-row closed form, so the whole
    operator is one whole-stage-codegen map over the cover.  A segment
    covering a tile's envelope may still miss the tile; the clip itself
    is the exact reject test.
  * Liang-Barsky in exact integer rationals.  The parametric entry/exit
    times t0, t1 in [0,1] are fractions with positive denominators
    (|dx| or |dy| or 1); comparisons are cross-multiplications, so no
    floats and no epsilon anywhere.  Clipped endpoints are emitted as
    scaled integers:  A = P1 * t0_den + D * t0_num  over denominator
    t0_den  (and likewise B over t1_den) — both engines running the
    same candidate ladder produce identical numerators bit-for-bit,
    which is what the DuckDB twin checks.
  * degenerate slabs (dx = 0 or dy = 0) reject via containment, the
    textbook p = 0 case.

100 TB posture: zero shuffles inside the operator — cover volume is
bounded by the F6-style length guard upstream exactly like the overlay
join, every expression is integer arithmetic inside codegen, and the
output is already tile-partitioned (groupBy tile downstream is the only
exchange a consumer pays).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _frac_max(an, ad, bn, bd):
    """max(a, b) over fractions with POSITIVE denominators."""
    take_a = an * bd >= bn * ad
    return (
        F.when(take_a, an).otherwise(bn),
        F.when(take_a, ad).otherwise(bd),
    )


def _frac_min(an, ad, bn, bd):
    take_a = an * bd <= bn * ad
    return (
        F.when(take_a, an).otherwise(bn),
        F.when(take_a, ad).otherwise(bd),
    )


def clip_segments(segs: DataFrame, cell: int) -> DataFrame:
    """Clip integer segments to every tile of a ``cell``-sized grid.

    Input: DataFrame(way_id, seg_id, x1, y1, x2, y2) with integer
    coordinates.  Output: one row per (segment, tile) the segment
    actually intersects, with exact rational clipped endpoints:

      (way_id, seg_id, tx, ty,
       ax_num, ay_num, a_den,   -- entry point  (ax_num/a_den, ay_num/a_den)
       bx_num, by_num, b_den)   -- exit  point  (bx_num/b_den, by_num/b_den)

    Touching (t0 == t1, a corner graze) is kept; callers can filter on
    (ax_num*b_den, ay_num*b_den) != (bx_num*a_den, by_num*a_den) for
    proper crossings only.
    """
    x1, y1 = F.col("x1").cast("long"), F.col("y1").cast("long")
    x2, y2 = F.col("x2").cast("long"), F.col("y2").cast("long")

    cov = (
        segs.withColumn(
            "tx",
            F.explode(
                F.sequence(
                    F.floor(F.least("x1", "x2") / cell),
                    F.floor(F.greatest("x1", "x2") / cell),
                )
            ),
        )
        .withColumn(
            "ty",
            F.explode(
                F.sequence(
                    F.floor(F.least("y1", "y2") / cell),
                    F.floor(F.greatest("y1", "y2") / cell),
                )
            ),
        )
    )

    xl = F.col("tx") * cell
    xr = (F.col("tx") + 1) * cell
    yl = F.col("ty") * cell
    yr = (F.col("ty") + 1) * cell
    dx, dy = x2 - x1, y2 - y1
    zero, one = F.lit(0).cast("long"), F.lit(1).cast("long")

    # entering candidates (num, den), den > 0; absent slab -> (0, 1)
    exn = F.when(dx > 0, xl - x1).when(dx < 0, x1 - xr).otherwise(zero)
    exd = F.when(dx > 0, dx).when(dx < 0, -dx).otherwise(one)
    eyn = F.when(dy > 0, yl - y1).when(dy < 0, y1 - yr).otherwise(zero)
    eyd = F.when(dy > 0, dy).when(dy < 0, -dy).otherwise(one)
    # exiting candidates; absent slab -> (1, 1)
    fxn = F.when(dx > 0, xr - x1).when(dx < 0, x1 - xl).otherwise(one)
    fxd = F.when(dx > 0, dx).when(dx < 0, -dx).otherwise(one)
    fyn = F.when(dy > 0, yr - y1).when(dy < 0, y1 - yl).otherwise(one)
    fyd = F.when(dy > 0, dy).when(dy < 0, -dy).otherwise(one)

    t0n, t0d = _frac_max(zero, one, exn, exd)
    t0n, t0d = _frac_max(t0n, t0d, eyn, eyd)
    t1n, t1d = _frac_min(one, one, fxn, fxd)
    t1n, t1d = _frac_min(t1n, t1d, fyn, fyd)

    ok = (
        ((dx != 0) | ((x1 >= xl) & (x1 <= xr)))
        & ((dy != 0) | ((y1 >= yl) & (y1 <= yr)))
        & (t0n * t1d <= t1n * t0d)
    )

    return (
        cov.withColumn("_t0n", t0n).withColumn("_t0d", t0d)
        .withColumn("_t1n", t1n).withColumn("_t1d", t1d)
        .filter(ok)
        .select(
            "way_id", "seg_id", "tx", "ty",
            (x1 * F.col("_t0d") + dx * F.col("_t0n")).alias("ax_num"),
            (y1 * F.col("_t0d") + dy * F.col("_t0n")).alias("ay_num"),
            F.col("_t0d").alias("a_den"),
            (x1 * F.col("_t1d") + dx * F.col("_t1n")).alias("bx_num"),
            (y1 * F.col("_t1d") + dy * F.col("_t1n")).alias("by_num"),
            F.col("_t1d").alias("b_den"),
        )
    )
