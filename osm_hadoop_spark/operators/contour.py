"""Marching squares: binary raster -> vector contour segments.

The raster->vector polygonization stage the reference implies but never
ships (its raster side stops at GeoTIFF export, `SparkRasterizer`'s
driver burn — see operators/rasterize.py): given the SPARSE set of
"inside" cells (value above threshold), emit the contour segments that
separate inside from outside, i.e. classic binary marching squares with
the midpoint rule.

Shape of the plan (the morphology scatter discipline,
operators/morphology.py):

  * each inside cell (cx, cy) is a corner of exactly FOUR 2x2 blocks;
    it scatters its corner bit to each: bit 1 as the block's
    bottom-left, 2 as bottom-right, 4 as top-right, 8 as top-left.
    Outside/missing cells contribute nothing — the mask of a block is
    simply the SUM of the bits that arrive, so the whole classification
    is one partial-aggregating hash agg over a 4x fan-out of the
    inside-cell relation.  No dense grid is ever materialized and no
    join exists anywhere.
  * the per-case segment table is an array-of-arrays LITERAL evaluated
    inside codegen; `explode` emits the 0..2 segments per block.
    Endpoints are edge midpoints in DOUBLED integer coordinates
    (x2 so midpoints stay exact int64): bottom (1,0), right (2,1),
    top (1,2), left (0,1) relative to the doubled block origin.
  * saddle cases 5 / 10 are pinned to the "separate diagonals" rule
    (case 5 = {left-bottom, right-top}, case 10 = {bottom-right,
    top-left}) — no asymptotic decider, deterministic across engines.

Correctness anchor (tests/test_contour.py): every endpoint must be the
midpoint of a CROSSING edge (adjacent cells straddling the threshold),
and every crossing edge is covered by exactly two segment endpoints —
so the emitted segments form closed loops around every inside region, a
topology property checkable from the cell set alone, independent of the
case table.

100 TB posture: fan-out is a constant 4x on the inside-cell relation
(already the sparse minority at any real threshold), the single
exchange is the block aggregate, and the case decode + segment emit run
in the same codegen stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (corner dx, corner dy relative to block, bit) — cell (cx,cy) lands in
# block (cx-dx, cy-dy) carrying `bit`.
_CORNERS = [(0, 0, 1), (1, 0, 2), (1, 1, 4), (0, 1, 8)]

# edge midpoints in doubled block-relative coordinates
_BOT, _RGT, _TOP, _LFT = (1, 0), (2, 1), (1, 2), (0, 1)

# case -> list of segments (each a pair of edge midpoints)
_CASES: dict[int, list[tuple[tuple[int, int], tuple[int, int]]]] = {
    0: [],
    1: [(_LFT, _BOT)],
    2: [(_BOT, _RGT)],
    3: [(_LFT, _RGT)],
    4: [(_RGT, _TOP)],
    5: [(_LFT, _BOT), (_RGT, _TOP)],   # saddle, pinned
    6: [(_BOT, _TOP)],
    7: [(_LFT, _TOP)],
    8: [(_TOP, _LFT)],
    9: [(_BOT, _TOP)],
    10: [(_BOT, _RGT), (_TOP, _LFT)],  # saddle, pinned
    11: [(_RGT, _TOP)],
    12: [(_RGT, _LFT)],
    13: [(_BOT, _RGT)],
    14: [(_LFT, _BOT)],
    15: [],
}


def _case_lut():
    """array<array<struct<x1,y1,x2,y2>>> literal, 1-indexed by mask+1."""
    return F.array(
        *[
            F.array(
                *[
                    F.struct(
                        F.lit(a[0]).alias("x1"), F.lit(a[1]).alias("y1"),
                        F.lit(b[0]).alias("x2"), F.lit(b[1]).alias("y2"),
                    )
                    for a, b in _CASES[m]
                ]
            )
            if _CASES[m]
            else F.array().cast("array<struct<x1:int,y1:int,x2:int,y2:int>>")
            for m in range(16)
        ]
    )


def marching_squares(cells: DataFrame) -> DataFrame:
    """Contour segments around the inside-cell set.

    Input: DataFrame(cx, cy) — DISTINCT integer cells above threshold.
    Output: DataFrame(bx, by, mask, seg, x1d, y1d, x2d, y2d) — one row
    per contour segment; (x?d, y?d) are doubled global coordinates
    (exact int64 edge midpoints).
    """
    corners = F.array(
        *[
            F.struct(
                (F.col("cx") - dx).cast("long").alias("bx"),
                (F.col("cy") - dy).cast("long").alias("by"),
                F.lit(bit).alias("bit"),
            )
            for dx, dy, bit in _CORNERS
        ]
    )
    blocks = (
        cells.select(F.explode(corners).alias("c"))
        .groupBy(F.col("c.bx").alias("bx"), F.col("c.by").alias("by"))
        .agg(F.sum("c.bit").cast("int").alias("mask"))
    )
    seg = F.posexplode(F.element_at(_case_lut(), F.col("mask") + 1))
    return blocks.select("bx", "by", "mask", seg).select(
        "bx", "by", "mask",
        F.col("pos").alias("seg"),
        (F.col("bx") * 2 + F.col("col.x1")).alias("x1d"),
        (F.col("by") * 2 + F.col("col.y1")).alias("y1d"),
        (F.col("bx") * 2 + F.col("col.x2")).alias("x2d"),
        (F.col("by") * 2 + F.col("col.y2")).alias("y2d"),
    )
