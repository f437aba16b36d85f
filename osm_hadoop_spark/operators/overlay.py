"""Planar overlay: find every pair of crossing segments (way crossings).

The map-QA primitive the reference's family implies but never ships:
"which ways cross each other?" (unnoded junctions, digitizing errors,
bridge/tunnel candidates). This is a segment-segment intersection JOIN —
the classic planar-overlay kernel — expressed with the engine's
computable-grid discipline:

  1. each segment covers the grid cells of its envelope (explode of two
     sequences — bounded by the F6-style long-geometry guard upstream,
     exactly where the reference bounds its tile covers);
  2. ONE equi-join on the packed cell id pairs segments sharing a cell;
  3. pairs are emitted EXACTLY ONCE without any distinct/shuffle: two
     overlapping envelopes share a rectangle of cells whose min corner
     (max(ax0,bx0), max(ay0,by0)) is computable from both sides — the
     pair is kept only in that cell (the interval_join.py
     first-shared-bucket trick in 2-D);
  4. the refine is the exact integer orientation test (CLRS
     segment-intersection: cross-product signs + collinear on-segment
     checks) — no floats, no epsilon, so a DuckDB O(n^2) twin matches
     bit-for-bit.

100 TB posture: cell keys are arithmetic; the only shuffle is the cell
join; skewed cells (a junction-dense metro cell) split under AQE; the
refine runs inside the join's codegen stage. Cover volume is quadratic
in segment envelope size, which is why callers apply the length guard
first (same rationale as F6, operators/rasterize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACK = 1 << 32


def _cross_sign(ox, oy, ax, ay, bx, by):
    """sign of cross(a - o, b - o) — orientation of the triple."""
    c = (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)
    return F.signum(c).cast("int")


def _on_seg(px, py, qx, qy, rx, ry):
    """collinear r on segment pq (inclusive box test)."""
    return (
        (rx >= F.least(px, qx)) & (rx <= F.greatest(px, qx))
        & (ry >= F.least(py, qy)) & (ry <= F.greatest(py, qy))
    )


def segments_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Exact integer segment-intersection predicate (touching counts)."""
    d1 = _cross_sign(bx1, by1, bx2, by2, ax1, ay1)
    d2 = _cross_sign(bx1, by1, bx2, by2, ax2, ay2)
    d3 = _cross_sign(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = _cross_sign(ax1, ay1, ax2, ay2, bx2, by2)
    proper = (d1 != d2) & (d3 != d4) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    touch = (
        ((d1 == 0) & _on_seg(bx1, by1, bx2, by2, ax1, ay1))
        | ((d2 == 0) & _on_seg(bx1, by1, bx2, by2, ax2, ay2))
        | ((d3 == 0) & _on_seg(ax1, ay1, ax2, ay2, bx1, by1))
        | ((d4 == 0) & _on_seg(ax1, ay1, ax2, ay2, bx2, by2))
    )
    return proper | touch


def _covered(segs: DataFrame, cell: int, probe: bool) -> DataFrame:
    """Segment envelope cover as slim rows; carries the envelope's min
    cell (cx0, cy0) for the first-shared-cell dedupe."""
    cx0 = F.floor(F.least("x1", "x2") / cell)
    cx1 = F.floor(F.greatest("x1", "x2") / cell)
    cy0 = F.floor(F.least("y1", "y2") / cell)
    cy1 = F.floor(F.greatest("y1", "y2") / cell)
    d = segs.select(
        "way_id", "seg_id", "x1", "y1", "x2", "y2",
        cx0.alias("cx0"), cy0.alias("cy0"),
        cx1.alias("cx1"), cy1.alias("cy1"),
    )
    if not probe:
        return d
    return (
        d.withColumn("_cx", F.explode(F.sequence("cx0", "cx1")))
        .withColumn("_cy", F.explode(F.sequence("cy0", "cy1")))
        .select(
            "way_id", "seg_id", "x1", "y1", "x2", "y2", "cx0", "cy0",
            (F.col("_cx") * _PACK + F.col("_cy")).alias("cell"),
        )
    )


def segment_crossings(segs: DataFrame, cell: int = 8) -> DataFrame:
    """All intersecting segment pairs from DIFFERENT ways.

    Input: DataFrame(way_id, seg_id, x1, y1, x2, y2) — integer endpoint
    coords; callers should length-guard first (see module doc). Returns
    DataFrame(way_a, seg_a, way_b, seg_b) with way_a < way_b, each pair
    exactly once.
    """
    a = _covered(segs, cell, probe=True)
    b = (
        _covered(segs, cell, probe=True)
        .select(
            F.col("way_id").alias("wb"), F.col("seg_id").alias("sb"),
            F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
            F.col("x2").alias("bx2"), F.col("y2").alias("by2"),
            F.col("cx0").alias("bcx0"), F.col("cy0").alias("bcy0"),
            "cell",
        )
    )
    first_shared = (
        F.greatest(F.col("cx0"), F.col("bcx0")) * _PACK
        + F.greatest(F.col("cy0"), F.col("bcy0"))
    )
    return (
        a.join(b, "cell")
        .filter(F.col("way_id") < F.col("wb"))
        .filter(F.col("cell") == first_shared)
        .filter(
            segments_intersect(
                F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
                F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"),
            )
        )
        .select(
            F.col("way_id").alias("way_a"), F.col("seg_id").alias("seg_a"),
            F.col("wb").alias("way_b"), F.col("sb").alias("seg_b"),
        )
    )


def self_intersections(segs: DataFrame, cell: int = 8) -> DataFrame:
    """Non-adjacent intersecting segment pairs WITHIN each way — the
    ST_IsSimple violation stream for open polylines.

    Input: DataFrame(way_id, seg_id, x1, y1, x2, y2) where ``seg_id`` is
    the CONSECUTIVE ordinal of the segment along its way (segment i
    connects vertex i to vertex i+1), so ``seg_b == seg_a + 1`` pairs
    share a vertex by construction and are excluded; any other
    intersection — a proper crossing OR a revisited vertex — makes the
    polyline non-simple.  Same plan as :func:`segment_crossings` with
    ``way_id`` added to the join key: the equi-join is (way_id, cell),
    so candidate volume is per-way local and metro-cell skew spreads
    across ways.  Pairs are deduped by the identical first-shared-cell
    corner rule; the refine is the same exact integer CLRS predicate.

    Returns DataFrame(way_id, seg_a, seg_b) with seg_a + 1 < seg_b.
    """
    a = _covered(segs, cell, probe=True)
    b = (
        _covered(segs, cell, probe=True)
        .select(
            F.col("way_id").alias("wb"), F.col("seg_id").alias("sb"),
            F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
            F.col("x2").alias("bx2"), F.col("y2").alias("by2"),
            F.col("cx0").alias("bcx0"), F.col("cy0").alias("bcy0"),
            "cell",
        )
    )
    first_shared = (
        F.greatest(F.col("cx0"), F.col("bcx0")) * _PACK
        + F.greatest(F.col("cy0"), F.col("bcy0"))
    )
    return (
        a.join(b, (F.col("way_id") == F.col("wb")) & (a["cell"] == b["cell"]))
        .filter(F.col("seg_id") + 1 < F.col("sb"))
        .filter(a["cell"] == first_shared)
        .filter(
            segments_intersect(
                F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
                F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"),
            )
        )
        .select(
            "way_id",
            F.col("seg_id").alias("seg_a"), F.col("sb").alias("seg_b"),
        )
    )
