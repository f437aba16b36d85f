"""Exact spatial predicates, pairwise-vectorized (the J3 "refine" stage).

The reference refines candidate tiles with ESRI OperatorIntersects
(buffer/RoadlessRoadCount.scala:147-149: tile envelope polygon x polyline).
A polyline intersects an axis-aligned box iff any segment does; segment-vs-box
is decided exactly with the separating-axis test below (no epsilon). PIP uses
even-odd ray casting (half-open edge rule), matching the usual OGC boundary
behavior closely enough that fixtures avoid exactly-on-edge points.

All functions take flat NumPy arrays of CANDIDATE PAIRS (already exploded by
the cell-cover filter stage) and return boolean / float arrays — one Arrow
batch in, one out, no per-row Python.
"""

from __future__ import annotations

import numpy as np


def segment_box_intersects(
    x1, y1, x2, y2, bxmin, bymin, bxmax, bymax
) -> np.ndarray:
    """Exact segment vs axis-aligned-box intersection, pairwise.

    1) reject if the segment's bbox misses the box;
    2) accept if an endpoint is inside;
    3) otherwise the segment intersects iff the box corners do not all lie
       strictly on one side of the segment's supporting line (separating axis).
    """
    x1 = np.asarray(x1, dtype=np.float64); y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64); y2 = np.asarray(y2, dtype=np.float64)
    bxmin = np.asarray(bxmin, dtype=np.float64); bymin = np.asarray(bymin, dtype=np.float64)
    bxmax = np.asarray(bxmax, dtype=np.float64); bymax = np.asarray(bymax, dtype=np.float64)

    sxmin = np.minimum(x1, x2); sxmax = np.maximum(x1, x2)
    symin = np.minimum(y1, y2); symax = np.maximum(y1, y2)
    bbox_overlap = (sxmin <= bxmax) & (sxmax >= bxmin) & (symin <= bymax) & (symax >= bymin)

    inside1 = (x1 >= bxmin) & (x1 <= bxmax) & (y1 >= bymin) & (y1 <= bymax)
    inside2 = (x2 >= bxmin) & (x2 <= bxmax) & (y2 >= bymin) & (y2 <= bymax)

    dx = x2 - x1
    dy = y2 - y1
    # cross(d, corner - p1) for the 4 corners
    c1 = dx * (bymin - y1) - dy * (bxmin - x1)
    c2 = dx * (bymin - y1) - dy * (bxmax - x1)
    c3 = dx * (bymax - y1) - dy * (bxmin - x1)
    c4 = dx * (bymax - y1) - dy * (bxmax - x1)
    all_pos = (c1 > 0) & (c2 > 0) & (c3 > 0) & (c4 > 0)
    all_neg = (c1 < 0) & (c2 < 0) & (c3 < 0) & (c4 < 0)
    straddles = ~(all_pos | all_neg)

    return bbox_overlap & (inside1 | inside2 | straddles)


def polyline_box_intersects(
    xs: np.ndarray, ys: np.ndarray, counts: np.ndarray,
    bxmin: np.ndarray, bymin: np.ndarray, bxmax: np.ndarray, bymax: np.ndarray,
) -> np.ndarray:
    """Per-(polyline, box) pair: does ANY segment intersect the box?

    (xs, ys, counts) is the flat-coords layout: counts[i] vertices per pair i
    (geometry coords repeated per candidate pair upstream). Boxes are aligned
    with pairs. This is the exact refine of J3 (RoadlessRoadCount.scala:144-157).
    """
    n = counts.shape[0]
    out = np.zeros(n, dtype=bool)
    if xs.shape[0] == 0:
        return out
    own = np.repeat(np.arange(n), counts)
    valid = own[1:] == own[:-1]
    seg_own = own[:-1][valid]
    hit = segment_box_intersects(
        xs[:-1][valid], ys[:-1][valid], xs[1:][valid], ys[1:][valid],
        bxmin[seg_own], bymin[seg_own], bxmax[seg_own], bymax[seg_own],
    )
    np.logical_or.at(out, seg_own, hit)
    # single-vertex "lines": point-in-box
    single = counts == 1
    if single.any():
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        s = starts[single]
        out[single] = (
            (xs[s] >= bxmin[single]) & (xs[s] <= bxmax[single])
            & (ys[s] >= bymin[single]) & (ys[s] <= bymax[single])
        )
    return out


def point_in_polygon_pairs(
    px: np.ndarray, py: np.ndarray,
    poly_xs: np.ndarray, poly_ys: np.ndarray, poly_counts: np.ndarray,
) -> np.ndarray:
    """Even-odd ray-casting PIP over candidate pairs.

    Pair i = point (px[i], py[i]) vs the polygon ring whose vertices occupy
    the i-th block of (poly_xs, poly_ys). The ring need not repeat its first
    vertex; closure is implicit. Half-open rule: an edge is crossed iff
    (y1 > py) != (y2 > py) and the x-intersection is strictly right of px.
    """
    n = poly_counts.shape[0]
    out_cross = np.zeros(n, dtype=np.int64)
    if poly_xs.shape[0] == 0:
        return out_cross.astype(bool)
    own = np.repeat(np.arange(n), poly_counts)
    starts = np.concatenate(([0], np.cumsum(poly_counts)[:-1]))
    # edges: (v_j, v_{j+1}) within a ring, plus closing edge (last, first)
    nxt = np.arange(poly_xs.shape[0]) + 1
    ends = np.cumsum(poly_counts) - 1
    nxt[ends] = starts  # wrap each ring
    x1 = poly_xs; y1 = poly_ys
    x2 = poly_xs[nxt]; y2 = poly_ys[nxt]
    ppx = px[own]; ppy = py[own]
    straddle = (y1 > ppy) != (y2 > ppy)
    # x coordinate where the edge crosses the horizontal ray
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (ppy - y1) * (x2 - x1) / (y2 - y1)
    crosses = straddle & (xint > ppx)
    np.add.at(out_cross, own, crosses.astype(np.int64))
    return (out_cross & 1).astype(bool)


def polyline_polygon_intersects(
    wx: np.ndarray, wy: np.ndarray, wc: np.ndarray,
    px_: np.ndarray, py_: np.ndarray, pc: np.ndarray,
) -> np.ndarray:
    """LineString x polygon-ring intersection over candidate pairs.

    Pair i = way block i of (wx, wy) vs ring block i of (px_, py_). True iff
    ANY way vertex lies inside the ring (even-odd, half-open — identical
    rule to point_in_polygon_pairs) OR any way segment PROPERLY crosses any
    ring edge (strict orientation sign tests). A 1D line cannot contain a
    2D ring, so these two conditions are exhaustive up to degenerate
    touching, which the strict tests deliberately exclude on both the
    engine and oracle side (identical double arithmetic)."""
    n = wc.shape[0]
    out = np.zeros(n, dtype=bool)
    if n == 0 or wx.shape[0] == 0 or px_.shape[0] == 0:
        return out
    wstarts = np.concatenate(([0], np.cumsum(wc)[:-1]))
    pstarts = np.concatenate(([0], np.cumsum(pc)[:-1]))

    # (a) any way vertex inside its paired ring: expand to (vertex, ring)
    # pairs and reuse the PIP kernel on repeated ring blocks
    vown = np.repeat(np.arange(n), wc)
    exp_counts = pc[vown]
    v_off = np.concatenate(([0], np.cumsum(exp_counts)[:-1]))
    local = np.arange(exp_counts.sum()) - np.repeat(v_off, exp_counts)
    src = pstarts[vown][np.repeat(np.arange(vown.shape[0]), exp_counts)] + local
    inside = point_in_polygon_pairs(wx, wy, px_[src], py_[src], exp_counts)
    np.logical_or.at(out, vown, inside)

    # (b) proper segment x edge crossings
    segs = np.maximum(wc - 1, 0)
    m = segs * pc
    if m.sum():
        cown = np.repeat(np.arange(n), m)
        offs = np.concatenate(([0], np.cumsum(m)[:-1]))
        local = np.arange(m.sum()) - np.repeat(offs, m)
        sl = local // pc[cown]
        el = local % pc[cown]
        si = wstarts[cown] + sl
        ax1, ay1 = wx[si], wy[si]
        ax2, ay2 = wx[si + 1], wy[si + 1]
        pi = pstarts[cown] + el
        nxt = pi + 1
        wrap = el == pc[cown] - 1
        nxt[wrap] = pstarts[cown][wrap]
        bx1, by1 = px_[pi], py_[pi]
        bx2, by2 = px_[nxt], py_[nxt]
        d1 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
        d2 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
        d3 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
        d4 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
        cross = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
        np.logical_or.at(out, cown, cross)
    return out


def point_segment_dist_sq(px, py, x1, y1, x2, y2) -> np.ndarray:
    """Squared Euclidean point-to-segment distance, pairwise."""
    px = np.asarray(px, dtype=np.float64); py = np.asarray(py, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64); y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64); y2 = np.asarray(y2, dtype=np.float64)
    dx = x2 - x1; dy = y2 - y1
    len_sq = dx * dx + dy * dy
    t = np.where(len_sq > 0, ((px - x1) * dx + (py - y1) * dy) / np.where(len_sq == 0, 1, len_sq), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx = x1 + t * dx; cy = y1 + t * dy
    ex = px - cx; ey = py - cy
    return ex * ex + ey * ey


def point_polyline_dist_sq(
    px: np.ndarray, py: np.ndarray,
    xs: np.ndarray, ys: np.ndarray, counts: np.ndarray,
) -> np.ndarray:
    """Min squared distance from point i to polyline i (flat-coords pairs)."""
    n = counts.shape[0]
    out = np.full(n, np.inf)
    if xs.shape[0] == 0:
        return out
    own = np.repeat(np.arange(n), counts)
    # vertex distances cover single-point geometries and endpoints
    vx = px[own] - xs; vy = py[own] - ys
    np.minimum.at(out, own, vx * vx + vy * vy)
    valid = own[1:] == own[:-1]
    seg_own = own[:-1][valid]
    if seg_own.shape[0]:
        d = point_segment_dist_sq(
            px[seg_own], py[seg_own],
            xs[:-1][valid], ys[:-1][valid], xs[1:][valid], ys[1:][valid],
        )
        np.minimum.at(out, seg_own, d)
    return out


def segment_box_dist_sq(x1, y1, x2, y2, bxmin, bymin, bxmax, bymax) -> np.ndarray:
    """Squared distance between a segment and an axis-aligned box, pairwise.

    0 when they intersect; otherwise min over distances from the segment to
    the 4 box edges and from the box to the 2 segment endpoints. Used for
    buffered-geometry tile assignment: tile intersects buffer(line, d) iff
    dist(line, tile_box) <= d — avoids constructing buffer polygons entirely
    (reference buffers explicitly at RoadlessRasterizeMapSide.scala:97,108).
    """
    inter = segment_box_intersects(x1, y1, x2, y2, bxmin, bymin, bxmax, bymax)

    def seg_seg_dist_sq(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
        # min over point-to-segment distances of all 4 endpoint/segment combos
        d1 = point_segment_dist_sq(ax1, ay1, bx1, by1, bx2, by2)
        d2 = point_segment_dist_sq(ax2, ay2, bx1, by1, bx2, by2)
        d3 = point_segment_dist_sq(bx1, by1, ax1, ay1, ax2, ay2)
        d4 = point_segment_dist_sq(bx2, by2, ax1, ay1, ax2, ay2)
        return np.minimum(np.minimum(d1, d2), np.minimum(d3, d4))

    # 4 box edges
    d = seg_seg_dist_sq(x1, y1, x2, y2, bxmin, bymin, bxmax, bymin)
    d = np.minimum(d, seg_seg_dist_sq(x1, y1, x2, y2, bxmax, bymin, bxmax, bymax))
    d = np.minimum(d, seg_seg_dist_sq(x1, y1, x2, y2, bxmax, bymax, bxmin, bymax))
    d = np.minimum(d, seg_seg_dist_sq(x1, y1, x2, y2, bxmin, bymax, bxmin, bymin))
    return np.where(inter, 0.0, d)


def polyline_box_dist_sq(
    xs: np.ndarray, ys: np.ndarray, counts: np.ndarray,
    bxmin: np.ndarray, bymin: np.ndarray, bxmax: np.ndarray, bymax: np.ndarray,
) -> np.ndarray:
    """Min squared distance from polyline i to box i (flat-coords pairs)."""
    n = counts.shape[0]
    out = np.full(n, np.inf)
    if xs.shape[0] == 0:
        return out
    own = np.repeat(np.arange(n), counts)
    valid = own[1:] == own[:-1]
    seg_own = own[:-1][valid]
    if seg_own.shape[0]:
        d = segment_box_dist_sq(
            xs[:-1][valid], ys[:-1][valid], xs[1:][valid], ys[1:][valid],
            bxmin[seg_own], bymin[seg_own], bxmax[seg_own], bymax[seg_own],
        )
        np.minimum.at(out, seg_own, d)
    # vertices (covers single-point geometries)
    cx = np.clip(xs, bxmin[own], bxmax[own]) - xs
    cy = np.clip(ys, bymin[own], bymax[own]) - ys
    np.minimum.at(out, own, cx * cx + cy * cy)
    return out
