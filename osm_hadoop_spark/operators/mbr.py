"""Minimum rotated rectangle (rotating calipers) per feature — exact
rational area, no trig, no floats.

The oriented-envelope step the E-family was missing: envelope (E7) and
convex hull give axis-aligned and convex containers; the minimum-AREA
bounding rectangle is the standard tightest oriented container
(JTS MinimumDiameter.getMinimumRectangle / shapely
minimum_rotated_rectangle — the reference's Esri geometry dependency
exposes the same under OperatorBoundary-style helpers but osm-hadoop
never calls it; parity target is the JTS semantics). Freeman-Shapira
(1975): the minimum-area rectangle enclosing a convex polygon has one
side collinear with a polygon EDGE — so the search space is the hull's
h edges, not a continuum of angles.

Exactness discipline: for edge e = b - a with squared length
L = |e|^2, the rectangle aligned to e has true area

    area = (W / sqrt(L)) * (H / sqrt(L)) = W * H / L

with W = max-min of the dot projections e.(p-a) and H = max-min of the
cross projections e x (p-a) — ALL integers. The operator therefore
reports area as the reduced fraction (mbr_num, mbr_den) = (W*H, L) /
gcd, compares candidate edges by cross-multiplication in unbounded
Python ints, and never forms a square root. Coordinate budget: inputs
on a grid of side <= 2^14 keep every reported integer inside int64
(W, H <= 2^29+1 so W*H < 2^59; L <= 2^29); the kernel validates it.

Plan shape: same as the hull operator this builds on — the per-feature
point arrays are a per-ROW kernel in one Arrow-batched mapInPandas, no
shuffle of its own; chain_hull (operators/hull.py) collapses each row
to its <= h extreme points ring-ordered, and the caliper scan is O(h^2)
on that tiny ring. Hulls merge (hull-of-union = hull-of-hull-vertices),
so at 100 TB a giant group is a two-level aggregate ending in this same
kernel. The DuckDB twin derives hull membership by the exclusion test,
hull EDGES as the vertex pairs with every point weakly left (exactly
the ring, each edge once, by convexity), and the argmin by HUGEINT
cross-multiplied NOT EXISTS — an independent formulation end to end.
"""

from __future__ import annotations

from fractions import Fraction
from math import gcd
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.hull import chain_hull

GRID_BUDGET = 1 << 14  # max exclusive coordinate: keeps outputs in int64

_OUT_SCHEMA = (
    "g bigint, n_hull int, mbr_num bigint, mbr_den bigint, bbox_area bigint"
)


def _row_mbr(xs: np.ndarray, ys: np.ndarray) -> tuple[int, int, int, int]:
    if xs.min() < 0 or ys.min() < 0 or xs.max() >= GRID_BUDGET or ys.max() >= GRID_BUDGET:
        raise ValueError("coordinates outside the int64-exact grid budget")
    bbox = int(xs.max() - xs.min()) * int(ys.max() - ys.min())
    hull = chain_hull(xs, ys)
    h = len(hull)
    if h <= 2:
        return h, 0, 1, bbox
    hx = hull[:, 0].astype(np.int64)
    hy = hull[:, 1].astype(np.int64)
    best: Fraction | None = None
    best_pair: tuple[int, int] | None = None
    for i in range(h):
        ax, ay = int(hx[i]), int(hy[i])
        bx, by = int(hx[(i + 1) % h]), int(hy[(i + 1) % h])
        ex, ey = bx - ax, by - ay
        den = ex * ex + ey * ey
        along = ex * (hx - ax) + ey * (hy - ay)   # <= 2*G^2: exact in int64
        perp = ex * (hy - ay) - ey * (hx - ax)
        num = int(along.max() - along.min()) * int(perp.max() - perp.min())
        cand = Fraction(num, den)
        if best is None or cand < best:
            best, best_pair = cand, (num, den)
    num, den = best_pair
    d = gcd(num, den)
    return h, num // d, den // d, bbox


def min_rotated_rect(
    feats: DataFrame,
    id_col: str = "g",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """(g, n_hull, mbr_num, mbr_den, bbox_area) per feature: reduced
    exact min-rotated-rectangle area fraction + axis-aligned bbox area.
    Degenerate features (all points collinear) report area 0/1."""
    src = feats.select(
        F.col(id_col).cast("bigint").alias("g"),
        F.col(xs_col).alias("xs"),
        F.col(ys_col).alias("ys"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("g", "n_hull", "mbr_num", "mbr_den", "bbox_area")}
            for g, xs, ys in zip(pdf["g"], pdf["xs"], pdf["ys"]):
                n_hull, num, den, bbox = _row_mbr(
                    np.asarray(xs, dtype=np.int64), np.asarray(ys, dtype=np.int64)
                )
                out["g"].append(g)
                out["n_hull"].append(n_hull)
                out["mbr_num"].append(num)
                out["mbr_den"].append(den)
                out["bbox_area"].append(bbox)
            yield pd.DataFrame(out)

    return src.mapInPandas(kernel, _OUT_SCHEMA)
