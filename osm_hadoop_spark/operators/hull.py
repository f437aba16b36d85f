"""Convex hull of each feature's point set.

Reference parity: osm-hadoop carries no hull operator, but its geometry
stack (Esri `OperatorIntersects` usage, e.g.
/root/reference/src/main/scala/org/roadless/RoadlessRoadCount.scala:139-158)
exposes envelope/containment primitives that a hull completes: the hull is
the tightest convex container, the natural refinement step between the
envelope pre-filter and exact PIP. This operator is an engine ADDITION in
the same E-family as shoelace area/centroid (functions/geodesic.py).

Semantics: EXTREME points only — duplicate coordinates are collapsed and
collinear boundary points dropped, so the result is the minimal vertex
set whose convex combination covers the input. Output is the vertex SET
(one row per vertex), not a ring ordering: set semantics compose with
distributed evaluation (hull-of-union = hull-of-hull-vertices) and with
the driver's sort-by-all-columns hash compare. Degenerate inputs follow
the same rule: 1 distinct point -> itself, 2 -> both, all-collinear ->
the 2 extremes.

Plan: the per-feature points arrive as the assembled xs/ys arrays (the
J2 group-join output), so the hull is a per-ROW kernel — one Arrow-batched
`mapInPandas` pass, no shuffle of its own. Each row runs Andrew's
monotone chain (O(n log n), strict turns) over int64 coords; exact
integer cross products, no epsilon. At 100 TB the shape holds because
hulls MERGE: hull(A u B) = hull(vertices(A) u vertices(B)), so a group
too large for one array is a two-level aggregate (partition-local chain
-> tiny vertex set -> final chain), the same associative-partial-agg
posture as every sum in the engine. The per-row variant shipped here is
the inner kernel of that recursion.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chain_hull(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Andrew monotone chain over int64 points -> (k, 2) extreme points.

    Strict turns (`<= 0` pops): collinear edge-interior points and the
    chain seams are dropped, so the result is exactly the extreme-point
    set — the same set the exclusion-test oracle (on-segment-of-two /
    strictly-inside-triangle-of-three) defines from the opposite
    direction.
    """
    pts = np.unique(np.stack([xs, ys], axis=1), axis=0)  # lex-sorted
    if len(pts) <= 2:
        return pts

    def half(ordered: np.ndarray) -> list[tuple[int, int]]:
        h: list[tuple[int, int]] = []
        for px, py in ordered:
            while len(h) >= 2:
                ox, oy = h[-2]
                ax, ay = h[-1]
                if (ax - ox) * (py - oy) - (ay - oy) * (px - ox) > 0:
                    break
                h.pop()
            h.append((int(px), int(py)))
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.int64)


def convex_hull(
    feats: DataFrame,
    id_col: str = "way_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """Hull vertex set per feature: (id, hx, hy) rows, int64 exact."""
    src = feats.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(xs_col).cast("array<bigint>").alias("xs"),
        F.col(ys_col).cast("array<bigint>").alias("ys"),
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            hxs: list[int] = []
            hys: list[int] = []
            for fid, xa, ya in zip(
                pdf["id"].values, pdf["xs"].values, pdf["ys"].values
            ):
                h = chain_hull(
                    np.asarray(xa, dtype=np.int64),
                    np.asarray(ya, dtype=np.int64),
                )
                ids.extend([fid] * len(h))
                hxs.extend(h[:, 0].tolist())
                hys.extend(h[:, 1].tolist())
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "hx": pd.Series(hxs, dtype="int64"),
                    "hy": pd.Series(hys, dtype="int64"),
                }
            )

    out = src.mapInPandas(kern, "id long, hx long, hy long")
    return out.select(F.col("id").alias(id_col), "hx", "hy")


def discrete_one_center(
    feats: DataFrame,
    id_col: str = "way_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """Discrete 1-center (minimax facility) per feature.

    The center is restricted to the feature's own SITES: pick the point
    c minimizing max_p d2(c, p) over the feature's points — the integer
    "which existing stop best covers the route" variant of the minimum
    enclosing circle (exact: squared euclidean, bigint throughout; the
    continuous MEC needs irrational circumcenters that no cross-engine
    hash can pin). Ties break on smallest (r2, cx, cy).

    Returns DataFrame(id, n_pts, r2, cx, cy).

    Plan: ZERO shuffles of its own. The inner max over points equals the
    max over HULL vertices (a farthest point is always extreme), so one
    Arrow pass appends each row's hull vertex arrays alongside its point
    arrays (no explode, no re-group), and the minimax fold is a pure JVM
    `transform`/`array_min` expression: O(n * h) integer ops per row,
    whole-stage codegen. The oracle in __spark_entry__.py is the brute
    candidates x points double join — proving the hull pruning lossless.

    100 TB posture: per-row cost is bounded by feature size (OSM caps
    ways at 2000 nodes; h << n in practice); there is no shuffle, no
    join, no per-row Python beyond the Arrow-batched hull kernel shared
    with convex_hull().
    """
    src = feats.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(xs_col).cast("array<bigint>").alias("xs"),
        F.col(ys_col).cast("array<bigint>").alias("ys"),
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hxs: list[list[int]] = []
            hys: list[list[int]] = []
            for xa, ya in zip(pdf["xs"].values, pdf["ys"].values):
                h = chain_hull(
                    np.asarray(xa, dtype=np.int64),
                    np.asarray(ya, dtype=np.int64),
                )
                hxs.append(h[:, 0].tolist())
                hys.append(h[:, 1].tolist())
            yield pd.DataFrame(
                {"id": pdf["id"], "xs": pdf["xs"], "ys": pdf["ys"],
                 "hxs": hxs, "hys": hys}
            )

    withh = src.mapInPandas(
        kern,
        "id long, xs array<bigint>, ys array<bigint>, "
        "hxs array<bigint>, hys array<bigint>",
    )
    pts = F.arrays_zip(F.col("xs"), F.col("ys"))
    hull = F.arrays_zip(F.col("hxs"), F.col("hys"))

    def r2_of(p, q):
        return (p["xs"] - q["hxs"]) * (p["xs"] - q["hxs"]) + (
            p["ys"] - q["hys"]
        ) * (p["ys"] - q["hys"])

    best = F.array_min(
        F.transform(
            pts,
            lambda p: F.struct(
                F.array_max(F.transform(hull, lambda q: r2_of(p, q))).alias("r2"),
                p["xs"].alias("cx"),
                p["ys"].alias("cy"),
            ),
        )
    )
    return withh.select(
        F.col("id").alias(id_col),
        F.size("xs").cast("bigint").alias("n_pts"),
        best["r2"].alias("r2"),
        best["cx"].alias("cx"),
        best["cy"].alias("cy"),
    )
