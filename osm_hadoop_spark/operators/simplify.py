"""Douglas-Peucker polyline simplification — Arrow kernel + replayable rule.

Simplification is the missing half of every tile-rendering pipeline the
reference feeds (its extracts ship full-resolution ways,
/root/reference/src/main/scala/.../ExtractShp.scala:19-52 — viewers
simplify client-side); at planet scale you simplify ONCE per zoom level,
engine-side. Douglas-Peucker is inherently sequential per way (each
split depends on the previous one), so this is an applyInPandas-class
operator per the engine's operator rules (SURVEY section 7): a bounded
per-way NumPy kernel behind mapInPandas, with the per-SPAN distance scan
vectorized (the sequential part is only the split recursion, depth
O(log n) expected; OSM caps ways at 2000 nodes so a group is bounded).

Exact cross-engine semantics — the whole rule is replayable in SQL (the
driver twin is a recursive CTE; precedent: the S2 cover's
replayed-recursion oracle):

  - split span (i0, i1) at the interior point j maximizing
    cr^2, where cr = (x1-x0)*(yp-y0) - (xp-x0)*(y1-y0)
    (2x the triangle area — within one span every candidate shares the
    same base segment, so comparing cr^2 alone IS comparing the
    perpendicular distance; no division, no sqrt, every op an IEEE
    mul/sub identical in NumPy and SQL),
  - split iff cr^2 > eps^2 * len2 (STRICT), len2 = |p1-p0|^2,
  - degenerate closed span (len2 == 0): point distance
    (xp-x0)^2 + (yp-y0)^2 > eps^2,
  - argmax ties -> smallest index (np.argmax first-max == ORDER BY
    c2 DESC, idx ASC LIMIT 1),
  - kept points = span endpoints + every split point.

Scale posture: one groupBy(way) shuffle to assemble vertex arrays (the
same J2 shape as way assembly), then a map-only Arrow stage; output is
the simplified vertex stream. No driver collect, no per-key product.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["douglas_peucker_indices", "simplify_ways"]


def douglas_peucker_indices(xs: np.ndarray, ys: np.ndarray, eps: float) -> np.ndarray:
    """Kept vertex indices (sorted) for one polyline. Iterative stack —
    no Python recursion limit on pathological inputs."""
    n = xs.shape[0]
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    eps2 = eps * eps
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        x0, y0, x1, y1 = xs[i0], ys[i0], xs[i1], ys[i1]
        xp = xs[i0 + 1 : i1]
        yp = ys[i0 + 1 : i1]
        dx, dy = x1 - x0, y1 - y0
        len2 = dx * dx + dy * dy
        if len2 == 0.0:
            c2 = (xp - x0) * (xp - x0) + (yp - y0) * (yp - y0)
            rhs = eps2
        else:
            cr = dx * (yp - y0) - (xp - x0) * dy
            c2 = cr * cr
            rhs = eps2 * len2
        a = int(np.argmax(c2))  # first max on ties
        if c2[a] > rhs:
            j = i0 + 1 + a
            keep[j] = True
            stack.append((i0, j))
            stack.append((j, i1))
    return np.flatnonzero(keep).astype(np.int64)


def simplify_ways(
    ways: DataFrame,
    eps: float,
    way_id: str = "way_id",
    xs: str = "xs",
    ys: str = "ys",
) -> DataFrame:
    """(way_id, ord, x, y) stream of kept vertices per way.

    `ways` carries one ordered vertex-array pair per way (the J2
    assembly output shape). `ord` renumbers the survivors 0..k-1.
    """
    slim = ways.select(
        F.col(way_id).cast("long").alias("way_id"),
        F.col(xs).cast("array<double>").alias("xs"),
        F.col(ys).cast("array<double>").alias("ys"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.shape[0] == 0:
                continue
            out_w, out_o, out_x, out_y = [], [], [], []
            for wid, wxs, wys in zip(pdf["way_id"], pdf["xs"], pdf["ys"]):
                ax = np.asarray(wxs, dtype=np.float64)
                ay = np.asarray(wys, dtype=np.float64)
                idx = douglas_peucker_indices(ax, ay, eps)
                out_w.append(np.full(idx.shape[0], wid, dtype=np.int64))
                out_o.append(np.arange(idx.shape[0], dtype=np.int64))
                out_x.append(ax[idx])
                out_y.append(ay[idx])
            yield pd.DataFrame(
                {
                    "way_id": np.concatenate(out_w),
                    "ord": np.concatenate(out_o),
                    "x": np.concatenate(out_x),
                    "y": np.concatenate(out_y),
                }
            )

    return slim.mapInPandas(run, schema="way_id long, ord long, x double, y double")
