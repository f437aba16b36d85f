"""Way x boundary-polygon containment/intersection join (north-star op).

The north rule names "point-in-polygon containment of node/way geometries
against boundary polygons"; nodes are covered by the E8 PIP refine
(`pip_triangles`), this operator covers WAY geometries: a LineString
intersects a ring iff any of its vertices is inside (even-odd) or any
segment properly crosses a ring edge — both tests vectorized in one Arrow
kernel (`functions/spatial.py::polyline_polygon_intersects`).

Scale posture: the boundary table is the classic small dim side (a few
thousand admin polygons vs billions of ways) — broadcast, J4 pattern —
with a JVM-side envelope-overlap pre-filter so the kernel sees only
plausible pairs; for a LARGE boundary table the same kernel composes with
the J3 tile-cover join instead (cover both sides, equi-join on cell, then
refine per pair), exactly like the reference composes its filter stage
with TileRasterizer refine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def way_polygon_join(ways: DataFrame, polygons: DataFrame) -> DataFrame:
    """ways(way_id, xs, ys) x polygons(boundary_id, pxs, pys) ->
    (way_id, boundary_id) pairs that intersect.

    `pxs`/`pys` are the ring vertices WITHOUT the closing repeat (closure
    is implicit, as in the PIP kernel).
    """
    w = ways.select(
        "way_id", "xs", "ys",
        F.array_min("xs").alias("_wx0"), F.array_max("xs").alias("_wx1"),
        F.array_min("ys").alias("_wy0"), F.array_max("ys").alias("_wy1"),
    )
    p = polygons.select(
        "boundary_id", "pxs", "pys",
        F.array_min("pxs").alias("_px0"), F.array_max("pxs").alias("_px1"),
        F.array_min("pys").alias("_py0"), F.array_max("pys").alias("_py1"),
    )
    # envelope pre-filter (necessary condition, JVM-side) on the broadcast
    # cross join: only plausible pairs reach the Python kernel
    cand = w.join(
        F.broadcast(p),
        (F.col("_wx0") <= F.col("_px1")) & (F.col("_px0") <= F.col("_wx1"))
        & (F.col("_wy0") <= F.col("_py1")) & (F.col("_py0") <= F.col("_wy1")),
    ).select("way_id", "xs", "ys", "boundary_id", "pxs", "pys")

    def refine(batches):
        from osm_hadoop_spark.functions.spatial import polyline_polygon_intersects

        for pdf in batches:
            if pdf.shape[0] == 0:
                continue
            wc = pdf["xs"].str.len().to_numpy(dtype=np.int64)
            pc = pdf["pxs"].str.len().to_numpy(dtype=np.int64)
            hit = polyline_polygon_intersects(
                np.concatenate(pdf["xs"].to_numpy()),
                np.concatenate(pdf["ys"].to_numpy()),
                wc,
                np.concatenate(pdf["pxs"].to_numpy()),
                np.concatenate(pdf["pys"].to_numpy()),
                pc,
            )
            yield pd.DataFrame({
                "way_id": pdf["way_id"].to_numpy()[hit],
                "boundary_id": pdf["boundary_id"].to_numpy()[hit],
            })

    return cand.mapInPandas(refine, schema="way_id bigint, boundary_id bigint")
