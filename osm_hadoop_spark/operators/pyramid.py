"""Raster overview pyramid: 2x downsampled levels with an associative
reducer — the engine's analog of `gdaladdo` / COG overviews.

The reference renders one full-resolution raster (A1-A3,
WayRasterizer.scala); serving it at web-map zooms needs the OVERVIEW
levels too: level k pixel (x, y) summarizes the 2^k x 2^k block of level
0 pixels (x << k .. , y << k ..). For categorical class rasters the
reducer is the precedence/min rule the engine already uses per pixel
(A1/A2); for counts it is sum.

Exactness: the reducer is associative+commutative, so ITERATED halving
(level k from level k-1) equals DIRECT aggregation (level k from level
0 by x >> k) — the driver oracle recomputes every level directly, which
is an independent evaluation order, and the pytest pins iterated ==
direct on the operator itself.

100 TB posture: level k has ~1/4^k the rows of level k-1 — the iterated
form is the scale path, total work a geometric series of hash aggregates
(1 + 1/4 + 1/16 + ...), each partial-aggregatable (map-side combine),
keys arithmetic. This is the same rollup discipline as
cell_rollup_z14_z7 (E11 parent rollup) applied to the pixel grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REDUCERS = {"min": F.min, "max": F.max, "sum": F.sum}


def build_pyramid(
    pixels: DataFrame,
    levels: int,
    value: str = "v",
    x: str = "px",
    y: str = "py",
    agg: str = "min",
) -> DataFrame:
    """Levels 0..levels of a 2x pyramid.

    Input: one row per level-0 pixel (x, y, value). Output:
    DataFrame(level, px, py, v) — level 0 is the input verbatim; level k
    aggregates level k-1 2x2 blocks with `agg` (min | max | sum).
    """
    if agg not in _REDUCERS:
        raise ValueError(f"agg must be one of {sorted(_REDUCERS)}: {agg}")
    if levels < 0:
        raise ValueError("levels must be >= 0")
    red = _REDUCERS[agg]

    cur = pixels.select(
        F.lit(0).cast("bigint").alias("level"),
        F.col(x).cast("bigint").alias("px"),
        F.col(y).cast("bigint").alias("py"),
        F.col(value).alias("v"),
    )
    out = cur
    for k in range(1, levels + 1):
        cur = (
            cur.groupBy(
                F.lit(k).cast("bigint").alias("level"),
                F.shiftright("px", 1).alias("px"),
                F.shiftright("py", 1).alias("py"),
            )
            .agg(red("v").alias("v"))
        )
        out = out.unionByName(cur)
    return out
