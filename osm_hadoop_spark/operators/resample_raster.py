"""Bilinear raster upsampling over sparse cell grids (gdalwarp-style
resampling, re-expressed relationally).

The engine's rasters are sparse (cell, value) relations (operators/
rasterize.py, zonal.py, focal.py). Upsampling by an integer factor k puts
a fine pixel X = i·k + fx between the coarse samples i and i+1 with exact
rational weights (k-fx)/k per axis — so every fine value's NUMERATOR
    num(X, Y) = Σ_corners (k-|dx|)(k-|dy|)·v     (denominator k² constant)
is exact int64, the engine-wide integer discipline.

Plan shape (join-free, the morphology/dilate pattern): instead of joining
each fine pixel to its 4 corners, every coarse cell SCATTERS its (2k-1)²
weighted contributions — two nested JVM sequence/explode, zero Python —
into one map-side-combinable hash aggregate on the fine key. Completeness
falls out of the weight algebra: a fine pixel is fully determined iff its
received weights sum to exactly k² (the 4 corner weights always total k²,
and absent zero-weight corners contribute nothing), so sparse-boundary
pixels are dropped by an exact integer predicate, not a corner-existence
join. One shuffle total; amplification is the fixed constant (2k-1)².

The DuckDB twin derives the same surface the OTHER way (gather: anchor
scatter + three LEFT-JOINed corners with per-corner presence rules) —
agreement proves the scatter/weight-sum trick against the textbook
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bilinear_upsample(
    cells: DataFrame, k: int, value: str = "elev"
) -> DataFrame:
    """(cx, cy, value) -> (px, py, val_num) at factor k; val = val_num/k².

    Only fine pixels whose every nonzero-weight corner exists are emitted
    (weight-sum == k² predicate; see module docstring).
    """
    off = F.sequence(F.lit(-(k - 1)), F.lit(k - 1))
    d = cells.select("cx", "cy", F.col(value).alias("v"))
    e = (
        d.select("cx", "cy", "v", F.explode(off).alias("dx"))
        .select("cx", "cy", "v", "dx", F.explode(off).alias("dy"))
        .select(
            (F.col("cx") * k + F.col("dx")).alias("px"),
            (F.col("cy") * k + F.col("dy")).alias("py"),
            (
                (k - F.abs(F.col("dx"))) * (k - F.abs(F.col("dy")))
            ).alias("w"),
            "v",
        )
    )
    return (
        e.groupBy("px", "py")
        .agg(
            F.sum(F.col("w") * F.col("v")).alias("val_num"),
            F.sum("w").alias("wsum"),
        )
        .filter(F.col("wsum") == k * k)
        .select("px", "py", "val_num")
    )
