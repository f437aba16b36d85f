"""Morphological map algebra over sparse cell sets: dilation, erosion,
closing, opening — the GDAL/raster-calculator morphology family, over the
same occupied-cell relations the focal/KDE/autocorr operators use.

Structuring element: the Chebyshev square of radius r ((2r+1)^2 offsets,
the standard 8-connected box SE). Set semantics, all integers.

Distributed shapes (both are the scatter shape every sparse-raster op
here uses — linear fan-out on the OCCUPIED cells, never on the lattice):

  dilate(S)  = distinct scatter: each cell emits its (2r+1)^2 translates,
               ONE dropDuplicates (a hash aggregate).
  erode(S)   = counting scatter: each cell emits the centers it supports
               (c - off); a center survives iff its support count equals
               the full SE size. Because the SE contains the origin, a
               surviving center is automatically a member of S — no
               membership join needed at all.

closing = erode(dilate(S)) fills holes/gaps narrower than the SE;
opening = dilate(erode(S)) removes islands smaller than the SE. Both are
two scatter-aggregate stages end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _offsets(radius: int):
    off = F.sequence(F.lit(-radius), F.lit(radius))
    return off


def dilate_cells(cells: DataFrame, radius: int = 1) -> DataFrame:
    """Minkowski dilation of an occupied-cell set (cx, cy) by the radius-r
    Chebyshev square. Returns the distinct dilated set (cx, cy)."""
    off = _offsets(radius)
    return (
        cells.select("cx", "cy")
        .withColumn("_dx", F.explode(off))
        .withColumn("_dy", F.explode(off))
        .select(
            (F.col("cx") + F.col("_dx")).alias("cx"),
            (F.col("cy") + F.col("_dy")).alias("cy"),
        )
        .dropDuplicates(["cx", "cy"])
    )


def erode_cells(cells: DataFrame, radius: int = 1) -> DataFrame:
    """Morphological erosion: cells whose ENTIRE radius-r square lies in
    the set. Counting scatter — no join: center c survives iff all
    (2r+1)^2 members scatter onto it."""
    off = _offsets(radius)
    need = (2 * radius + 1) ** 2
    return (
        cells.select("cx", "cy")
        .withColumn("_dx", F.explode(off))
        .withColumn("_dy", F.explode(off))
        .select(
            (F.col("cx") - F.col("_dx")).alias("cx"),
            (F.col("cy") - F.col("_dy")).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == need)
        .select("cx", "cy")
    )


def close_cells(cells: DataFrame, radius: int = 1) -> DataFrame:
    """Morphological closing (dilate then erode): fills holes and gaps
    narrower than the SE while leaving the outer shape unchanged."""
    return erode_cells(dilate_cells(cells, radius), radius)


def open_cells(cells: DataFrame, radius: int = 1) -> DataFrame:
    """Morphological opening (erode then dilate): removes islands and
    spurs smaller than the SE while leaving large regions unchanged."""
    return dilate_cells(erode_cells(cells, radius), radius)
