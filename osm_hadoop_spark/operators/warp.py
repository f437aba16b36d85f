"""Raster affine warp (nearest neighbor) over the relational lattice —
the reproject/rotate/rescale primitive of every raster pipeline (GDAL's
`gdalwarp -r near`), expressed as one computed-key equi-join.

Standard warp semantics: iterate TARGET pixels, inverse-map each center
through the affine transform into source pixel space, gather the nearest
source cell (here: the containing cell, i.e. floor of the mapped
coordinate — nearest-neighbor with the half-pixel convention folded into
the caller's `c`/`f` offsets). Missing source cells fill 0, matching the
sparse nodata-as-zero convention of focal_convolve.

The transform is integer fixed-point: sx = floor((a*tx + b*ty + c)/den),
sy likewise — exact in both engines. Floor division is written out as
(n - pmod(n, den)) / den because Spark's DIV truncates toward zero while
DuckDB's // floors; the explicit form is floor in BOTH for negative
numerators (rotations produce them), keeping the cross-engine value
discipline without a non-negativity precondition.

100 TB posture: the target lattice is generated (no scan), the source
raster shuffles ONCE on its (cx, cy) key for the gather join, and the
join key is computable — no index structure, no Python. Downscale skew
(many target pixels hitting one source cell) is an equi-join hot key
bounded by the scale factor squared; AQE's skew split handles it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def floordiv(n: Column, den: int) -> Column:
    """floor(n / den) for den > 0, exact on negatives (see module doc)."""
    return ((n - F.pmod(n, F.lit(den))) / den).cast("bigint")


def affine_warp_nearest(
    cells: DataFrame,
    coeffs: tuple[int, int, int, int, int, int],
    den: int,
    bbox: tuple[int, int, int, int],
) -> DataFrame:
    """cells(cx, cy, v) -> (tx, ty, v) for every target pixel of
    bbox = (x0, x1, y0, y1) inclusive; coeffs = (a, b, c, d, e, f) maps
    target -> source: sx = floor((a*tx + b*ty + c)/den), sy likewise."""
    a, b, c, d, e, f = coeffs
    x0, x1, y0, y1 = bbox
    spark = cells.sparkSession
    target = (
        spark.range(x0, x1 + 1)
        .select(F.col("id").alias("tx"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "tx",
            F.explode(F.sequence(F.lit(y0), F.lit(y1))).alias("ty"),
        )
        .select(
            "tx", "ty",
            floordiv(
                F.col("tx") * a + F.col("ty") * b + F.lit(c), den
            ).alias("cx"),
            floordiv(
                F.col("tx") * d + F.col("ty") * e + F.lit(f), den
            ).alias("cy"),
        )
    )
    return target.join(cells, ["cx", "cy"], "left").select(
        "tx", "ty", F.coalesce(F.col("v"), F.lit(0).cast("bigint")).alias("v")
    )
