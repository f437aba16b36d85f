"""Inverse-distance-weighted (IDW) interpolation onto an integer grid.

The reference's raster family writes per-pixel classes and counts
(A1-A5, RoadlessRasterize*.scala); a production stack also wants the
INTERPOLATED surface — "estimate the field value everywhere near my
samples" — the classic IDW gridding step. For every grid cell c whose
center lies within euclidean `radius` of at least one sample point:

    val(c) = sum_i w_i * v_i / sum_i w_i      over in-radius samples i
    w_i    = Q div (1 + d2q_i)                (fixed-point 1/(1+d^2))

All arithmetic is integer-exact: distances are measured point-to-cell-
CENTER in half-unit coordinates (doubling avoids the cell/2 fraction),
so d2q = (2*px - (2*cx*cell + cell))^2 + (same for y) is an exact
bigint, the weight is one integer division (Q = 2^20 keeps every
in-radius weight >= 1 for any radius <= ~1000 units), and the reported
value is the fixed-point quotient div(num * scale, den). The numerator
and denominator are also emitted so a consumer can re-normalize.

Plan (scale-first, NO join): each sample SCATTERS to the (2rc+1)^2
candidate cells around its home cell (one sequence-explode per axis,
rc = radius div cell + 1 bounds the Chebyshev reach of the euclidean
ball), the exact in-radius filter runs before the aggregate, and one
hash agg with map-side combine produces num/den/count per cell. Same
explode-project-filter-aggregate posture as the KDE operator
(operators/kde.py) and Bresenham pixel agg (A3): computable int64 keys,
partial aggregation everywhere, no shuffle besides the final agg, hot
cells bounded by (2rc+1)^2 contributions per sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDW_Q = 1 << 20


def idw_grid(
    points: DataFrame,
    cell_size: int,
    radius: int,
    scale: int = 1024,
    x: str = "x",
    y: str = "y",
    v: str = "v",
) -> DataFrame:
    """(cx, cy, npts, den, num, val_q) for every cell with an in-radius
    sample. `val_q` is the IDW estimate in fixed-point `scale` units."""
    if cell_size <= 0 or radius <= 0:
        raise ValueError("cell_size and radius must be > 0")
    rc = radius // cell_size + 1
    off = F.sequence(F.lit(-rc), F.lit(rc))

    pts = points.select(
        F.col(x).cast("bigint").alias("px"),
        F.col(y).cast("bigint").alias("py"),
        F.col(v).cast("bigint").alias("pv"),
        F.floor(F.col(x).cast("double") / cell_size).cast("bigint").alias("hx"),
        F.floor(F.col(y).cast("double") / cell_size).cast("bigint").alias("hy"),
    )
    cand = (
        pts.withColumn("_dx", F.explode(off))
        .withColumn("_dy", F.explode(off))
        .select(
            (F.col("hx") + F.col("_dx")).alias("cx"),
            (F.col("hy") + F.col("_dy")).alias("cy"),
            "px",
            "py",
            "pv",
        )
        .withColumn(
            "d2q",
            (2 * F.col("px") - (2 * F.col("cx") * cell_size + cell_size))
            * (2 * F.col("px") - (2 * F.col("cx") * cell_size + cell_size))
            + (2 * F.col("py") - (2 * F.col("cy") * cell_size + cell_size))
            * (2 * F.col("py") - (2 * F.col("cy") * cell_size + cell_size)),
        )
        .filter(F.col("d2q") <= 4 * radius * radius)
        .withColumn("w", F.expr(f"div({IDW_Q}, 1 + d2q)"))
    )
    return (
        cand.groupBy("cx", "cy")
        .agg(
            F.count(F.lit(1)).alias("npts"),
            F.sum("w").alias("den"),
            F.sum(F.col("w") * F.col("pv")).alias("num"),
        )
        .select(
            "cx",
            "cy",
            "npts",
            "den",
            "num",
            F.expr(f"div(num * {scale}, den)").alias("val_q"),
        )
    )
