"""Kernel-density heatmap over an integer cell grid.

The reference rasterizes geometry into per-pixel classes and counts
(A1-A5); a production analytics stack also wants the SMOOTHED density
surface — "heatmap of POIs/pings" — i.e. discrete kernel density
estimation over the same grid. This operator computes, for every cell c,

    density(c) = sum over points p of w(c - cell(p))

with the separable integer triangular kernel

    w(dx, dy) = (r+1-|dx|) * (r+1-|dy|)   for |dx|,|dy| <= r, else 0

(the discrete Bartlett window — the standard cheap KDE kernel). All
weights are integers, so a DuckDB twin reproduces every density exactly;
normalizing to a float surface is a presentation-layer division.

Strategies (identical output, pinned in tests/test_kde.py):
  - "separable" (default): per-cell counts (hash agg), then a 1-D
    x-convolution (explode 2r+1 x-offsets, hash agg), then a 1-D
    y-convolution — legal because w(dx,dy) = wx(dx)*wy(dy). Row
    amplification is 2*(2r+1) per OCCUPIED CELL (not per point), vs
    (2r+1)^2 for the direct product — at planet scale with r=8 that is
    34x vs 289x, and the pre-aggregation means the fan-out operates on
    the (much smaller) occupied-cell relation.
  - "direct": one (2r+1)^2 offset explode from the counts relation —
    one fewer shuffle, cheaper for tiny r; kept as the A/B baseline.

100 TB posture: every step is explode-project-aggregate on a computable
int64 cell key — partial aggregation (map-side combine) applies to all
three hash aggs, no join anywhere, and skew from a hot cell is bounded
by the kernel width (a cell receives at most (2r+1)^2 contribution
rows). The same shape as the engine's Bresenham pixel aggregation
(operators/rasterize.py A3), cited there as E5/A3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kde_grid(
    points: DataFrame,
    cell_size: int,
    radius: int,
    x: str = "x",
    y: str = "y",
    strategy: str = "separable",
) -> DataFrame:
    """Discrete triangular-kernel density per grid cell.

    Returns DataFrame(cx, cy, density) for every cell with density > 0.
    Coordinates are floor-divided by `cell_size`; `radius` is the kernel
    half-width in cells (weights are exact integers).
    """
    if strategy not in ("separable", "direct"):
        raise ValueError(f"strategy must be 'separable' or 'direct': {strategy}")
    if cell_size <= 0 or radius < 0:
        raise ValueError("cell_size must be > 0 and radius >= 0")

    counts = points.groupBy(
        F.floor(F.col(x) / cell_size).cast("bigint").alias("cx"),
        F.floor(F.col(y) / cell_size).cast("bigint").alias("cy"),
    ).agg(F.count(F.lit(1)).alias("n"))

    off = F.sequence(F.lit(-radius), F.lit(radius))
    w = lambda d: F.lit(radius + 1) - F.abs(d)  # noqa: E731

    if strategy == "separable":
        xs = (
            counts.withColumn("_dx", F.explode(off))
            .groupBy(
                (F.col("cx") + F.col("_dx")).alias("cx"), F.col("cy")
            )
            .agg(F.sum(F.col("n") * w(F.col("_dx"))).alias("nx"))
        )
        return (
            xs.withColumn("_dy", F.explode(off))
            .groupBy(F.col("cx"), (F.col("cy") + F.col("_dy")).alias("cy"))
            .agg(F.sum(F.col("nx") * w(F.col("_dy"))).alias("density"))
        )

    return (
        counts.withColumn("_dx", F.explode(off))
        .withColumn("_dy", F.explode(off))
        .groupBy(
            (F.col("cx") + F.col("_dx")).alias("cx"),
            (F.col("cy") + F.col("_dy")).alias("cy"),
        )
        .agg(
            F.sum(F.col("n") * w(F.col("_dx")) * w(F.col("_dy"))).alias("density")
        )
    )
