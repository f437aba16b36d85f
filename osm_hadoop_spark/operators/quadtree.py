"""Adaptive quadtree tiling: occupancy-capped spatial partitioner.

The skew answer for a 100 TB spatial join: a fixed grid gives metro
cells millions of rows and ocean cells none; the classic fix (Samet's
PR quadtree / the partitioner inside SpatialSpark & Sedona) splits any
cell holding more than ``cap`` points until the cap holds or ``max_depth``
is reached.  The textbook construction is a sequential top-down
recursion; this operator uses the CLOSED FORM instead:

    a point's leaf level = min{ d : |cell_d(point)| <= cap },
    clamped to max_depth  (cell_d = the point's ancestor cell at depth d)

which equals the recursive result because quadtree splitting is decided
per cell: the ancestor chain of a point has monotonically non-increasing
counts, and the recursion stops exactly at the first level whose count
fits.  The closed form needs NO iteration:

  1. explode each point to its (depth, cell) ancestors — a (D+1)x
     fan-out on a slim relation;
  2. ONE hash aggregate -> counts per (depth, cell);
  3. leaf test per CELL, not per point: a cell is a leaf iff its count
     <= cap AND its parent's count > cap (root: count <= cap at depth 0;
     forced leaves: count > cap at depth D).  The parent lookup is an
     equi-join of the counts relation with itself on (depth-1, cell>>1)
     — counts is tiny (one row per occupied cell), so this broadcasts.

Everything is integer bit arithmetic in codegen.  The output is the
leaf cell set with occupancy — exactly the partition map a downstream
repartitioner or range-join would consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quadtree_leaves(
    points: DataFrame, size_pow: int, cap: int, max_depth: int
) -> DataFrame:
    """Occupancy-capped quadtree leaves over integer points.

    Input: DataFrame(x, y) with 0 <= x, y < 2**size_pow.  Returns
    DataFrame(depth, cx, cy, n_points): disjoint leaf cells covering
    every input point; ``n_points <= cap`` unless ``depth == max_depth``
    (forced leaves).
    """
    x, y = F.col("x").cast("long"), F.col("y").cast("long")
    ancestors = F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                F.shiftrightunsigned(x, size_pow - d).alias("cx"),
                F.shiftrightunsigned(y, size_pow - d).alias("cy"),
            )
            for d in range(max_depth + 1)
        ]
    )
    counts = (
        points.select(F.explode(ancestors).alias("c"))
        .groupBy(
            F.col("c.depth").alias("depth"),
            F.col("c.cx").alias("cx"),
            F.col("c.cy").alias("cy"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    parents = counts.select(
        (F.col("depth") + 1).alias("depth"),
        F.col("cx").alias("pcx"),
        F.col("cy").alias("pcy"),
        F.col("n_points").alias("parent_n"),
    )
    joined = counts.join(
        F.broadcast(parents),
        (counts["depth"] == parents["depth"])
        & (F.shiftrightunsigned(counts["cx"], 1) == F.col("pcx"))
        & (F.shiftrightunsigned(counts["cy"], 1) == F.col("pcy")),
        "left",
    )
    # a cell exists in the tree iff its parent was split (root always
    # exists); it is a leaf iff it additionally fits the cap or is at
    # the depth limit (forced leaf)
    parent_split = (counts["depth"] == 0) | (F.col("parent_n") > cap)
    is_leaf = parent_split & (
        (F.col("n_points") <= cap) | (counts["depth"] == max_depth)
    )
    return joined.filter(is_leaf).select(
        counts["depth"], "cx", "cy", "n_points"
    )
