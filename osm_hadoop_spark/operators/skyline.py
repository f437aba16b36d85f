"""2-D Pareto skyline (dominance frontier) — minimize both axes.

A point a DOMINATES b when a.x <= b.x, a.y <= b.y and at least one is
strict; the skyline is the set of non-dominated points (duplicates of a
frontier point are all kept — neither strictly beats the other). The
classic multi-criteria "best tradeoffs" query (Borzsony/Kossmann/Stocker
ICDE'01); the reference has nothing like it, but a routing/curation
stack wants it constantly (cheapest-vs-shortest, quality-vs-length).

Plan — ONE global sort, zero joins, zero Python: after sorting by x the
2-D skyline is exactly the strict running-minimum frontier of y, so two
window functions finish the job:

  keep(p) =  (min y over x' < x)  >  p.y          [nothing left-and-below]
         AND p.y = (min y over x' <= x)           [best of its own column,
                                                   given the first clause]

Both windows are RANGE frames over the SAME orderBy(x) — frame ends -1
(strictly smaller x; a ROW frame would leak same-x rows in) and 0 (all
x-peers included) — so Catalyst plans exactly ONE Exchange
(rangepartitioning) + one sort + one Window operator, the same
single-sort posture as the gaps-and-islands operator. At 100 TB
the range partitioner balances by x regardless of frontier size: no
collect, no per-partition-then-merge bottleneck, skyline cardinality
never concentrates on one node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_skyline(points: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Non-dominated rows of `points` (integer axes, both minimized).

    Returns the input rows (all columns) that lie on the frontier.
    """
    order = Window.orderBy(F.col(x).cast("bigint"))
    left = order.rangeBetween(Window.unboundedPreceding, -1)
    upto = order.rangeBetween(Window.unboundedPreceding, 0)
    # given _yl > y, min-over-x'<=x equals y exactly when p is the best
    # of its own x column (duplicates of that best all qualify)
    return (
        points.withColumn("_yl", F.min(F.col(y)).over(left))
        .withColumn("_yle", F.min(F.col(y)).over(upto))
        .filter(
            (F.col("_yl").isNull() | (F.col("_yl") > F.col(y)))
            & (F.col(y) == F.col("_yle"))
        )
        .drop("_yl", "_yle")
    )
