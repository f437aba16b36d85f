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


def skyline_layers(
    points: DataFrame,
    layers: int,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Skyline layer peeling ("onion" ranking): layer 1 is the Pareto
    frontier, layer ell the frontier of what remains — the standard
    multi-criteria RANKING on top of the single-frontier operator
    (top-k tradeoff tiers; BKS'01 section 5 discusses exactly this
    iteration).  The exact layer index equals longest-dominating-chain
    length, an LIS-type sequential quantity with no one-pass relational
    form, so the engine runs `layers` bounded peeling rounds (the knn.py
    round discipline): each round is pareto_skyline's single-sort window
    pass + one anti-join on id, localCheckpoint'ed; the frame only
    shrinks.  Points deeper than `layers` are omitted (documented,
    pinned).  Returns (id, x, y, layer)."""
    if not 1 <= layers <= 64:
        raise ValueError("layers must be in [1, 64]")
    cur = points.select(
        F.col(id_col).alias("id"),
        F.col(x).cast("bigint").alias("x"),
        F.col(y).cast("bigint").alias("y"),
    ).localCheckpoint(eager=True)
    outs = []
    for ell in range(1, layers + 1):
        sky = pareto_skyline(cur, "x", "y").withColumn(
            "layer", F.lit(ell).cast("bigint")
        )
        outs.append(sky)
        if ell < layers:
            cur = cur.join(
                sky.select("id"), "id", "left_anti"
            ).localCheckpoint(eager=True)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select("id", "x", "y", "layer")


def skyline_round_sql(src: str) -> str:
    """One frontier as a DuckDB fragment over `src`(id, x, y) — the
    exact twin of pareto_skyline's two-RANGE-window filter."""
    return f"""
  SELECT id, x, y FROM (
    SELECT id, x, y,
           min(y) OVER (ORDER BY x
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS yl,
           min(y) OVER (ORDER BY x
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS yle
    FROM {src})
  WHERE (yl IS NULL OR yl > y) AND y = yle
"""
