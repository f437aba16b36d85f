"""Grid pole-of-inaccessibility (label point) per polygon — the exact
relational counterpart of Mapbox's `polylabel` (the standard GIS label
placement op: the interior point farthest from the boundary).

`polylabel` proper refines a quadtree with float distances; here the
candidate set is the full integer cell lattice of each polygon's bbox,
which makes the whole computation three relational steps with NO
iteration and NO floats:

  1. candidate cells: one bbox-grid explode per polygon (bounded by
     bbox area — the caller picks the lattice resolution by scaling
     its coordinates);
  2. cells x edges (edge table broadcast — it is |V| rows per polygon):
     per (cell, edge) an exact even-odd ray-crossing flag and an exact
     point-to-segment distance, both in DOUBLED integer coordinates so
     cell centers (2px+1, 2py+1) are never on the integer vertex
     lattice — no degenerate ray cases, no epsilon;
  3. one aggregate: crossing parity (interior test) + min edge distance,
     then a per-polygon rank picks the farthest interior cell.

Distance exactness: point-segment distance^2 is rational num/ab2 when
the projection falls inside the segment; it is compared through the
fixed-point integer `(num * SCALE) DIV ab2` (Spark DIV == DuckDB `//`
on non-negative bigints, the repo's cross-engine discipline), endpoint
cases are exact integers scaled by the same SCALE. Ties broken by
(px, py), so the label point is a deterministic function of the input.

100 TB posture: cost is cells_per_polygon x vertices_per_polygon, all
linear per polygon with no cross-polygon operation; the only shuffle is
the final per-(poly, cell) aggregate on slim integer keys. Skew = one
polygon with a huge bbox x vertex count; the lattice explode spreads
that polygon's cells across partitions before the (broadcast) edge
join, so even a single world-sized polygon parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1 << 20


def grid_polylabel(polys: DataFrame, scale: int = SCALE) -> DataFrame:
    """polys(poly_id, xs array<bigint>, ys array<bigint>) closed rings in
    integer coordinates -> (poly_id, px, py, d2q): the bbox-lattice cell
    whose center is interior (even-odd) and farthest from every edge,
    with d2q = fixed-point scaled squared distance (doubled coords)."""
    n = F.size("xs")
    edges = polys.select(
        "poly_id",
        F.explode(F.sequence(F.lit(1), n)).alias("i"),
        "xs", "ys",
    ).select(
        "poly_id",
        (F.element_at("xs", F.col("i")) * 2).alias("x1"),
        (F.element_at("ys", F.col("i")) * 2).alias("y1"),
        (F.element_at("xs", F.col("i") % F.size("xs") + 1) * 2).alias("x2"),
        (F.element_at("ys", F.col("i") % F.size("ys") + 1) * 2).alias("y2"),
    )
    cells = (
        polys.select(
            "poly_id",
            F.explode(
                F.sequence(F.array_min("xs"), F.array_max("xs"))
            ).alias("px"),
            F.array_min("ys").alias("ylo"),
            F.array_max("ys").alias("yhi"),
        )
        .repartition(polys.sparkSession.sparkContext.defaultParallelism)
        .select(
            "poly_id", "px",
            F.explode(F.sequence(F.col("ylo"), F.col("yhi"))).alias("py"),
        )
        .select(
            "poly_id", "px", "py",
            (F.col("px") * 2 + 1).alias("qx"),
            (F.col("py") * 2 + 1).alias("qy"),
        )
    )
    ce = cells.join(F.broadcast(edges), "poly_id")
    dy = F.col("y2") - F.col("y1")
    # even-odd ray to +x: qy (odd) strictly between even y1, y2
    between = (
        F.least("y1", "y2") < F.col("qy")
    ) & (F.col("qy") < F.greatest("y1", "y2"))
    side = (F.col("qy") - F.col("y1")) * (F.col("x2") - F.col("x1")) - (
        F.col("qx") - F.col("x1")
    ) * dy
    crossing = between & (
        ((dy > 0) & (side > 0)) | ((dy < 0) & (side < 0))
    )
    # exact point-to-segment distance^2, fixed-point scaled: dot = AP.AB,
    # ab2 = |AB|^2; projection inside -> |AP|^2*S - (dot^2*S) DIV ab2
    # (the DIV form is replicated verbatim in the SQL twin)
    d2q = F.expr(f"""CASE
      WHEN (qx-x1)*(x2-x1)+(qy-y1)*(y2-y1) <= 0
        THEN ((qx-x1)*(qx-x1)+(qy-y1)*(qy-y1)) * {scale}
      WHEN (qx-x1)*(x2-x1)+(qy-y1)*(y2-y1) >=
           (x2-x1)*(x2-x1)+(y2-y1)*(y2-y1)
        THEN ((qx-x2)*(qx-x2)+(qy-y2)*(qy-y2)) * {scale}
      ELSE ((qx-x1)*(qx-x1)+(qy-y1)*(qy-y1)) * {scale}
           - (((qx-x1)*(x2-x1)+(qy-y1)*(y2-y1))
              * ((qx-x1)*(x2-x1)+(qy-y1)*(y2-y1)) * {scale})
             DIV ((x2-x1)*(x2-x1)+(y2-y1)*(y2-y1))
    END""")
    per_cell = ce.groupBy("poly_id", "px", "py").agg(
        (F.sum(crossing.cast("bigint")) % 2 == 1).alias("interior"),
        F.min(d2q).alias("d2q"),
    )
    w = Window.partitionBy("poly_id").orderBy(
        F.desc("d2q"), F.col("px"), F.col("py")
    )
    return (
        per_cell.filter("interior")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("poly_id", "px", "py", "d2q")
    )
