"""Sort-Tile-Recursive (STR) R-tree bulk packing — exact leaf layout
without a global-sort window.

STR (Leutenegger/Lopez/Edgington 1997) is the standard bulk loader for
spatial indexes: sort rectangles by center x, cut into ceil(sqrt(P))
vertical slices of C*ceil(sqrt(P)) rects each (P = ceil(n/C) leaves of
capacity C), then within each slice sort by center y and group runs of
C into leaves.  Leaf MBRs are what the index stores; their quality
(area/overlap) is what makes the filter step of filter-and-refine joins
(operators/tile_join.py, the reference's OsmFeatureTable spatial scans)
cheap.  The reference leans on HBase row-key layout instead of an
R-tree (src/main/java/.../OsmFeatureTable.java); this operator is the
engine-side equivalent layout planner, the rectangle analog of the
key-balanced `balanced_range_buckets` and the locality-clustered
`hilbert_layout_keys` (operators/ranges.py, rangeplan.py).

Exactness: centers are kept DOUBLED (xmin+xmax, ymin+ymax — int64, no
halving round-off) and every ordering is made total by the unique rect
id, so the packing is a pure function of the input set.  The naive
plan's global `row_number() OVER (ORDER BY cx)` is a single-partition
window — the canonical anti-scale shape.  Here the x-rank comes from
the same two-level distributed prefix sum as balanced_range_buckets:
per-center counts, coarse-bucket subtotals prefix-summed over a
bounded-size relation, partitioned within-coarse cumulative, then a
per-center row_number ordered by id.  The only per-slice window
partitions by slice id (parallel across the ~sqrt(P) slices; a slice
holds C*ceil(sqrt(P)) rows — for n = 10^9, C = 256 that is ~16 k rows
per slice, trivially windowable).  The DuckDB twin uses the naive
global row_number — opposite mechanism, identical leaves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def str_pack(
    rects: DataFrame, capacity: int, coarse_div: int = 1 << 6
) -> DataFrame:
    """rects(id, xmin, ymin, xmax, ymax) int64 -> one row per STR leaf:
    (slice, leaf, n_rects, xmin, ymin, xmax, ymax).  `capacity` is the
    leaf fan-out C; slice count is ceil(sqrt(ceil(n/C))) per STR."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    r = rects.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("xmin").cast("bigint").alias("xmin"),
        F.col("ymin").cast("bigint").alias("ymin"),
        F.col("xmax").cast("bigint").alias("xmax"),
        F.col("ymax").cast("bigint").alias("ymax"),
        (F.col("xmin") + F.col("xmax")).cast("bigint").alias("cx2"),
        (F.col("ymin") + F.col("ymax")).cast("bigint").alias("cy2"),
    )

    # exact global x-rank via the two-level prefix sum (ranges.py shape)
    cnt = r.groupBy("cx2").agg(F.count(F.lit(1)).alias("c"))
    cnt = cnt.withColumn("coarse", F.expr(f"cx2 DIV {int(coarse_div)}"))
    sub = cnt.groupBy("coarse").agg(F.sum("c").alias("sc"))
    w_coarse = Window.orderBy("coarse").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sub = sub.select(
        "coarse", F.coalesce(F.sum("sc").over(w_coarse), F.lit(0)).alias("off")
    )
    w_in = (
        Window.partitionBy("coarse")
        .orderBy("cx2")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    starts = cnt.join(sub, "coarse").select(
        "cx2",
        (F.col("off") + F.coalesce(F.sum("c").over(w_in), F.lit(0))).alias(
            "start"
        ),
    )

    # slice geometry needs n (for P and S); keep it in-plan as a scalar
    total = r.groupBy().agg(F.count(F.lit(1)).alias("n"))
    cap = int(capacity)
    geom = total.select(
        "n",
        F.expr(f"(n + {cap} - 1) DIV {cap}").alias("p"),
    ).select(
        "n",
        # S = ceil(sqrt(P)) — int64-exact via ceil over double sqrt,
        # corrected by one integer comparison (sqrt of int64 fits a
        # double's 53-bit mantissa for any feasible leaf count)
        F.expr(
            "CAST(CASE WHEN CAST(ceil(sqrt(CAST(p AS DOUBLE))) AS BIGINT)"
            "          * CAST(ceil(sqrt(CAST(p AS DOUBLE))) AS BIGINT) "
            "          < p "
            "     THEN CAST(ceil(sqrt(CAST(p AS DOUBLE))) AS BIGINT) + 1 "
            "     ELSE CAST(ceil(sqrt(CAST(p AS DOUBLE))) AS BIGINT) END "
            "AS BIGINT)"
        ).alias("s"),
    )

    w_id = Window.partitionBy("cx2").orderBy("id")
    ranked = (
        r.withColumn("_rn", F.row_number().over(w_id))
        .join(starts, "cx2")
        .crossJoin(F.broadcast(geom))
        .select(
            "id",
            "xmin",
            "ymin",
            "xmax",
            "ymax",
            "cy2",
            F.expr(f"(start + _rn - 1) DIV ({cap} * s)").alias("slice"),
        )
    )

    w_slice = Window.partitionBy("slice").orderBy("cy2", "id")
    leaves = ranked.withColumn(
        "_ry", (F.row_number().over(w_slice) - 1).cast("bigint")
    ).select(
        "slice",
        F.expr(f"_ry DIV {cap}").alias("leaf"),
        "xmin",
        "ymin",
        "xmax",
        "ymax",
    )
    return leaves.groupBy("slice", "leaf").agg(
        F.count(F.lit(1)).cast("long").alias("n_rects"),
        F.min("xmin").alias("xmin"),
        F.min("ymin").alias("ymin"),
        F.max("xmax").alias("xmax"),
        F.max("ymax").alias("ymax"),
    )


def str_pack_sql(src: str, capacity: int) -> str:
    """DuckDB twin over CTE/table `src`(id, xmin, ymin, xmax, ymax):
    naive global row_number mechanism, identical leaves."""
    cap = int(capacity)
    return f"""
WITH g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST((count(*) + {cap} - 1) // {cap} AS BIGINT) AS p
  FROM {src}
), gs AS (
  SELECT n, p,
         CAST(CASE WHEN CAST(ceil(sqrt(CAST(p AS DOUBLE))) AS BIGINT)
                        * CAST(ceil(sqrt(CAST(p AS DOUBLE))) AS BIGINT) < p
               THEN CAST(ceil(sqrt(CAST(p AS DOUBLE))) AS BIGINT) + 1
               ELSE CAST(ceil(sqrt(CAST(p AS DOUBLE))) AS BIGINT) END
          AS BIGINT) AS s
  FROM g
), rx AS (
  SELECT id, xmin, ymin, xmax, ymax, ymin + ymax AS cy2,
         (row_number() OVER (ORDER BY xmin + xmax, id) - 1)
           // ({cap} * (SELECT s FROM gs)) AS slice
  FROM {src}
), ry AS (
  SELECT slice,
         (row_number() OVER (PARTITION BY slice ORDER BY cy2, id) - 1)
           // {cap} AS leaf,
         xmin, ymin, xmax, ymax
  FROM rx
)
SELECT slice, leaf, CAST(count(*) AS BIGINT) AS n_rects,
       min(xmin) AS xmin, min(ymin) AS ymin,
       max(xmax) AS xmax, max(ymax) AS ymax
FROM ry GROUP BY slice, leaf
"""
