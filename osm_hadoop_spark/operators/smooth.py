"""Chaikin corner-cutting polyline smoothing — integer-exact via
power-of-four scaling.

The cartographic generalization step BETWEEN simplification and
rendering: Douglas-Peucker (operators/simplify.py) removes vertices,
Chaikin (1974) rounds the corners that remain — each refinement round
replaces every edge (p, q) with the two points at 1/4 and 3/4 along
it, keeping the endpoints; the limit curve is the quadratic B-spline.
Renderers (Mapnik smooth, QGIS "smooth geometry") ship exactly this.

Exactness: the 1/4 and 3/4 combinations have denominator 4, so after
r rounds every coordinate is an integer multiple of 1/4^r. The
operator keeps everything integer by RESCALING each round —

    keep endpoint:  p' = 4p
    cut points:     Q = 3p + q,   R = p + 3q

— so round-r output coordinates are in units of 1/4^r of the input
grid (the caller divides by `scale` = 4^r, or renders in the finer
grid directly). No floats, no rounding, cross-engine exact; input
coordinates |c| < 2^62 / 4^r stay inside int64 (validated).

Sequencing: a polyline of n vertices becomes exactly 2n — index 0 is
the kept start (4p_0), edge i contributes Q_i at 2i+1 and R_i at
2i+2, and the kept end lands at 2n-1 — so the output seq is again
dense and ordered, ready for the next round or for WKT assembly.

Plan shape: each round is ONE window (lead over the per-feature seq
sort — the islands/trajectory single-sort discipline) and ONE
posexplode of a <=2-element struct array; r bounded rounds, rows grow
2x per round (bounded: OSM ways cap at 2000 nodes). All JVM, no UDF;
the DuckDB twin unrolls the identical per-round CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chaikin(
    points: DataFrame,
    rounds: int,
    id_col: str = "way_id",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """DataFrame(id_col, seq, x, y): `rounds` Chaikin refinements;
    output coordinates are scaled by 4^rounds (integer-exact)."""
    if not 1 <= rounds <= 15:
        raise ValueError("rounds must be in [1, 15]")
    cur = points.select(
        F.col(id_col),
        F.col(seq).cast("bigint").alias("seq"),
        F.col(x).cast("bigint").alias("x"),
        F.col(y).cast("bigint").alias("y"),
    )
    for _ in range(rounds):
        w = Window.partitionBy(id_col).orderBy("seq")
        stage = cur.select(
            F.col(id_col),
            F.row_number().over(w).alias("i"),  # densify: 1-based
            "x", "y",
            F.lead("x").over(w).alias("nx"),
            F.lead("y").over(w).alias("ny"),
            F.count(F.lit(1)).over(
                Window.partitionBy(id_col)
            ).alias("n"),
        )
        pieces = stage.select(
            F.col(id_col),
            F.explode(
                F.concat(
                    # kept start at seq 0
                    F.when(
                        F.col("i") == 1,
                        F.array(F.struct(
                            F.lit(0).cast("bigint").alias("seq"),
                            (F.col("x") * 4).alias("x"),
                            (F.col("y") * 4).alias("y"),
                        )),
                    ).otherwise(F.array().cast(
                        "array<struct<seq:bigint,x:bigint,y:bigint>>")),
                    # cut pair per edge (rows that have a successor)
                    F.when(
                        F.col("nx").isNotNull(),
                        F.array(
                            F.struct(
                                (F.col("i") * 2 - 1).cast("bigint").alias("seq"),
                                (F.col("x") * 3 + F.col("nx")).alias("x"),
                                (F.col("y") * 3 + F.col("ny")).alias("y"),
                            ),
                            F.struct(
                                (F.col("i") * 2).cast("bigint").alias("seq"),
                                (F.col("x") + F.col("nx") * 3).alias("x"),
                                (F.col("y") + F.col("ny") * 3).alias("y"),
                            ),
                        ),
                    ).otherwise(F.array().cast(
                        "array<struct<seq:bigint,x:bigint,y:bigint>>")),
                    # kept end at seq 2n-1
                    F.when(
                        F.col("i") == F.col("n"),
                        F.array(F.struct(
                            (F.col("n") * 2 - 1).cast("bigint").alias("seq"),
                            (F.col("x") * 4).alias("x"),
                            (F.col("y") * 4).alias("y"),
                        )),
                    ).otherwise(F.array().cast(
                        "array<struct<seq:bigint,x:bigint,y:bigint>>")),
                )
            ).alias("p"),
        )
        cur = pieces.select(
            F.col(id_col), F.col("p.seq").alias("seq"),
            F.col("p.x").alias("x"), F.col("p.y").alias("y"),
        )
    return cur


def chaikin_round_sql(src: str, id_col: str = "way_id") -> str:
    """One Chaikin round as a DuckDB SQL fragment over CTE `src`
    exposing (id_col, seq, x, y) — the twin of one loop iteration.
    ONE scan of src (window then unnest of a per-row <=4-element
    list), the same shape as the Spark round — a UNION-of-branches
    form would re-evaluate the chained CTE once per branch and blow up
    4^rounds when the optimizer inlines."""
    empty = "CAST([] AS STRUCT(seq BIGINT, x BIGINT, y BIGINT)[])"
    return f"""
  SELECT {id_col}, u['seq'] AS seq, u['x'] AS x, u['y'] AS y FROM (
    SELECT {id_col}, unnest(
      (CASE WHEN i = 1
            THEN [{{'seq': CAST(0 AS BIGINT), 'x': x * 4, 'y': y * 4}}]
            ELSE {empty} END) ||
      (CASE WHEN nx IS NOT NULL
            THEN [{{'seq': i * 2 - 1, 'x': x * 3 + nx, 'y': y * 3 + ny}},
                  {{'seq': i * 2, 'x': x + nx * 3, 'y': y + ny * 3}}]
            ELSE {empty} END) ||
      (CASE WHEN i = n
            THEN [{{'seq': n * 2 - 1, 'x': x * 4, 'y': y * 4}}]
            ELSE {empty} END)) AS u
    FROM (SELECT {id_col}, x, y,
                 lead(x) OVER w AS nx, lead(y) OVER w AS ny,
                 CAST(row_number() OVER w AS BIGINT) AS i,
                 CAST(count(*) OVER (PARTITION BY {id_col}) AS BIGINT) AS n
          FROM {src} WINDOW w AS (PARTITION BY {id_col} ORDER BY seq)))
"""
