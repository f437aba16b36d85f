"""Visvalingam-Whyatt polyline simplification — bounded parallel rounds
of strict-local-minimum effective-area removal, integer-exact.

Visvalingam-Whyatt (1993) is the OTHER classic generalization next to
Douglas-Peucker (operators/simplify.py): instead of perpendicular
distance to a span, each interior vertex is scored by the area of the
triangle it forms with its two surviving neighbors ("effective area"),
and low-area vertices are removed until every survivor's area clears a
threshold.  Mapshaper's default simplifier is exactly this rule; the
reference ships full-resolution ways to its renderers
(/root/reference/src/main/scala/io/github/willtemperley/osmhadoop/shp/
ExtractShp.scala:19-52) which then simplify client-side — at planet
scale the engine does it once, server-side, per zoom.

Sequential VW pops the single global-minimum vertex per step — a chain
of 10^12 data-dependent steps has no distributed form.  This operator
uses the standard parallel relaxation (same family as the engine's
Jones-Plassmann coloring and hash-priority MIS): per ROUND, every
interior vertex whose doubled effective area

    a2 = |(x_prev - x) * (y_next - y) - (x_next - x) * (y_prev - y)|

is below the threshold t2 AND is a STRICT minimum against both
surviving neighbors under the total order (a2, seq) is removed
simultaneously; endpoints are never removed and compare as +infinity.
Strictness under a total order means two ADJACENT vertices can never
both win a round (the comparison is antisymmetric), so each round is
geometrically consistent — no triangle is evaluated against a vertex
that vanishes in the same round.  `rounds` is a fixed operator
parameter (bounded-round discipline, like mis_greedy_h60): both the
engine and the SQL twin run exactly `rounds` relaxations, so the
output is deterministic and value-exact cross-engine.  All arithmetic
is int64 on the integer node grid — no floats anywhere.

Plan shape: each round is TWO window passes over the SAME
(partition, order) spec — the first computes a2 from lag/lead of the
coordinates, the second distributes each vertex's a2 to its neighbors
via lag/lead again — so Spark sorts once per round and reuses the sort
for the second pass (no extra shuffle: the partitioning is already
satisfied after round 1's exchange).  Rows only shrink.  All JVM
expressions, no UDF; the DuckDB twin (`vw_round_sql`) nests the
identical per-round fragment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _beats(a2, seq, oa2, oseq):
    """(a2, seq) strictly below the neighbor's tuple; a NULL neighbor
    area is an endpoint = +infinity (always beaten)."""
    return (
        oa2.isNull()
        | (a2 < oa2)
        | ((a2 == oa2) & (seq < oseq))
    )


def vw_threshold(
    points: DataFrame,
    t2: int,
    rounds: int,
    id_col: str = "way_id",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """DataFrame(id_col, seq, x, y): `rounds` parallel VW relaxations
    removing strict-local-minimum interior vertices with doubled
    effective area < t2.  Output keeps the ORIGINAL seq values of the
    survivors (still dense-ordered per feature, just with gaps)."""
    if not 1 <= rounds <= 30:
        raise ValueError("rounds must be in [1, 30]")
    if t2 <= 0:
        raise ValueError("t2 must be positive")
    cur = points.select(
        F.col(id_col),
        F.col(seq).cast("bigint").alias("seq"),
        F.col(x).cast("bigint").alias("x"),
        F.col(y).cast("bigint").alias("y"),
    )
    w = Window.partitionBy(id_col).orderBy("seq")
    for _ in range(rounds):
        px, py = F.lag("x").over(w), F.lag("y").over(w)
        nx, ny = F.lead("x").over(w), F.lead("y").over(w)
        a = cur.withColumn(
            "a2",
            F.when(
                px.isNotNull() & nx.isNotNull(),
                F.abs(
                    (px - F.col("x")) * (ny - F.col("y"))
                    - (nx - F.col("x")) * (py - F.col("y"))
                ),
            ),
        )
        b = a.select(
            F.col(id_col), "seq", "x", "y", "a2",
            F.lag("a2").over(w).alias("pa2"),
            F.lag("seq").over(w).alias("pseq"),
            F.lead("a2").over(w).alias("na2"),
            F.lead("seq").over(w).alias("nseq"),
        )
        a2, sq = F.col("a2"), F.col("seq")
        rm = (
            a2.isNotNull()
            & (a2 < F.lit(int(t2)))
            & _beats(a2, sq, F.col("pa2"), F.col("pseq"))
            & _beats(a2, sq, F.col("na2"), F.col("nseq"))
        )
        cur = b.filter(~rm).select(id_col, "seq", "x", "y")
    return cur


def vw_round_sql(src: str, t2: int, id_col: str = "way_id") -> str:
    """One VW relaxation round as a DuckDB fragment over CTE `src`
    exposing (id_col, seq, x, y) — the exact twin of one loop
    iteration above."""
    return f"""
  SELECT {id_col}, seq, x, y FROM (
    SELECT {id_col}, seq, x, y, a2,
           lag(a2) OVER w AS pa2, lag(seq) OVER w AS pseq,
           lead(a2) OVER w AS na2, lead(seq) OVER w AS nseq
    FROM (
      SELECT {id_col}, seq, x, y,
             CASE WHEN px IS NOT NULL AND nx IS NOT NULL
                  THEN abs((px - x) * (ny - y) - (nx - x) * (py - y))
             END AS a2
      FROM (SELECT {id_col}, seq, x, y,
                   lag(x) OVER w AS px, lag(y) OVER w AS py,
                   lead(x) OVER w AS nx, lead(y) OVER w AS ny
            FROM {src}
            WINDOW w AS (PARTITION BY {id_col} ORDER BY seq))
      WINDOW w AS (PARTITION BY {id_col} ORDER BY seq)
    ) WINDOW w AS (PARTITION BY {id_col} ORDER BY seq)
  )
  WHERE NOT (a2 IS NOT NULL AND a2 < {int(t2)}
             AND (pa2 IS NULL OR a2 < pa2 OR (a2 = pa2 AND seq < pseq))
             AND (na2 IS NULL OR a2 < na2 OR (a2 = na2 AND seq < nseq)))
"""
