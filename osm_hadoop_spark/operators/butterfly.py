"""Bipartite butterfly counting: the 4-cycle census of two-mode graphs.

Butterflies (2x2 bicliques) are the bipartite analog of triangles — the
motif behind bipartite clustering coefficients, spam/bot detection in
user-item graphs, and k-bitruss peeling. Over a (left, right) edge set,
#butterflies = sum over left-pairs of C(codeg(u,v), 2), where codeg is
the number of shared right-neighbors.

The standard exact algorithm (Wang et al. VLDB'19 "Vertex Priority
Based Butterfly Counting") enumerates wedges from the LOWER-DEGREE
side: per right vertex, emit its left pairs (the wedge list), count
pairs per (u, v), then fold C(w, 2). Everything is relational: one
self-join per right key bounded by the right-degree, one pair-count
hash aggregate, one global sum.

100 TB posture: the wedge list is sum over right vertices of C(deg, 2)
rows — quadratic ONLY in per-vertex degree, so the hazard is a hub
right-vertex; `right_cap` drops right vertices above a degree cap
(documented, the basket_cap/bucket_cap discipline — an everything-hub
carries no biclique signal, it matches every pair). All shuffles key on
vertex ids / id pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def butterfly_census(
    edges: DataFrame, left: str = "u", right: str = "p",
    right_cap: int | None = None,
) -> DataFrame:
    """One row: (n_butterflies, n_wedges, n_pairs) — exact int64.
    n_wedges = total left-pair slots through shared right vertices
    (sum of codegrees), n_pairs = distinct left pairs sharing >= 1
    right vertex, n_butterflies = sum C(codeg, 2)."""
    e = edges.select(
        F.col(left).alias("u"), F.col(right).alias("r")
    ).distinct()
    if right_cap is not None:
        deg = e.groupBy("r").agg(F.count(F.lit(1)).alias("_d"))
        e = e.join(
            deg.filter(F.col("_d") <= right_cap).select("r"), "r", "semi"
        )
    wedges = (
        e.alias("a")
        .join(e.alias("b"), "r")
        .filter(F.col("a.u") < F.col("b.u"))
        .select(F.col("a.u").alias("u1"), F.col("b.u").alias("u2"))
    )
    codeg = wedges.groupBy("u1", "u2").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    return codeg.agg(
        F.expr("CAST(sum((w * (w - 1)) DIV 2) AS BIGINT)")
        .alias("n_butterflies"),
        F.sum("w").cast("bigint").alias("n_wedges"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
