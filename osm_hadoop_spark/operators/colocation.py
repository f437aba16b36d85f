"""Co-location pattern mining: participation counts per class pair.

Shekhar-style spatial co-location: for classes (p, q), the participation
ratio of p toward q is |{a in p : some b in q within radius}| / |p| —
the standard interestingness measure for "gas stations co-locate with
highways" questions, reported here as the exact integer pair
(n_participating, n_total) per ORDERED class pair (the participation
index PI = min over the two directions is a trivial post-division).

Plan: the candidate pairs come from the SAME grid-blocked distance-band
equi-join as distance_pairs_r40 (operators/distance_join.py — 3x3
neighbor-cell probe, no all-pairs product anywhere), classes join back
on point id, every surviving pair then votes (class_a, class_b, id_a)
and (class_b, class_a, id_b), and a distinct + hash aggregate per
ordered class pair counts participants. Class totals are a tiny
dimension joined broadcast. Same-class rows (p, p) are kept — they read
as plain spatial clustering of one class.

100 TB posture: identical to the distance join it reuses — shuffle on
grid cells with the 9x bounded probe amplification; the class-vote and
participant-distinct stages shuffle slim (class, class, id) triples.
Dense-cell skew is the distance join's documented hazard and carries
over unchanged (cap or AQE-split hot cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.distance_join import distance_join


def colocation_participation(
    points: DataFrame, radius: int,
    id_col: str = "id", x: str = "x", y: str = "y", cls: str = "cls",
) -> DataFrame:
    """(cls, other_cls, n_participating, n_total) for every ordered class
    pair with at least one participating point."""
    pairs = distance_join(points, None, radius, id_col=id_col, x=x, y=y)
    classes = points.select(
        F.col(id_col).alias("id"), F.col(cls).alias("c")
    )
    tagged = (
        pairs.join(classes.select(F.col("id").alias("id_a"),
                                  F.col("c").alias("ca")), "id_a")
        .join(classes.select(F.col("id").alias("id_b"),
                             F.col("c").alias("cb")), "id_b")
    )
    votes = tagged.select(
        F.col("ca").alias("cls"), F.col("cb").alias("other_cls"),
        F.col("id_a").alias("pid"),
    ).unionByName(
        tagged.select(
            F.col("cb").alias("cls"), F.col("ca").alias("other_cls"),
            F.col("id_b").alias("pid"),
        )
    )
    part = votes.distinct().groupBy("cls", "other_cls").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_participating")
    )
    totals = classes.groupBy(F.col("c").alias("cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    return part.join(F.broadcast(totals), "cls").select(
        "cls", "other_cls", "n_participating", "n_total"
    )
