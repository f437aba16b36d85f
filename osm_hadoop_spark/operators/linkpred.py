"""Link prediction by common-neighbor counting (Liben-Nowell & Kleinberg).

The classic graph-completion primitive: for every NON-adjacent pair
(a, b) at distance 2, count their common neighbors and carry both
degrees, so cn / (deg_a + deg_b - cn) is the exact Jaccard score and
cn alone is the CN score — integer sufficient statistics, the repo's
standard exact-twin form (the float score is an edge-side division).

Shape: pairs are generated THROUGH the shared neighbor (one self-join
of the symmetric adjacency on the center node), never all-pairs —
candidate volume is sum_w deg(w)^2, the graph analogue of the dedup
family's bucket joins. On skewed graphs that sum is dominated by hubs,
and hub-mediated common neighbors are also the least informative
(every pair of a celebrity's followers shares them), so the standard
mitigation is built in: `max_center_degree` drops pairing through
centers above a degree cap, bounding per-center work exactly like the
LSH family's bucket_cap.

The symmetric adjacency feeds four consumers (both self-join branches,
the adjacency anti-join, the degree aggregate) — eagerly
localCheckpoint'ed so Catalyst doesn't re-derive it per consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def common_neighbor_scores(
    edges: DataFrame,
    u: str = "u",
    v: str = "v",
    max_center_degree: int | None = None,
) -> DataFrame:
    """Score all distance-2 non-adjacent pairs of the undirected graph.

    `edges` may be directed / duplicated; it is symmetrized and
    dedup'ed first, self-loops dropped. Returns one row per unordered
    candidate pair: (a, b, cn, deg_a, deg_b) with a < b, cn >= 1.
    """
    e = edges.filter(F.col(u) != F.col(v)).select(u, v)
    sym = (
        e.unionByName(e.select(F.col(v).alias(u), F.col(u).alias(v)))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy(u).agg(F.count(F.lit(1)).alias("d"))
    half = sym.select(F.col(v).alias("w"), F.col(u).alias("a"))
    if max_center_degree is not None:
        ok = deg.filter(F.col("d") <= max_center_degree).select(
            F.col(u).alias("w")
        )
        half = half.join(ok, "w", "semi")
    cand = (
        half.join(half.select("w", F.col("a").alias("b")), "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    adj = sym.filter(F.col(u) < F.col(v)).select(
        F.col(u).alias("a"), F.col(v).alias("b")
    )
    return (
        cand.join(adj, ["a", "b"], "left_anti")
        .join(deg.select(F.col(u).alias("a"), F.col("d").alias("deg_a")), "a")
        .join(deg.select(F.col(u).alias("b"), F.col("d").alias("deg_b")), "b")
        .select("a", "b", "cn", "deg_a", "deg_b")
    )
