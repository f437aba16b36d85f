"""k-truss decomposition: the triangle-support analog of k-core.

Cohen 2008: the k-truss of a graph is the maximal subgraph in which
every edge participates in >= k-2 triangles — a stronger cohesion
filter than k-core (degree alone can be faked by stars; triangles
cannot), and the standard community-backbone extractor on social/road
graphs at scale.

Peeling loop (exact fixpoint, Matula-Beck style like operators/
routing.py::k_core): per round, compute each surviving edge's triangle
support and delete edges below k-2; repeat until no edge is deleted.
Every step is relational:
  - support(a, b) = |N(a) n N(b)| over the CURRENT edge set: one
    equi-join chain adj(a, c) x adj(b, c) on the shared neighbor key +
    a partial-agg count per edge — no enumeration of triangles as rows
    beyond the join's intermediates;
  - deletions are an anti-join; each round ends in a localCheckpoint
    (the engine's fixpoint lineage discipline) and the loop early-exits
    on an unchanged edge count.

Monotonicity makes the fixpoint well-defined: deleting an edge can only
lower other edges' supports, so the survivors of round r+1 are a subset
of round r and the result is order-free — which is exactly what the
unrolled-round DuckDB twin replays (the k_core oracle pattern).

100 TB posture: shuffle keys are node ids (adjacency) and edge pairs
(support agg); the known hazard is the common-neighbor join on hub
nodes (degree^2 intermediates) — standard mitigation is degree-ordered
orientation (count each triangle from its lowest-degree corner), left
as the documented next step; AQE skew-join splits hot nodes meanwhile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def _support(e: DataFrame) -> DataFrame:
    adj = e.select(F.col("a").alias("x"), F.col("b").alias("c")).unionByName(
        e.select(F.col("b").alias("x"), F.col("a").alias("c"))
    )
    t = e.select(F.col("a").alias("ea"), F.col("b").alias("eb"))
    j1 = t.join(adj.select(F.col("x").alias("ea"), "c"), "ea")
    j2 = j1.join(adj.select(F.col("x").alias("eb"), "c"), ["eb", "c"])
    return j2.groupBy(
        F.col("ea").alias("a"), F.col("eb").alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("support"))


def k_truss(
    edges: DataFrame, k: int, src: str = "u", dst: str = "v",
    max_rounds: int = 8,
) -> DataFrame:
    """Surviving edges of the k-truss with their final support:
    (a, b, support), a < b. Edges whose support never reaches k-2 are
    peeled; isolated survivors are impossible for k >= 3 (every
    survivor is in >= 1 triangle)."""
    need = k - 2
    e = _normalize(edges, src, dst).localCheckpoint(eager=True)
    n_prev = e.count()
    for _ in range(max_rounds):
        sup = _support(e)
        e = (
            sup.filter(F.col("support") >= need)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n = e.count()
        if n == n_prev:
            break
        n_prev = n
    return _support(e).filter(F.col("support") >= need)
