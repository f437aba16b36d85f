"""Strongly connected components via reachability closure + mutual min.

Directed-graph SCCs — the missing sibling of operators/cc.py (undirected
large-star/small-star): u and v share a component iff u reaches v AND v
reaches u, and the canonical component id is the minimum node id in the
mutual-reach set.

The engine computes directed reachability with the SAME transitive-
closure-by-doubling kernel as hierarchy.py::ancestor_closure (round k
holds every (u, a) pair with a directed path of length <= 2^k, so
diameter D closes in ceil(log2 D) self-joins; cycles just produce the
harmless (u, u) rows), then one self-join of the closure against its
transpose yields mutual pairs and a hash aggregate takes the min.
Nodes with no mutual partner are their own singleton component.

This is the right strategy in the bounded-reach regime (planted
communities, near-DAG condensations — reach sets O(polylog)): all joins
are equi-joins on node ids and the closure is sum(|reach(u)|) slim
pairs. The documented 100 TB hazard is a DENSE reachability structure
(one giant cycle or a hub condensation) where the closure itself goes
quadratic — the general-case fallback is FW-BW coloring (iterate: min
forward-label, min backward-label, settle nodes where they agree,
remove, repeat), which keeps O(N) state per round at the price of
data-dependent round counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.hierarchy import ancestor_closure


def strongly_connected_components(
    edges: DataFrame, src: str = "s", dst: str = "d", max_rounds: int = 20,
) -> DataFrame:
    """(node, scc_id) over every node appearing in edges; scc_id is the
    minimum node id of the node's strongly connected component."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    reach = ancestor_closure(e, src="s", parent="d", max_rounds=max_rounds)
    mutual = (
        reach.alias("f")
        .join(
            reach.alias("b"),
            (F.col("f.u") == F.col("b.a")) & (F.col("f.a") == F.col("b.u")),
        )
        .select(F.col("f.u").alias("u"), F.col("f.a").alias("v"))
    )
    best = mutual.groupBy("u").agg(F.min("v").alias("mv"))
    nodes = (
        e.select(F.col("s").alias("u"))
        .unionByName(e.select(F.col("d").alias("u")))
        .distinct()
    )
    return nodes.join(best, "u", "left").select(
        F.col("u").alias("node"),
        F.least(F.col("u"), F.coalesce(F.col("mv"), F.col("u"))).alias("scc_id"),
    )
