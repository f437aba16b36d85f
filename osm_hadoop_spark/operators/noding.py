"""Way noding: split ways into routing edges at junction nodes.

The graph-extraction step every OSM router runs (osm2pgrouting /
osrm-extract): a way is a polyline that may pass THROUGH junctions; a
routing edge must end at every node shared with another way (or reused
within the same way).  The reference stops at whole-way geometries
(`WayBuilder.scala` — SURVEY J2); this operator produces the edge
decomposition its routing family (R1/R3b BFS/SSSP, operators/routing.py)
would consume from a real planet.

Semantics (pinned):
  * junction = node_id whose TOTAL usage count in the way_nodes
    relation is >= 2 (shared across ways, or repeated inside one way);
  * every way's first and last vertex is an edge boundary too;
  * edge j of a way = the maximal run of consecutive segments between
    boundary vertices; single-vertex ways yield no edges (F5 analog).

Plan: ONE hash agg for node usage + ONE equi-join to flag junctions +
ONE per-way sort window (lead + running boundary count share the sort)
+ the final per-edge agg.  Everything JVM-side; per-way state is the
way's own vertex list, never the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def node_ways(way_nodes: DataFrame) -> DataFrame:
    """Split ways into edges at junctions.

    Input: DataFrame(way_id, ordinal, node_id) — ordinal orders the
    way's vertices; ties (duplicate ordinals) are broken by node_id so
    the vertex sequence is a total order in every engine.  Returns DataFrame(way_id, edge_idx, from_node,
    to_node, n_segments) with edge_idx dense from 0 per way.
    """
    usage = way_nodes.groupBy("node_id").agg(
        F.count(F.lit(1)).alias("n_use")
    )
    flagged = way_nodes.join(usage, "node_id").select(
        "way_id", "ordinal", "node_id", (F.col("n_use") >= 2).alias("shared")
    )

    w = Window.partitionBy("way_id").orderBy("ordinal", "node_id")
    rows = flagged.select(
        "way_id", "ordinal", "node_id",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(
            Window.partitionBy("way_id").orderBy("ordinal", "node_id").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
        F.lead("node_id").over(w).alias("next_node"),
        "shared",
    )
    boundary = (F.col("pos") == 1) | (F.col("pos") == F.col("n")) | F.col("shared")
    segs = rows.select(
        "way_id", "pos", "node_id", "next_node",
        F.sum(boundary.cast("int")).over(
            Window.partitionBy("way_id").orderBy("ordinal", "node_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ).alias("cum_b"),
    ).filter(F.col("next_node").isNotNull())

    return (
        segs.groupBy("way_id", (F.col("cum_b") - 1).alias("edge_idx"))
        .agg(
            F.min(F.struct("pos", "node_id"))["node_id"].alias("from_node"),
            F.max(F.struct("pos", "next_node"))["next_node"].alias("to_node"),
            F.count(F.lit(1)).alias("n_segments"),
        )
    )
