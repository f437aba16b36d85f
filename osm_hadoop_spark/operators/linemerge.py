"""Polyline chain merging at degree-2 junctions (JTS LineMerger parity).

The reference assembles per-way geometries (WayAssembler,
osm/WayLoader.scala) but OSM fragments long roads into many ways at
arbitrary points; every renderer/router pipeline then re-merges touching
ways into maximal chains wherever EXACTLY two way endpoints meet (the
LineMerger / osm2pgsql way-joining step). A node shared by 1 or 3+ ways
is a true junction and terminates chains.

Decomposition into engine primitives:
  1. endpoint incidence list (way_id, node) — one explode;
  2. node degree = one hash aggregate; keep degree == 2;
  3. mergeable pairs = incidence self-join on those nodes (a way whose
     two ends meet themselves — a closed loop — pairs with nothing,
     handled by the way_a < way_b guard);
  4. chains = connected_components(pairs) — the SAME large/small-star
     labeling the dedup/dissolve family uses (operators/cc.py), so
     convergence is O(log chain length) rounds; chain graphs are paths
     and cycles, so components stay small by construction even when the
     global way graph is huge — no giant-component risk at 100 TB;
  5. singleton ways (no mergeable end) keep their own id as chain id.

Returns one row per chain: (chain_id = min way_id, n_ways, total_len).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.cc import connected_components


def merge_chains(
    ways: DataFrame,
    way_id: str = "way_id",
    node_a: str = "na",
    node_b: str = "nb",
    length: str = "len",
) -> DataFrame:
    """ways: (way_id, na, nb, len) — endpoint node ids + a length
    measure. Returns (chain_id, n_ways, total_len)."""
    w = ways.select(
        F.col(way_id).alias("w"),
        F.col(node_a).alias("na"),
        F.col(node_b).alias("nb"),
        F.col(length).cast("long").alias("len"),
    )
    inc = w.select("w", F.explode(F.array("na", "nb")).alias("node"))
    deg2 = (
        inc.groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") == 2)
        .select("node")
    )
    i2 = inc.join(deg2, "node", "left_semi")
    pairs = (
        i2.select("node", F.col("w").alias("wa"))
        .join(i2.select("node", F.col("w").alias("wb")), "node")
        .filter(F.col("wa") < F.col("wb"))
        .select("wa", "wb")
    )
    comp = connected_components(pairs, src="wa", dst="wb")
    labeled = w.join(
        comp.select(F.col("node").alias("w"), "component"), "w", "left"
    ).select(
        F.coalesce("component", "w").alias("chain_id"), "len"
    )
    return labeled.groupBy("chain_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ways"),
        F.sum("len").cast("long").alias("total_len"),
    )
