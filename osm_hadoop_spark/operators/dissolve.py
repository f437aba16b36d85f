"""Polygon dissolve: merge polygons that share a boundary edge.

The classic GIS "dissolve" (merge adjacent parcels/admin units into
regions) re-expressed as relational algebra — the missing inverse of the
engine's polygon SPLIT operators (multipolygon assembly, scanline fill).
Two polygons belong to one region iff they are connected through shared
edges; a shared edge is an exact undirected vertex-pair match, so
adjacency detection is one hash aggregate on a canonical edge key — no
geometry predicate, no tolerance, bit-exact in any engine.

Pipeline (all JVM until the iterative labeling):
  1. explode each ring into edges (i -> i+1 mod n), canonicalized
     lo = least(pack(a), pack(b)), hi = greatest(...) — packing keeps the
     shuffle key one int64 pair;
  2. groupBy (lo, hi): edge multiplicity + the minimum incident polygon
     (the star root) + the incident-polygon set (bounded: an edge is
     shared by at most the polygons that contain it — 2 for planar data);
  3. star edges (root, poly) feed connected_components
     (operators/cc.py, large/small-star) -> region = min polygon id;
  4. boundary edges: multiplicity-1 edges attributed to their single
     polygon — after dissolve these are exactly the OUTER boundary of
     each region (interior edges cancel pairwise), so the per-region
     boundary length falls out of the same aggregate.

100 TB posture: edge keys are computable (no dictionary), the adjacency
aggregate is partial-aggregatable, collect_set is bounded by per-edge
incidence (2 for valid planar coverage), and the CC iteration runs on
the (much smaller) star-edge relation. Same discipline as the dedup
pipeline tail (pairs -> components, operators/cc.py module doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.cc import connected_components

# vertex packing: coords must be non-negative and < 2^31
_VPACK = 1 << 31


def _edges(polys: DataFrame, poly_id: str, xs: str, ys: str) -> DataFrame:
    """(poly, lo, hi) — one row per ring edge, canonical undirected key."""
    pack = (
        f"transform(sequence(0, size({xs}) - 1), "
        f"i -> {xs}[i] * {_VPACK}L + {ys}[i])"
    )
    edge = (
        f"transform(sequence(0, size({xs}) - 1), "
        f"i -> struct("
        f"least(_v[i], _v[(i + 1) % size({xs})]) AS lo, "
        f"greatest(_v[i], _v[(i + 1) % size({xs})]) AS hi))"
    )
    return (
        polys.withColumn("_v", F.expr(pack))
        .select(F.col(poly_id).alias("poly"), F.explode(F.expr(edge)).alias("e"))
        .select("poly", F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"))
    )


def dissolve(
    polys: DataFrame,
    poly_id: str = "poly_id",
    xs: str = "xs",
    ys: str = "ys",
) -> DataFrame:
    """Label every polygon with its dissolved-region id.

    `xs`/`ys` are ring vertex arrays (closed implicitly: last -> first;
    non-negative integer coords). Returns DataFrame(poly_id, region_id,
    boundary_edges): region_id = min polygon id of the edge-connected
    region; boundary_edges = this polygon's count of unshared edges
    (sum over a region = the region's outer boundary length in edges).
    """
    e = _edges(polys, poly_id, xs, ys)
    adj = e.groupBy("lo", "hi").agg(
        F.min("poly").alias("root"),
        F.collect_set("poly").alias("polys"),
        F.count(F.lit(1)).alias("mult"),
    )
    star = (
        adj.filter(F.size("polys") > 1)
        .select("root", F.explode("polys").alias("poly"))
        .filter(F.col("poly") != F.col("root"))
    )
    cc = connected_components(star, "root", "poly")

    ids = polys.select(F.col(poly_id).alias("poly")).distinct()
    labels = cc.select(F.col("node").alias("poly"), F.col("component")).unionByName(
        ids.join(cc, ids.poly == cc.node, "left_anti").select(
            "poly", F.col("poly").alias("component")
        )
    )
    boundary = (
        adj.filter(F.col("mult") == 1)
        .select(F.explode("polys").alias("poly"))
        .groupBy("poly")
        .agg(F.count(F.lit(1)).alias("boundary_edges"))
    )
    return (
        labels.join(boundary, "poly", "left")
        .select(
            F.col("poly").alias(poly_id),
            F.col("component").alias("region_id"),
            F.coalesce("boundary_edges", F.lit(0)).alias("boundary_edges"),
        )
    )
