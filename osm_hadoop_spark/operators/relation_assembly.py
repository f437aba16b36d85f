"""Relation assembly: the second level of OSM entity reconstruction.

North-star addition. The reference reconstructs only ways from nodes
(NodeJoiner.scala:110,136 dispatches Way/Node; relations in its own fixture,
db-snapshot.osm:44-49, are dropped), but the north rule mandates
"way/relation assembly expressed as a bounded groupBy-shuffle on entity
refs". This operator applies the exact J1/J2 pattern one level up:

  J1': relation member refs (rel_id, way_id, ordinal, role) equi-join the
       assembled way geometries on way_id — Catalyst picks sort-merge or
       shuffled-hash; AQE splits a skewed way referenced by many relations.
  J2': group by rel_id, member-ordinal sort via
       `array_sort(collect_list(struct))`, then a join back to the relation
       tag table. The groupBy shuffle is bounded the same way J2's is: OSM
       caps relation member lists (~32k hard cap, typically tens), so the
       collected array per key stays small.

Geometry stays columnar (xs/ys as array<array<double>>); MULTILINESTRING WKT
is an edge concern, matching the way-level convention
(WayBuilder.scala:97-101 serializes WKT only at the output boundary).

Scale posture: two shuffles total (member-ref join + rel_id groupBy), both
keyed; no Python in the plan until the optional WKT edge UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assemble_relations(
    relations: DataFrame, members: DataFrame, ways_geom: DataFrame
) -> DataFrame:
    """J1'+J2': members(rel_id, way_id, ordinal, role) ⋈ ways_geom(way_id,
    xs, ys) -> per-relation ordered member geometry.

    Output: (rel_id, tags, member_ways, roles, xs: array<array<double>>,
    ys: array<array<double>>, n_members). Members whose way did not assemble
    (dropped by F5 or simply absent) vanish via the inner join — the
    relation-level analog of WayBuilder.scala:95's silent coordinate drop;
    relations left with zero surviving members disappear entirely.

    The sort struct leads with `ordinal` (unique per relation: posexplode
    position), so the comparison never descends into the coordinate arrays.
    """
    j = members.join(ways_geom.select("way_id", "xs", "ys"), "way_id", "inner")
    g = (
        j.groupBy("rel_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ordinal", "way_id", "role", "xs", "ys"))
            ).alias("ms")
        )
    )
    return g.join(relations.select("rel_id", "tags"), "rel_id", "inner").select(
        "rel_id",
        "tags",
        F.transform("ms", lambda m: m["way_id"]).alias("member_ways"),
        F.transform("ms", lambda m: m["role"]).alias("roles"),
        F.transform("ms", lambda m: m["xs"]).alias("xs"),
        F.transform("ms", lambda m: m["ys"]).alias("ys"),
        F.size("ms").alias("n_members"),
    )


@F.pandas_udf(T.StringType())
def _multilinestring_wkt_udf(xs, ys):
    import pandas as pd

    from osm_hadoop_spark.functions.geometry import format_multilinestring_wkt

    return pd.Series(
        [format_multilinestring_wkt(x, y) for x, y in zip(xs, ys)],
        dtype="object",
    )


def with_multilinestring_wkt(
    rels_geom: DataFrame, col_name: str = "geometry_wkt", impl: str = "jvm"
) -> DataFrame:
    """Attach JTS-layout MULTILINESTRING WKT. Edge/output concern only —
    internal kernels keep the nested columnar representation. impl='jvm'
    (default) renders in whole-stage codegen, byte-identical to the Python
    formatter (see way_assembly.with_wkt); impl='arrow' keeps the
    pandas-UDF reference path."""
    if impl == "jvm":
        from osm_hadoop_spark.functions.geometry_sql import sql_multilinestring_wkt

        return rels_geom.withColumn(
            col_name, sql_multilinestring_wkt(F.col("xs"), F.col("ys"))
        )
    if impl != "arrow":
        raise ValueError(f"unknown impl {impl!r} (use 'jvm' or 'arrow')")
    return rels_geom.withColumn(col_name, _multilinestring_wkt_udf("xs", "ys"))


def build_relations_geom(
    documents: DataFrame, ways_geom: DataFrame | None = None
) -> DataFrame:
    """documents -> assembled relations, end to end over the spans path.

    Way members only (member_type == 'way'): node and relation members pass
    through the dispatch unharmed, exactly as ways pass through J1
    (NodeJoiner.scala:170-174). Nested relations would need an iterative
    resolve (relation -> relation members); OSM nesting depth is tiny and
    the fixture has none, so one level is the supported contract — documented
    rather than silently wrong.

    `ways_geom` lets callers reuse an already-assembled (cached /
    checkpointed) way table instead of re-running the J1/J2 spine; when
    omitted the full untag-filtered assembly is built from the same scan.
    """
    from osm_hadoop_spark.operators.way_assembly import build_ways_geom
    from osm_hadoop_spark.sources import spans as S

    rels = S.parse_relations(documents)
    members = (
        S.explode_relation_members(rels)
        .filter(F.col("member_type") == "way")
        .select("rel_id", F.col("ref").alias("way_id"), "ordinal", "role")
    )
    if ways_geom is None:
        ways_geom = build_ways_geom(documents)
    return assemble_relations(rels, members, ways_geom)
