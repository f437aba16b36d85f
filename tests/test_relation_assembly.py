"""Relation assembly (J1'/J2' — second-level entity reconstruction).

Golden values derive from the reference fixture's relation
(db-snapshot.osm:44-49: members node 6 / way 1 / way 2), which the
reference itself drops at the dispatch (NodeJoiner.scala:110,136); the
north rule mandates assembling it.
"""

import pyspark.sql.functions as F

from osm_hadoop_spark.operators.relation_assembly import (
    assemble_relations,
    build_relations_geom,
    with_multilinestring_wkt,
)
from osm_hadoop_spark.sources import spans as S
from osm_hadoop_spark.sources.fixtures import DB_SNAPSHOT_EXPECTED_RELATION_WKT


def test_parse_relations(db_snapshot_docs):
    rels = S.parse_relations(db_snapshot_docs).collect()
    assert len(rels) == 1
    r = rels[0]
    assert r["rel_id"] == 1
    assert r["tags"] == {"type": "myrelation"}
    members = S.explode_relation_members(
        S.parse_relations(db_snapshot_docs)
    ).orderBy("ordinal").collect()
    assert [(m["member_type"], m["ref"], m["role"], m["ordinal"]) for m in members] == [
        ("node", 6, "noderole", 0),
        ("way", 1, "wayrole1", 1),
        ("way", 2, "wayrole2", 2),
    ]


def test_golden_relation_wkt(db_snapshot_docs):
    rels = with_multilinestring_wkt(build_relations_geom(db_snapshot_docs))
    rows = {r["rel_id"]: r for r in rels.collect()}
    assert set(rows) == set(DB_SNAPSHOT_EXPECTED_RELATION_WKT)
    r = rows[1]
    # node member filtered; way members in member-list order with roles kept
    assert r["n_members"] == 2
    assert r["member_ways"] == [1, 2]
    assert r["roles"] == ["wayrole1", "wayrole2"]
    assert r["geometry_wkt"] == DB_SNAPSHOT_EXPECTED_RELATION_WKT[1]


def test_member_dropped_with_unassembled_way(spark, db_snapshot_docs):
    """A way member that failed F5 (way 4: single coord) must vanish from the
    relation, mirroring WayBuilder.scala:95's silent drop one level up."""
    rels = S.parse_relations(db_snapshot_docs).select(
        "rel_id",
        "tags",
        F.expr(
            "array(named_struct('type','way','ref',CAST(4 AS BIGINT),'role','r0'),"
            "      named_struct('type','way','ref',CAST(3 AS BIGINT),'role','r1'))"
        ).alias("members"),
    )
    members = (
        S.explode_relation_members(rels)
        .filter(F.col("member_type") == "way")
        .select("rel_id", F.col("ref").alias("way_id"), "ordinal", "role")
    )
    from osm_hadoop_spark.operators.way_assembly import build_ways_geom

    out = assemble_relations(rels, members, build_ways_geom(db_snapshot_docs)).collect()
    assert len(out) == 1
    assert out[0]["member_ways"] == [3]
    assert out[0]["roles"] == ["r1"]


def test_synth_relations_member_counts(spark, synth_docs):
    """Cross-document reconstruction at corpus scale: every assembled
    relation's member list equals its parsed way refs that survived way
    assembly, in ordinal order."""
    from osm_hadoop_spark.operators.way_assembly import build_ways_geom

    ways_geom = build_ways_geom(synth_docs).cache()
    rels_geom = build_relations_geom(synth_docs, ways_geom=ways_geom)
    got = {
        r["rel_id"]: r["member_ways"]
        for r in rels_geom.collect()
    }
    assert len(got) == 2000 // 16  # every 16th doc carries one relation

    expected_pairs = (
        S.explode_relation_members(S.parse_relations(synth_docs))
        .filter(F.col("member_type") == "way")
        .join(ways_geom.select(F.col("way_id").alias("ref")), "ref", "inner")
        .orderBy("rel_id", "ordinal")
        .collect()
    )
    expected: dict[int, list[int]] = {}
    for m in expected_pairs:
        expected.setdefault(m["rel_id"], []).append(m["ref"])
    assert got == expected
    # geometry arrays line up member-for-member
    sample = rels_geom.orderBy("rel_id").limit(5).collect()
    for r in sample:
        assert len(r["xs"]) == r["n_members"] == len(r["roles"])
        assert all(len(x) == len(y) and len(x) > 1 for x, y in zip(r["xs"], r["ys"]))


def test_multilinestring_formatter():
    from osm_hadoop_spark.functions.geometry import format_multilinestring_wkt

    assert (
        format_multilinestring_wkt([[0.0, 1.5]], [[2.0, -3.25]])
        == "MULTILINESTRING ((0 2, 1.5 -3.25))"
    )
    assert (
        format_multilinestring_wkt([[1.0, 2.0], [3.0]], [[4.0, 5.0], [6.0]])
        == "MULTILINESTRING ((1 4, 2 5), (3 6))"
    )
