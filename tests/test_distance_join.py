"""Distance-band join (operators/distance_join.py) vs O(n^2) brute force."""

from __future__ import annotations

import pytest

from tests.test_clustering import _synth_points


@pytest.fixture(scope="module")
def band_points(spark):
    pts = _synth_points(400, 10, 70, 3)
    return spark.createDataFrame(pts, "id long, x long, y long").cache(), pts


def test_self_join_matches_brute(spark, band_points):
    from osm_hadoop_spark.operators.distance_join import distance_join

    df, pts = band_points
    r = 40
    got = {(p["id_a"], p["id_b"], p["dist2"]) for p in distance_join(df, None, r).collect()}
    want = {
        (a, b, (xa - xb) ** 2 + (ya - yb) ** 2)
        for (a, xa, ya) in pts
        for (b, xb, yb) in pts
        if a < b and (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r
    }
    assert got == want
    assert len(want) > 100  # fixture must be non-trivial


def test_two_table_join_matches_brute(spark, band_points):
    from osm_hadoop_spark.operators.distance_join import distance_join

    df, pts = band_points
    lhs = df.filter("id % 2 = 0")
    rhs = df.filter("id % 2 = 1")
    r = 55
    got = {
        (p["id_a"], p["id_b"], p["dist2"])
        for p in distance_join(lhs, rhs, r).collect()
    }
    want = {
        (a, b, (xa - xb) ** 2 + (ya - yb) ** 2)
        for (a, xa, ya) in pts
        if a % 2 == 0
        for (b, xb, yb) in pts
        if b % 2 == 1 and (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r
    }
    assert got == want


def test_plan_is_single_equi_join(spark, band_points):
    from osm_hadoop_spark.operators.distance_join import distance_join

    df, _ = band_points
    plan = (
        distance_join(df, None, 40)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
