"""geodesic_pairs (operators/distance_join.py): known great-circle
distances, cell-straddle completeness, guard rails."""

import pytest
from pyspark.sql import Row

from osm_hadoop_spark.operators.distance_join import geodesic_pairs


def _pts(spark, rows):
    return spark.createDataFrame([Row(id=i, lon=lo, lat=la) for i, lo, la in rows])


def test_known_distances(spark):
    # 0.1 deg of latitude ~ 11.06 km; 1 deg ~ 110.6 km
    pts = _pts(spark, [(1, 10.0, 50.0), (2, 10.0, 50.1), (3, 10.0, 51.0)])
    out = {(r["id_a"], r["id_b"]): r["geo_mm"]
           for r in geodesic_pairs(pts, radius_m=50_000).collect()}
    assert set(out) == {(1, 2)}
    assert abs(out[(1, 2)] / 1e6 - 11.06) < 0.2  # km, sphere R=6371


def test_cell_straddle_found(spark):
    # neighbors on opposite sides of a 1-degree cell boundary
    pts = _pts(spark, [(1, 9.999, 49.999), (2, 10.001, 50.001)])
    out = geodesic_pairs(pts, radius_m=50_000).collect()
    assert len(out) == 1 and out[0]["id_a"] == 1


def test_longitude_shrink_at_high_lat(spark):
    # at lat 60, 1 deg of longitude ~ 55.7 km: still > 50 km radius, so
    # the 1-degree cell remains valid at the default max_abs_lat=60
    pts = _pts(spark, [(1, 10.0, 60.0), (2, 10.8, 60.0)])
    out = geodesic_pairs(pts, radius_m=50_000).collect()
    assert len(out) == 1  # 0.8 deg * 55.7 ~ 44.6 km


def test_guard_rails():
    import types

    with pytest.raises(ValueError):
        geodesic_pairs(types.SimpleNamespace(), radius_m=200_000, cell_deg=1.0)
    with pytest.raises(ValueError):
        geodesic_pairs(
            types.SimpleNamespace(), radius_m=50_000, cell_deg=1.0,
            max_abs_lat=80.0,
        )
