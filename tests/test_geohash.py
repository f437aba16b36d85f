"""Geohash: reference vectors, encode/decode round-trip, prefix
hierarchy, and Spark-column == driver-side-decode consistency."""

import numpy as np
from pyspark.sql import functions as F

from osm_hadoop_spark.functions.geohash import BASE32, decode_bounds, geohash_col


def _encode_py(lon, lat, precision):
    """Independent scalar reference: textbook interval bisection."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits, out, even = 0, [], True
    val = 0
    while len(out) < precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                val = (val << 1) | 1
                lo_lon = mid
            else:
                val <<= 1
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                val = (val << 1) | 1
                lo_lat = mid
            else:
                val <<= 1
                hi_lat = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(BASE32[val])
            bits, val = 0, 0
    return "".join(out)


def _spark_hash(spark, pts, precision):
    df = spark.createDataFrame(pts, "id bigint, lon double, lat double")
    rows = df.select(
        "id", geohash_col(F.col("lon"), F.col("lat"), precision).alias("gh")
    ).collect()
    return {r["id"]: r["gh"] for r in rows}


def test_wikipedia_reference_vector(spark):
    got = _spark_hash(spark, [(0, -5.603027, 42.60498)], 5)
    assert got[0] == "ezs42"


def test_matches_bisection_reference(spark):
    rng = np.random.default_rng(4)
    pts = [
        (i, float(rng.uniform(-180, 180)), float(rng.uniform(-90, 90)))
        for i in range(200)
    ]
    got = _spark_hash(spark, pts, 7)
    for i, lon, lat in pts:
        assert got[i] == _encode_py(lon, lat, 7), (i, lon, lat)


def test_decode_roundtrip_and_prefix_hierarchy(spark):
    rng = np.random.default_rng(8)
    pts = [
        (i, float(rng.uniform(-180, 180)), float(rng.uniform(-90, 90)))
        for i in range(50)
    ]
    got = _spark_hash(spark, pts, 8)
    for i, lon, lat in pts:
        gh = got[i]
        lon_lo, lat_lo, lon_hi, lat_hi = decode_bounds(gh)
        assert lon_lo <= lon < lon_hi and lat_lo <= lat < lat_hi
        # prefix cell contains the full-precision cell
        p_lon_lo, p_lat_lo, p_lon_hi, p_lat_hi = decode_bounds(gh[:4])
        assert p_lon_lo <= lon_lo and lon_hi <= p_lon_hi
        assert p_lat_lo <= lat_lo and lat_hi <= p_lat_hi


def test_boundary_clamp(spark):
    got = _spark_hash(
        spark, [(0, 180.0, 90.0), (1, -180.0, -90.0), (2, 0.0, 0.0)], 5
    )
    assert got[0] == "z" * 5  # the north-east corner clamps into the last cell
    assert got[1] == "0" * 5
    assert got[2] == _encode_py(0.0, 0.0, 5)
