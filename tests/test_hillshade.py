"""hillshade255 vs a numpy replay + closed-form cells."""

import math


def _expected(gx, gy, scale=240.0):
    p, q = gx / scale, gy / scale
    raw = (254.0 * math.sqrt(0.5) * (1.0 - p - q)
           / math.sqrt(1.0 + p * p + q * q) + 1.0)
    return int(math.floor(max(0.0, min(255.0, raw))))


def test_hillshade_vs_python_replay(spark):
    from osm_hadoop_spark.operators.terrain import hillshade255, horn_terrain

    dem = []
    # a ridge, a pit, a NW-facing slope, and flats
    for cx in range(8):
        for cy in range(8):
            dem.append((cx, cy, (cx * 37 + cy * 91) % 23 - (cx == cy) * 40))
    df = spark.createDataFrame(dem, "cx: long, cy: long, elev: long")
    horn = horn_terrain(df)
    grads = {(r["cx"], r["cy"]): (r["gx"], r["gy"]) for r in horn.collect()}
    got = {
        (r["cx"], r["cy"]): r["shade255"]
        for r in hillshade255(horn).collect()
    }
    assert set(got) == set(grads)
    for cell, (gx, gy) in grads.items():
        assert got[cell] == _expected(gx, gy), (cell, gx, gy)


def test_hillshade_closed_forms(spark):
    from osm_hadoop_spark.operators.terrain import hillshade255, horn_terrain

    # flat interior: gx = gy = 0 -> floor(254*sqrt(.5) + 1) = 180
    flat = [(cx, cy, 5) for cx in range(5) for cy in range(5)]
    df = spark.createDataFrame(flat, "cx: long, cy: long, elev: long")
    got = {
        (r["cx"], r["cy"]): r["shade255"]
        for r in hillshade255(horn_terrain(df)).collect()
    }
    assert got[(2, 2)] == int(math.floor(254.0 * math.sqrt(0.5) + 1.0))
    # a violent SE-facing cliff must clamp to 0, not wrap
    cliff = [(cx, cy, 100000 * (cx + cy)) for cx in range(5) for cy in range(5)]
    df2 = spark.createDataFrame(cliff, "cx: long, cy: long, elev: long")
    got2 = {
        (r["cx"], r["cy"]): r["shade255"]
        for r in hillshade255(horn_terrain(df2)).collect()
    }
    assert got2[(2, 2)] == 0
