"""Raster pyramid (operators/pyramid.py): iterated == direct == brute."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def pixel_df(spark):
    # negative coords pin arithmetic-shift (floor) block assignment
    pix = [(i * 7 % 40 - 13, i * 11 % 30 - 9, i % 9 + 1) for i in range(500)]
    # collapse duplicates like a real raster (one row per pixel: min class)
    agg = {}
    for x, y, v in pix:
        agg[(x, y)] = min(agg.get((x, y), 99), v)
    rows = [(x, y, v) for (x, y), v in agg.items()]
    return (
        spark.createDataFrame(rows, "px long, py long, v long").cache(),
        rows,
    )


def _brute(rows, levels, red):
    out = {(0, x, y): v for x, y, v in rows}
    for k in range(1, levels + 1):
        blocks = {}
        for (lv, x, y), v in list(out.items()):
            if lv != k - 1:
                continue
            key = (k, x >> 1, y >> 1)
            blocks[key] = red(blocks[key], v) if key in blocks else v
        out.update(blocks)
    return out


@pytest.mark.parametrize(
    "agg,red", [("min", min), ("max", max), ("sum", lambda a, b: a + b)]
)
def test_pyramid_matches_brute(spark, pixel_df, agg, red):
    from osm_hadoop_spark.operators.pyramid import build_pyramid

    df, rows = pixel_df
    got = {
        (r["level"], r["px"], r["py"]): r["v"]
        for r in build_pyramid(df, levels=3, agg=agg).collect()
    }
    assert got == _brute(rows, 3, red)


def test_pyramid_iterated_equals_direct(spark, pixel_df):
    """Associativity proof on the operator: level k computed iteratively
    equals one direct aggregation of level 0 by (px >> k, py >> k)."""
    from pyspark.sql import functions as F

    from osm_hadoop_spark.operators.pyramid import build_pyramid

    df, _ = pixel_df
    it = build_pyramid(df, levels=3, agg="min").filter("level = 3")
    direct = df.groupBy(
        F.shiftright("px", 3).alias("px"), F.shiftright("py", 3).alias("py")
    ).agg(F.min("v").alias("v"))
    a = sorted((r["px"], r["py"], r["v"]) for r in it.collect())
    b = sorted((r["px"], r["py"], r["v"]) for r in direct.collect())
    assert a == b
