"""Phase-2 raster pipeline: golden parity against an independent scalar model."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_hadoop_spark.config import (
    HIGHWAY_CLASS,
    HIGHWAY_CLASS_DEFAULT,
    PRECEDENCE,
)
from osm_hadoop_spark.functions.geometry import parse_wkt_batch
from osm_hadoop_spark.functions.grid import GlobalGrid, pack_xy, unpack_xy
from osm_hadoop_spark.functions.raster import rasterize_segments_scalar
from osm_hadoop_spark.functions.tiff import GeoTiffMeta, read_geotiff, write_geotiff
from osm_hadoop_spark.operators.rasterize import (
    assemble_raster,
    min_class,
    pixel_counts,
    precedence_argmin,
    rasterize_ways,
)
from osm_hadoop_spark.sources.fixtures import gen_ways_tagged

GRID_W, GRID_H = 43200, 21600


def scalar_pipeline(rows):
    """Independent scalar model of stages 4-5 (snap + Bresenham + A1)."""
    grid = GlobalGrid(GRID_W, GRID_H)
    acc: dict[int, list[int]] = {}
    for r in rows:
        xs, ys, _ = parse_wkt_batch([r["geometry_wkt"]])
        length = float(np.sqrt(np.diff(xs) ** 2 + np.diff(ys) ** 2).sum())
        if length > 50:
            continue
        cls = HIGHWAY_CLASS.get(r["highway"], HIGHWAY_CLASS_DEFAULT)
        sx, sy = grid.snap(xs, ys)
        for i in range(len(sx) - 1):
            for px, py in rasterize_segments_scalar(
                int(sx[i]), int(sy[i]), int(sx[i + 1]), int(sy[i + 1])
            ):
                acc.setdefault((px << 32) | (py & 0xFFFFFFFF), []).append(cls)
    out = {}
    for pix, classes in acc.items():
        out[pix] = min((PRECEDENCE[c], c) for c in classes)[1]
    return out


@pytest.fixture(scope="module")
def ways_tagged(spark):
    return gen_ways_tagged(spark, n=120).cache()


@pytest.fixture(scope="module")
def ways_arrays(spark, ways_tagged):
    """fixture WKT -> columnar xs/ys (the engine's internal geometry layout)."""
    import pandas as pd

    pdf = ways_tagged.toPandas()
    xs_l, ys_l = [], []
    for w in pdf["geometry_wkt"]:
        xs, ys, _ = parse_wkt_batch([w])
        xs_l.append(xs.tolist())
        ys_l.append(ys.tolist())
    pdf = pdf.assign(xs=xs_l, ys=ys_l)
    return spark.createDataFrame(
        pdf[["way_id", "highway", "xs", "ys"]],
        "way_id long, highway string, xs array<double>, ys array<double>",
    ).cache()


def test_raster_pipeline_bit_exact(spark, ways_tagged, ways_arrays):
    expected = scalar_pipeline(ways_tagged.collect())
    pixels = rasterize_ways(ways_arrays, GRID_W, GRID_H)
    got = {r["pix"]: r["cls"] for r in precedence_argmin(pixels).collect()}
    assert got == expected


def test_precedence_tuple_tie_break(spark):
    """classes 5 and 8 share precedence 3 -> smaller class (5) must win
    (tuple min, WayRasterizer.scala:204-207)."""
    pixels = spark.createDataFrame([(7, 8), (7, 5), (7, 13)], "pix long, cls int")
    out = precedence_argmin(pixels).collect()
    assert out[0]["cls"] == 5
    # min_class (A2 variant) diverges: raw min = 5 here too, so craft a case
    pixels2 = spark.createDataFrame([(9, 7), (9, 4)], "pix long, cls int")
    # A1: prec(7)=1 < prec(4)=2 -> 7 wins; A2: min raw -> 4
    assert precedence_argmin(pixels2).collect()[0]["cls"] == 7
    assert min_class(pixels2).collect()[0]["cls"] == 4


def test_class3_dropped(spark):
    pixels = spark.createDataFrame([(1, 3), (2, 3), (2, 9)], "pix long, cls int")
    got = {r["pix"]: r["cls"] for r in precedence_argmin(pixels).collect()}
    assert got == {2: 9}  # pixel 1 vanishes, pixel 2 keeps class 9


def test_length_guard_f6(spark):
    long_way = spark.createDataFrame(
        [(1, "residential", [0.0, 60.0], [0.0, 0.0]),
         (2, "residential", [0.0, 0.001], [0.0, 0.0])],
        "way_id long, highway string, xs array<double>, ys array<double>",
    )
    pix = rasterize_ways(long_way, GRID_W, GRID_H)
    ways_present = pix.select("cls").distinct().count()
    assert pix.count() > 0 and ways_present == 1  # only the short way burned


def test_pixel_counts(spark):
    pixels = spark.createDataFrame([(5, 1), (5, 2), (6, 1)], "pix long, cls int")
    got = {r["pix"]: r["n"] for r in pixel_counts(pixels).collect()}
    assert got == {5: 2, 6: 1}


def test_assemble_raster_flip_and_bounds(spark):
    pixels = spark.createDataFrame(
        [(int(pack_xy(np.array([0]), np.array([0]))[0]), 4),
         (int(pack_xy(np.array([2]), np.array([1]))[0]), 9),
         (int(pack_xy(np.array([99]), np.array([0]))[0]), 1)],  # out of range
        "pix long, cls int",
    )
    img, oob = assemble_raster(pixels, grid_w=3, grid_h=2)
    assert oob == 1
    assert img[1, 0] == 4   # (0,0) -> bottom row (y-flip E13)
    assert img[0, 2] == 9   # (2,1) -> top row
    assert img.sum() == 13


def test_geotiff_roundtrip(tmp_path):
    img = np.arange(12, dtype=np.int32).reshape(3, 4)
    meta = GeoTiffMeta(width=4, height=3, origin_x=-180.0, origin_y=90.0,
                       pixel_size_x=0.25, pixel_size_y=0.5)
    p = str(tmp_path / "t.tif")
    write_geotiff(p, img, meta)
    img2, meta2 = read_geotiff(p)
    assert (img2 == img).all()
    assert meta2 == meta
    assert meta2.envelope == (-180.0, 88.5, -179.0, 90.0)


def test_full_extract_to_geotiff(spark, ways_arrays, tmp_path):
    """End-to-end stage 4+5: ways -> pixels -> argmin -> GeoTIFF on disk.

    Uses a 4320x2160 grid (same formula, 10x coarser than the reference's
    43200x21600) to keep the driver-side image small in CI; full-resolution
    assembly is identical code exercised in test_assemble_raster above."""
    w, h = 4320, 2160
    pixels = precedence_argmin(rasterize_ways(ways_arrays, w, h))
    img, oob = assemble_raster(pixels, w, h)
    assert oob == 0
    meta = GeoTiffMeta(width=w, height=h, origin_x=-180.0, origin_y=90.0,
                       pixel_size_x=360.0 / w, pixel_size_y=180.0 / h)
    p = str(tmp_path / "extract.tif")
    write_geotiff(p, img, meta)
    img2, _ = read_geotiff(p)
    assert int((img2 > 0).sum()) == pixels.count()
