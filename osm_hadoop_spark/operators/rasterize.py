"""Global rasterization pipeline: snap + Bresenham + precedence aggregation.

Reference stages 4-5 of the planet pipeline (SURVEY.md section 3.1):
  map: tag -> class (F8, WayRasterizer.scala:118-133,150-160), length guard
       (F6, :165-168), snap (E4, GlobalGrid.scala:19-28), Bresenham per
       sliding coordinate pair (E5, :170-181) -> (packed pixel, class)
  reduce: per-pixel precedence argmin (A1, :196-212) with (precedence, class)
       tuple tie-break.

Spark-first layout:
  - class remap and length guard are JVM-side column expressions (codegen);
  - pixel emission is ONE `mapInPandas` whose body is the vectorized
    closed-form Bresenham (functions/raster.py) — Arrow batches in/out,
    no per-row Python;
  - the aggregation is a native hash aggregate on a single packed int64
    pixel key (partial + final — the reference has no combiner, so Spark's
    map-side partial agg is a free win, SURVEY.md section 4);
  - the aggregated pixel table (bounded by w*h) is the only thing that ever
    reaches the driver, exactly like the reference's collect at
    ExtractRasterAfr.scala:49-54.

Class-3 precedence note: raster-priority.properties has no key 3; the
reference would throw NoSuchElementException if a class-3 pixel ever reached
the reducer (it cannot via highway tags). We replicate the key set exactly
and DROP class-3 pixels at the aggregate (a distributed job can't "throw per
row"); the drop is observable via the `dropped_no_precedence` metric.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.config import (
    GLOBAL_GRID_H,
    GLOBAL_GRID_W,
    HIGHWAY_CLASS,
    HIGHWAY_CLASS_DEFAULT,
    MAX_GEOM_LENGTH_DEG,
    PRECEDENCE,
)

PIXELS_SCHEMA = "pix bigint, cls int"


def highway_class_col(tag_value_col: str = "highway") -> F.Column:
    """F8 value remap: highway string -> class int, default 15 (JVM-side map
    literal — the reference's broadcast-dict lookup J4)."""
    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(HIGHWAY_CLASS.items())])
    return F.coalesce(
        m[F.col(tag_value_col)], F.lit(HIGHWAY_CLASS_DEFAULT)
    ).cast("int")


def precedence_col(cls_col: str = "cls") -> F.Column:
    """class -> precedence (raster-priority.properties; key 3 absent -> NULL)."""
    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(PRECEDENCE.items())])
    return m[F.col(cls_col)]


def planar_length_col(xs: str = "xs", ys: str = "ys") -> F.Column:
    """JTS getLength equivalent (sum of segment lengths) as a JVM expression —
    keeps the F6 guard inside codegen instead of Python."""
    idx = F.sequence(F.lit(0), F.size(xs) - 2)
    seg = F.transform(
        idx,
        lambda i: F.sqrt(
            F.pow(F.element_at(F.col(xs), i + 2) - F.element_at(F.col(xs), i + 1), 2)
            + F.pow(F.element_at(F.col(ys), i + 2) - F.element_at(F.col(ys), i + 1), 2)
        ),
    )
    return F.aggregate(seg, F.lit(0.0), lambda acc, v: acc + v)


def rasterize_ways(
    ways: DataFrame,
    grid_w: int = GLOBAL_GRID_W,
    grid_h: int = GLOBAL_GRID_H,
    value_tag: str = "highway",
    length_guard: bool = True,
) -> DataFrame:
    """ways(way_id, <value_tag>, xs, ys) -> pixels(pix: packed int64, cls).

    The map side of WayRasterizerAfr (WayRasterMapper:123-165), vectorized.
    """
    df = ways.withColumn("cls", highway_class_col(value_tag))
    if length_guard:
        df = df.filter(planar_length_col() <= MAX_GEOM_LENGTH_DEG)  # F6
    # spread to the session's parallelism: pixel generation amplifies each
    # way ~100x, and a small ways table often arrives as 1-2 scan splits —
    # without the exchange the whole Bresenham stage runs on one core
    # (measured 47s -> 5s at sf0.1). At planet scale the input already has
    # thousands of splits and the exchange is round-robin on the SLIM
    # pre-amplification rows, so the cost stays negligible.
    df = df.select("cls", "xs", "ys").repartition(
        ways.sparkSession.sparkContext.defaultParallelism
    )

    gw, gh = int(grid_w), int(grid_h)

    def emit(batches):
        from osm_hadoop_spark.functions.grid import GlobalGrid, pack_xy
        from osm_hadoop_spark.functions.raster import rasterize_segments

        grid = GlobalGrid(gw, gh)
        for pdf in batches:
            if pdf.shape[0] == 0:
                continue
            counts = pdf["xs"].str.len().to_numpy(dtype=np.int64)
            xs = np.concatenate(pdf["xs"].to_numpy()) if counts.sum() else np.zeros(0)
            ys = np.concatenate(pdf["ys"].to_numpy())
            sx, sy = grid.snap(xs, ys)
            own = np.repeat(np.arange(counts.shape[0]), counts)
            valid = own[1:] == own[:-1]  # consecutive pairs within one way (sliding(2))
            seg_way = own[:-1][valid]
            px, py, seg_idx = rasterize_segments(
                sx[:-1][valid], sy[:-1][valid], sx[1:][valid], sy[1:][valid]
            )
            cls = pdf["cls"].to_numpy(dtype=np.int32)[seg_way[seg_idx]]
            yield pd.DataFrame({"pix": pack_xy(px, py), "cls": cls})

    return df.mapInPandas(emit, schema=PIXELS_SCHEMA)


def precedence_argmin(pixels: DataFrame) -> DataFrame:
    """A1: per-pixel class with minimal (precedence, class) tuple
    (WayRasterizer.PixelReducer:196-212). Native partial+final hash agg."""
    return (
        pixels.withColumn("prec", precedence_col("cls"))
        .filter(F.col("prec").isNotNull())  # class-3 drop, see module docstring
        .groupBy("pix")
        .agg(F.min(F.struct("prec", "cls")).alias("m"))
        .select("pix", F.col("m.cls").alias("cls"))
    )


def min_class(pixels: DataFrame) -> DataFrame:
    """A2: the SparkRasterizer.scala:101-102 variant — min of the RAW class,
    ignoring precedence. Documented divergence from A1 in the reference
    itself; A1 is canonical (SURVEY.md section 2.4)."""
    return pixels.groupBy("pix").agg(F.min("cls").alias("cls"))


def pixel_counts(pixels: DataFrame) -> DataFrame:
    """A3: way-segment count per pixel (WayRasterizer2.PixelReducer:199-215)."""
    return pixels.groupBy("pix").agg(F.count(F.lit(1)).alias("n"))


def assemble_raster(
    agg_pixels: DataFrame, grid_w: int, grid_h: int, nodata: int = 0
) -> tuple[np.ndarray, int]:
    """Driver-side raster burn (S9 stage; ExtractRasterAfr.scala:49-67).

    Applies the F7 bounds predicate (0 <= x < w, 0 <= y < h; out-of-range
    pixels counted, reference prints them at ExtractRaster.scala:54-58) and
    the E13 y-flip (yIdx = h - y - 1). Returns (row-major int32 image,
    n_out_of_range). Only the aggregated (<= w*h row) table is collected.
    """
    pdf = agg_pixels.toPandas()
    from osm_hadoop_spark.functions.grid import unpack_xy

    x, y = unpack_xy(pdf["pix"].to_numpy(dtype=np.int64))
    cls = pdf["cls"].to_numpy(dtype=np.int32)
    ok = (x >= 0) & (x < grid_w) & (y >= 0) & (y < grid_h)
    img = np.full((grid_h, grid_w), nodata, dtype=np.int32)
    img[(grid_h - 1) - y[ok], x[ok]] = cls[ok]
    return img, int((~ok).sum())
