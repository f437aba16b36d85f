"""A5: raster -> vector zonal histograms per web-mercator cell.

Reference: rasterstats/ImageRegions.scala:35-161 — map each georeferenced
raster strip to (z14 mercator tile, pixelValue) pairs per pixel, reduce to a
110-bin histogram per tile, emit "value:count" text rows per non-zero bin.

E14 x-offset quirk (DOCUMENTED DECISION): the reference advances `x +=
pixelSizeX` BEFORE the first use (ImageRegions.scala:111-114), so every
pixel is tile-assigned at x = xLeft + (col+1)*pixelSizeX (one full pixel
right of the left edge, half a pixel right of the center) and at y = yTop -
row*pixelSizeY (the row's TOP edge, not its center). We replicate this
bit-for-bit under `reference_quirk=True` (default — output parity with the
reference) and offer the geometrically-correct pixel-center variant under
`reference_quirk=False`. Tests pin both.

Spark shape: one mapInPandas expands strips to (tile, val) pairs with
vectorized slippy math (no per-pixel Python), then a native count aggregate.
The strip->pairs expansion is the only wide row blowup; maxRecordsPerBatch
bounds Arrow batch size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.config import ZONAL_BINS, ZOOM_WKT


def pixels_to_cells(
    raster_tiles: DataFrame,
    zoom: int = ZOOM_WKT,
    reference_quirk: bool = True,
) -> DataFrame:
    """raster_tiles strips -> (tile_id, val) one row per pixel."""
    z = int(zoom)
    quirk = bool(reference_quirk)

    def expand(batches):
        from osm_hadoop_spark.functions.tiles import tile_for_point

        for pdf in batches:
            for i in range(pdf.shape[0]):
                w = int(pdf["width"].iloc[i])
                h = int(pdf["height"].iloc[i])
                ox = float(pdf["origin_x"].iloc[i])
                oy = float(pdf["origin_y"].iloc[i])
                psx = float(pdf["pixel_size_x"].iloc[i])
                psy = float(pdf["pixel_size_y"].iloc[i])
                vals = np.asarray(pdf["pixels"].iloc[i], dtype=np.int32)
                cols = np.arange(w, dtype=np.float64)
                rows = np.arange(h, dtype=np.float64)
                if quirk:
                    xs = ox + (cols + 1.0) * psx        # ImageRegions.scala:111-114
                    ys = oy - rows * psy                # first row at yTop
                else:
                    xs = ox + (cols + 0.5) * psx        # true pixel centers
                    ys = oy - (rows + 0.5) * psy
                gx = np.tile(xs, h)
                gy = np.repeat(ys, w)
                tiles = tile_for_point(gx, gy, z)
                yield pd.DataFrame({"tile_id": tiles, "val": vals})

    return raster_tiles.mapInPandas(expand, schema="tile_id bigint, val int")


def zonal_histogram(
    raster_tiles: DataFrame,
    zoom: int = ZOOM_WKT,
    reference_quirk: bool = True,
    n_bins: int = ZONAL_BINS,
) -> DataFrame:
    """(tile_id, val, cnt) per non-zero bin — A5 (TileReducer:127-161).

    Values must be < n_bins (the reference indexes a fixed 110-int array and
    would throw otherwise); we filter and expose the same contract.
    """
    cells = pixels_to_cells(raster_tiles, zoom, reference_quirk)
    return (
        cells.filter((F.col("val") >= 0) & (F.col("val") < n_bins))
        .groupBy("tile_id", "val")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def zonal_histogram_text(hist: DataFrame) -> DataFrame:
    """Reference output shape: one 'value:count' text row per non-zero bin
    (ImageRegions.scala:152-158)."""
    return hist.select(
        "tile_id", F.concat_ws(":", F.col("val"), F.col("cnt")).alias("bin_text")
    )


def zonal_mode(
    cells: DataFrame, zone_cols: list[str] = None, val_bound: int = 1 << 20
) -> DataFrame:
    """Modal value per zone — the zonal-majority reducer (the A5 family's
    argmax sibling; GIS "zonal statistics: MAJORITY").

    Input: DataFrame(<zone cols...>, val) with 0 <= val < val_bound
    (raster classes are small ints; the A5 contract is < 110 bins).
    Tie-break is PINNED to (max count, then min val), encoded as a
    single packed long ``cnt * val_bound + (val_bound - 1 - val)`` so
    the argmax is a plain ``max`` — two partial-aggregatable HASH aggs,
    no struct-max (which Spark plans as SortAggregate), no window, no
    sort: the shape that survives 100 TB.

    Returns DataFrame(<zone cols...>, mode_val, mode_cnt, n_vals) where
    n_vals is the number of distinct values observed in the zone.
    """
    zone_cols = zone_cols or ["tile_id"]
    counts = cells.groupBy(*zone_cols, "val").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    packed = F.col("cnt") * val_bound + (val_bound - 1 - F.col("val"))
    return counts.groupBy(*zone_cols).agg(
        F.max(packed).alias("k"),
        F.count(F.lit(1)).alias("n_vals"),
    ).select(
        *zone_cols,
        (val_bound - 1 - F.col("k") % val_bound).alias("mode_val"),
        F.expr(f"div(k, {val_bound})").alias("mode_cnt"),
        "n_vals",
    )
