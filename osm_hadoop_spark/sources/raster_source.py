"""S8: GeoTIFF strip tiler — real TIFF file -> distributed strip table.

Reference: xyz/ImageTiler.java:37-135 reads a GeoTIFF and emits strip
records for MapReduce consumption. Spark-first shape: the DRIVER parses
only the (tiny) IFD into a block map; each EXECUTOR task seek-reads and
decodes its assigned strips/tiles — the file body never moves through the
driver, so an arbitrarily large raster tiles in parallel.

Output schema matches `sources.fixtures.gen_raster_tiles` exactly
(origin_x, origin_y, pixel_size_x, pixel_size_y, width, height, proj,
pixels), so every zonal operator (A5/E14/E16) runs on an external raster
unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from osm_hadoop_spark.functions.tiff import decode_block_bytes, tiff_blocks

STRIP_SCHEMA = (
    "block_id int, origin_x double, origin_y double, "
    "pixel_size_x double, pixel_size_y double, "
    "width int, height int, proj int, pixels array<int>"
)


def tiff_strip_table(
    spark: SparkSession, path: str, partitions: int | None = None
) -> DataFrame:
    """One row per TIFF strip/tile, decoded in parallel on executors.

    `path` must be visible to executors (shared storage on a cluster; the
    local filesystem in local mode — same contract as the reference's HDFS
    input path).
    """
    import mmap

    with open(path, "rb") as f:
        # mmap, not read(): the driver only touches the IFD + offset arrays
        # (a few KB); the raster body — arbitrarily large — is never paged
        # into driver memory
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        try:
            info = tiff_blocks(mm)
        finally:
            mm.close()
    meta = info["meta"]
    blocks = pd.DataFrame(
        info["blocks"], columns=["block_id", "offset", "nbytes", "row0", "col0"]
    )
    n_part = partitions or min(len(blocks), spark.sparkContext.defaultParallelism)
    bdf = spark.createDataFrame(blocks).repartition(max(1, n_part))
    # ship only the scalar decode parameters, never the pixel data
    dinfo = {k: info[k] for k in
             ("bo", "width", "height", "dtype", "comp", "predictor",
              "tiled", "block_w", "block_h")}
    psx, psy = meta.pixel_size_x, meta.pixel_size_y
    ox, oy = meta.origin_x, meta.origin_y
    epsg = meta.epsg

    def decode(batches):
        for pdf in batches:
            if pdf.shape[0] == 0:
                continue
            rows = []
            with open(path, "rb") as f:
                for r in pdf.itertuples(index=False):
                    f.seek(r.offset)
                    data = f.read(r.nbytes)
                    arr = decode_block_bytes(data, dinfo, int(r.row0), int(r.col0))
                    rows.append({
                        "block_id": int(r.block_id),
                        "origin_x": ox + int(r.col0) * psx,
                        "origin_y": oy - int(r.row0) * psy,
                        "pixel_size_x": psx,
                        "pixel_size_y": psy,
                        "width": int(arr.shape[1]),
                        "height": int(arr.shape[0]),
                        "proj": int(epsg),
                        "pixels": arr.astype("int32").ravel().tolist(),
                    })
            yield pd.DataFrame(rows)

    return bdf.mapInPandas(decode, schema=STRIP_SCHEMA)
