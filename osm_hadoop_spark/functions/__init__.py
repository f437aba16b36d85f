"""Vectorized geometry / grid / tile kernels (pure NumPy, Arrow-UDF ready).

The container has no shapely/h3/s2 — every kernel here is implemented from
the published formulas (slippy-map tiling, Bresenham, ray-casting PIP) in
vectorized NumPy so it can run inside `pandas_udf` / `mapInPandas` without
per-row Python.
"""

from osm_hadoop_spark.functions.grid import (  # noqa: F401
    GlobalGrid,
    pack_xy,
    unpack_xy,
)
from osm_hadoop_spark.functions.raster import rasterize_segments  # noqa: F401
from osm_hadoop_spark.functions.tiles import (  # noqa: F401
    cell_children,
    cell_parent,
    grid_disk,
    pack_tile,
    tile_bounds,
    tile_for_point,
    tiles_for_envelope_flat,
    unpack_tile,
)
