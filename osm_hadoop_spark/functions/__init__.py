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
from osm_hadoop_spark.functions.s2_cover import (  # noqa: F401
    cells_for_envelope_s2,
)
from osm_hadoop_spark.functions.s2 import (  # noqa: F401
    cell_for_lonlat as s2_cell_for_lonlat,
    cell_parent as s2_cell_parent,
    cell_range_max as s2_cell_range_max,
    cell_range_min as s2_cell_range_min,
)
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
