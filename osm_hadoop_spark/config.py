"""Workload-shape constants mirrored from the reference.

Every constant cites the reference file it replicates so parity can be
audited. Do not "fix" the quirks (missing precedence key 3, default 15):
they are part of the output contract.
"""

from __future__ import annotations

# Highway tag -> integer class, default 15 for unknown values.
# Reference: WayRasterizer.scala:118-133 (duplicated at WayRasterizerAfr.scala:105-120,
# SparkRasterizer.scala:71-89, buffer/RoadlessRoadCount.scala:103-134).
# NOTE "motorway link" / "primary link" use a SPACE, not underscore, as in the
# reference literals.
HIGHWAY_CLASS: dict[str, int] = {
    "motorway": 1,
    "trunk": 2,
    "railway": 3,  # placeholder in the reference; never produced by highway tags
    "primary": 4,
    "secondary": 5,
    "tertiary": 6,
    "motorway link": 7,
    "primary link": 8,
    "unclassified": 9,
    "road": 10,
    "residential": 11,
    "service": 12,
    "track": 13,
    "pedestrian": 14,
}
HIGHWAY_CLASS_DEFAULT = 15

# class -> precedence; reference src/main/resources/raster-priority.properties.
# Key 3 is INTENTIONALLY ABSENT (the reference would throw on class 3; class 3
# is unreachable from highway tags). Replicated exactly.
PRECEDENCE: dict[int, int] = {
    1: 1, 2: 1, 4: 2, 5: 3, 6: 4, 7: 1, 8: 3,
    9: 5, 10: 5, 11: 6, 12: 7, 13: 5, 14: 8, 15: 5,
}

# Global raster grids. Reference: WayRasterizer.scala:27-28 (43200x21600,
# 30-arc-sec) and buffer/WayRasterizer2.scala:30-31 (32768x16384).
GLOBAL_GRID_W = 43200
GLOBAL_GRID_H = 21600
GLOBAL_GRID_W2 = 32768
GLOBAL_GRID_H2 = 16384

# Tile pipelines. Reference: buffer/RoadlessRasterizeMapSide.scala:96 (z13),
# buffer/RoadlessRasterizeReduceSide.scala:94 (z14),
# buffer/RoadlessRoadCount.scala:92 (z16), rasterstats/ImageRegions.scala:114 (z14).
ZOOM_BITSET = 13
ZOOM_WKT = 14
ZOOM_COUNT = 16
TILE_SIZE = 256  # buffer/RoadlessRasterizeMapSide.scala:124,146

# Buffer distances in degrees.
# Reference: buffer/RoadlessRasterizeMapSide.scala:97 (0.008333),
# buffer/RoadlessRasterizeReduceSide.scala:184 (0.08333).
BUFFER_DEG_Z13 = 0.008333
BUFFER_DEG_Z14 = 0.08333

# Anti-corruption guard: skip ways whose planar length exceeds 50 degrees.
# Reference: WayRasterizer.scala:165-168, WayRasterizerAfr.scala:148-151.
MAX_GEOM_LENGTH_DEG = 50.0

# Zonal histogram bin count. Reference: rasterstats/ImageRegions.scala:129.
ZONAL_BINS = 110

# Packed tile id bit layout (engine-defined, documented):
#   tile_id = (z << 58) | (x << 29) | y   with 0 <= x,y < 2^29, 0 <= z < 32.
TILE_Z_SHIFT = 58
TILE_X_SHIFT = 29
TILE_XY_MASK = (1 << 29) - 1
