"""World->pixel affine grids and coordinate packing.

Mirrors reference semantics:
  - GlobalGrid.snap: grid/GlobalGrid.scala:19-28
      x1 = ((lon + 180) * w / 360).toInt ; y1 = ((lat + 90) * h / 180).toInt
    Scala `.toInt` TRUNCATES TOWARD ZERO (it is not floor). For the global
    grid both operands are >= 0 for in-range coordinates, so truncation ==
    floor there, but we replicate truncation so out-of-range inputs behave
    identically (SURVEY.md E4).
  - Grid (raster-extent affine): grid/Grid.scala:9-31 — arbitrary origin +
    pixel size; can go negative, where truncation != floor matters.
  - Coord packing: grid/Coord.scala:15-18, grid/CoordinateWritable.scala:13-24
      a single long carrying (x:int32, y:int32); unpack at
      SparkRasterizer.scala:113-116.
  - y flip: ExtractRaster.scala:44,49 — yIdx(y) = h - y - 1.
"""

from __future__ import annotations

import numpy as np


def _trunc_to_int(a: np.ndarray) -> np.ndarray:
    """Scala/Java `(double).toInt`: truncation toward zero."""
    return np.trunc(a).astype(np.int64)


class GlobalGrid:
    """World-extent affine grid (grid/GlobalGrid.scala:10-28)."""

    def __init__(self, w: int, h: int):
        self.w = int(w)
        self.h = int(h)

    def snap(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        x1 = _trunc_to_int((lon + 180.0) * self.w / 360.0)
        y1 = _trunc_to_int((lat + 90.0) * self.h / 180.0)
        return x1, y1


class RasterGrid:
    """Raster-extent affine grid (grid/Grid.scala:9-31).

    snap(coord) = trunc((coord - origin) / pixel_size); y measured down from
    origin_y (top). Truncation toward zero replicated (can differ from floor
    left/above the origin).
    """

    def __init__(self, origin_x: float, origin_y: float,
                 pixel_size_x: float, pixel_size_y: float):
        self.origin_x = float(origin_x)
        self.origin_y = float(origin_y)
        self.pixel_size_x = float(pixel_size_x)
        self.pixel_size_y = float(pixel_size_y)

    def snap(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        x = _trunc_to_int((lon - self.origin_x) / self.pixel_size_x)
        y = _trunc_to_int((self.origin_y - lat) / self.pixel_size_y)
        return x, y


def pack_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(x:int32, y:int32) -> one int64 shuffle key (grid/Coord.scala:15-18)."""
    xi = np.asarray(x, dtype=np.int64)
    yi = np.asarray(y, dtype=np.int64)
    return (xi << 32) | (yi & 0xFFFFFFFF)


def unpack_xy(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of pack_xy (SparkRasterizer.scala:113-116)."""
    p = np.asarray(packed, dtype=np.int64)
    x = p >> 32
    y = (p & 0xFFFFFFFF).astype(np.int64)
    # sign-extend y
    y = np.where(y >= (1 << 31), y - (1 << 32), y)
    return x, y


def flip_y(y: np.ndarray, h: int) -> np.ndarray:
    """Grid y-up -> image row y-down (ExtractRaster.scala:44,49)."""
    return (h - 1) - np.asarray(y, dtype=np.int64)


# SQL expression fragments for the same ops, used when the column is already
# relational (keeps the computation JVM-side / codegen'd instead of in Python):
SQL_SNAP_X = "CAST((({lon} + 180.0D) * {w}) / 360.0D AS INT)"  # Spark CAST(double AS int) truncates
SQL_SNAP_Y = "CAST((({lat} + 90.0D) * {h}) / 180.0D AS INT)"
SQL_PACK_XY = "(CAST({x} AS BIGINT) << 32) | (CAST({y} AS BIGINT) & 4294967295)"
