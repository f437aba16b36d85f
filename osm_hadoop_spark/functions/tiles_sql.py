"""JVM (Catalyst Column) twins of the numpy tile kernels in tiles.py.

Single home for the SQL-side slippy-tile math shared by the streaming tile
counts (streaming/tiles.py) and the codegen cover strategy
(operators/tile_join.py, cover_impl='jvm'). The y-tile uses the
asinh-expanded ln form — textually the same expression the DuckDB oracles
use (`__spark_entry__._duck_yt`); numpy arcsinh / java Math.log / duckdb ln
agree to <= 1 ulp, and `test_tile_join.py::test_jvm_ytile_scan_matches_numpy`
pins identical assignment on every derivable fixture latitude at every
zoom in use (the same methodology that established oracle parity).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from osm_hadoop_spark.config import TILE_X_SHIFT, TILE_Z_SHIFT
from osm_hadoop_spark.functions.tiles import MAX_MERC_LAT


def sql_xtile(lon: Column, z: int) -> Column:
    n = 1 << z
    xt = F.floor((lon + 180.0) / 360.0 * n).cast("bigint")
    return F.least(F.greatest(xt, F.lit(0)), F.lit(n - 1))


def sql_ytile(lat: Column, z: int) -> Column:
    n = 1 << z
    clamped = F.least(F.greatest(lat, F.lit(-MAX_MERC_LAT)), F.lit(MAX_MERC_LAT))
    t = F.tan(F.radians(clamped))
    yt = F.floor(
        (1.0 - F.log(t + F.sqrt(t * t + 1.0)) / F.lit(math.pi)) / 2.0 * n
    ).cast("bigint")
    return F.least(F.greatest(yt, F.lit(0)), F.lit(n - 1))


def sql_pack_tile(z: int, xt: Column, yt: Column) -> Column:
    """JVM twin of tiles.pack_tile: (z << 58) | (x << 29) | y — disjoint
    bit ranges, so | == +."""
    return (
        F.lit(int(z) << TILE_Z_SHIFT) + F.shiftleft(xt, TILE_X_SHIFT) + yt
    ).cast("long")
