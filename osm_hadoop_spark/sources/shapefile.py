"""S11: ESRI shapefile sink (pure stdlib; no GeoTools analog needed).

Reference: shp/ShapeWriter.scala:28-88 + ExtractShp.scala:19-52 — collect
assembled way LineStrings plus one string attribute (highway) driver-side
and write a .shp/.shx/.dbf set. Same bounded-driver-sink posture as the S9
GeoTIFF writer: the exported table is a filtered extract, not the corpus
(the reference also accumulates every feature in an ArrayList before
writing).

Layout per the ESRI Shapefile Technical Description (July 1998): .shp main
file (big-endian headers, little-endian records), .shx index, dBase III
.dbf attribute table, and a .prj with the WGS84 WKT.
"""

from __future__ import annotations

import struct
from typing import Iterable, Sequence

from pyspark.sql import DataFrame

SHP_POLYLINE = 3
_WGS84_PRJ = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)


def _polyline_record(xs: Sequence[float], ys: Sequence[float]) -> bytes:
    n = len(xs)
    box = (min(xs), min(ys), max(xs), max(ys))
    body = struct.pack("<i4dii", SHP_POLYLINE, *box, 1, n)
    body += struct.pack("<i", 0)  # single part starting at point 0
    for x, y in zip(xs, ys):
        body += struct.pack("<2d", x, y)
    return body


def write_shapefile(
    path_base: str,
    features: Iterable[tuple[Sequence[float], Sequence[float], str]],
    attr_name: str = "highway",
    attr_width: int = 32,
) -> int:
    """Write (xs, ys, attr) LineString features to path_base.{shp,shx,dbf,prj}.

    Returns the number of features written.
    """
    records = []
    for xs, ys, attr in features:
        records.append((_polyline_record(xs, ys), "" if attr is None else str(attr)))

    shp_records = b""
    shx_records = b""
    offset_words = 50  # header = 100 bytes
    for i, (body, _) in enumerate(records):
        clen = len(body) // 2
        shp_records += struct.pack(">2i", i + 1, clen) + body
        shx_records += struct.pack(">2i", offset_words, clen)
        offset_words += 4 + clen

    if records:
        xs_all = [v for body, _ in records
                  for v in struct.unpack_from("<4d", body, 4)]
        xmin = min(xs_all[0::4]); ymin = min(xs_all[1::4])
        xmax = max(xs_all[2::4]); ymax = max(xs_all[3::4])
    else:
        xmin = ymin = xmax = ymax = 0.0

    def header(total_bytes: int) -> bytes:
        return (
            struct.pack(">7i", 9994, 0, 0, 0, 0, 0, total_bytes // 2)
            + struct.pack("<ii4d4d", 1000, SHP_POLYLINE,
                          xmin, ymin, xmax, ymax, 0, 0, 0, 0)
        )

    with open(path_base + ".shp", "wb") as f:
        f.write(header(100 + len(shp_records)) + shp_records)
    with open(path_base + ".shx", "wb") as f:
        f.write(header(100 + len(shx_records)) + shx_records)

    # dBase III: one character field
    n = len(records)
    field = struct.pack(
        "<11sc4xBB14x", attr_name[:10].encode("ascii") + b"\x00", b"C",
        0, attr_width,
    )
    dbf_header = struct.pack(
        "<BBBBIHH20x", 3, 99, 1, 1, n, 32 + 32 + 1, 1 + attr_width
    ) + field + b"\x0d"
    with open(path_base + ".dbf", "wb") as f:
        f.write(dbf_header)
        for _, attr in records:
            f.write(b" " + attr[:attr_width].encode("ascii", "replace").ljust(attr_width))
        f.write(b"\x1a")
    with open(path_base + ".prj", "w") as f:
        f.write(_WGS84_PRJ)
    return n


def export_shapefile(
    ways_geom: DataFrame, path_base: str, attr_col: str = "highway"
) -> int:
    """Collect an assembled-ways extract (way_id, xs, ys, attr) and write it
    as a LineString shapefile — the ExtractShp entry point."""
    cols = ["xs", "ys"] + ([attr_col] if attr_col in ways_geom.columns else [])
    rows = ways_geom.select(*cols).collect()
    feats = (
        (r["xs"], r["ys"], r[attr_col] if attr_col in cols else "")
        for r in rows
    )
    return write_shapefile(path_base, feats, attr_name=attr_col)
