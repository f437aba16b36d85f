"""Minimal GeoTIFF writer/reader (pure stdlib+NumPy; no GDAL/tifffile here).

Covers the reference's raster sinks/sources (S9 GeoTIFF writer,
ExtractRasterAfr.scala:70-97 / tiff/WriteParams.java:35-57; S5 GeoTIFF
reader, tiff/GeotiffReader.java:100-186): single-band int32, uncompressed,
single strip, WGS84 geographic, with ModelPixelScale + ModelTiepoint geo
tags — the exact metadata the reference's GeotiffReader extracts
(pixelScales, tiepoints, proj, width, height -> Envelope2D).

Compression: the reference writes DEFLATE/LZW; this writer emits
uncompressed (the spec subset GDAL/QGIS read fine) — byte-level compression
of an output artifact is not an operator semantic.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_T_SHORT, _T_LONG, _T_DOUBLE = 3, 4, 12


@dataclass
class GeoTiffMeta:
    width: int
    height: int
    origin_x: float  # top-left corner
    origin_y: float
    pixel_size_x: float
    pixel_size_y: float
    epsg: int = 4326

    @property
    def envelope(self) -> tuple[float, float, float, float]:
        """(xmin, ymin, xmax, ymax) — GeotiffReader.java:144-186 Envelope2D."""
        return (
            self.origin_x,
            self.origin_y - self.pixel_size_y * self.height,
            self.origin_x + self.pixel_size_x * self.width,
            self.origin_y,
        )


def write_geotiff(path: str, img: np.ndarray, meta: GeoTiffMeta) -> None:
    """img: row-major (height, width) int32, row 0 = north edge."""
    img = np.ascontiguousarray(img, dtype="<i4")
    h, w = img.shape
    assert (w, h) == (meta.width, meta.height)

    pix_bytes = img.tobytes()
    data_off = 8
    scale_off = data_off + len(pix_bytes)
    tie_off = scale_off + 24
    geokey_off = tie_off + 48
    ifd_off = geokey_off + 32

    geokeys = [
        (1, 1, 0, 3),        # version, rev, minor, number of keys
        (1024, 0, 1, 2),     # GTModelTypeGeoKey = geographic
        (1025, 0, 1, 1),     # GTRasterTypeGeoKey = PixelIsArea
        (2048, 0, 1, meta.epsg),  # GeographicTypeGeoKey
    ]

    def entry(tag, typ, count, value):
        return struct.pack("<HHII", tag, typ, count, value)

    entries = [
        entry(256, _T_LONG, 1, w),
        entry(257, _T_LONG, 1, h),
        entry(258, _T_SHORT, 1, 32),
        entry(259, _T_SHORT, 1, 1),      # uncompressed
        entry(262, _T_SHORT, 1, 1),      # BlackIsZero
        entry(273, _T_LONG, 1, data_off),
        entry(277, _T_SHORT, 1, 1),
        entry(278, _T_LONG, 1, h),
        entry(279, _T_LONG, 1, len(pix_bytes)),
        entry(339, _T_SHORT, 1, 2),      # SampleFormat = signed int
        entry(33550, _T_DOUBLE, 3, scale_off),
        entry(33922, _T_DOUBLE, 6, tie_off),
        entry(34735, _T_SHORT, 16, geokey_off),
    ]

    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd_off))
        f.write(pix_bytes)
        f.write(struct.pack("<3d", meta.pixel_size_x, meta.pixel_size_y, 0.0))
        f.write(struct.pack("<6d", 0.0, 0.0, 0.0, meta.origin_x, meta.origin_y, 0.0))
        for g in geokeys:
            f.write(struct.pack("<4H", *g))
        f.write(struct.pack("<H", len(entries)))
        for e in entries:
            f.write(e)
        f.write(struct.pack("<I", 0))


def read_geotiff(path: str) -> tuple[np.ndarray, GeoTiffMeta]:
    """Parse the subset written above (+ big-endian tolerance)."""
    with open(path, "rb") as f:
        buf = f.read()
    bo = "<" if buf[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
    (n,) = struct.unpack_from(bo + "H", buf, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        tag, typ, count, val = struct.unpack_from(bo + "HHII", buf, ifd_off + 2 + 12 * i)
        tags[tag] = (typ, count, val)

    def doubles(tag, count):
        _, c, off = tags[tag]
        return struct.unpack_from(bo + f"{count}d", buf, off)

    w = tags[256][2]
    h = tags[257][2]
    strip_off = tags[273][2]
    psx, psy, _ = doubles(33550, 3)
    tie = doubles(33922, 6)
    img = np.frombuffer(buf, dtype=bo + "i4", count=w * h, offset=strip_off).reshape(h, w)
    meta = GeoTiffMeta(
        width=w, height=h, origin_x=tie[3], origin_y=tie[4],
        pixel_size_x=psx, pixel_size_y=psy,
    )
    return img.copy(), meta
