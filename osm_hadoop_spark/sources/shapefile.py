"""S11: ESRI shapefile sink (pure stdlib; no GeoTools analog needed).

Reference: shp/ShapeWriter.scala:28-88 + ExtractShp.scala:19-52 — collect
assembled way LineStrings plus one string attribute (highway) driver-side
and write a .shp/.shx/.dbf set. Same bounded-driver-sink posture as the S9
GeoTIFF writer: the exported table is a filtered extract, not the corpus
(the reference also accumulates every feature in an ArrayList before
writing).

The reference enumerates the full geometry-type lattice
(shp/GeomType.scala:11-32) even though its live driver exports only
LineStrings; this sink supports the three concrete types a consumer of the
reference could request — Point, PolyLine, Polygon, MultiPoint (the full
concrete-member set of GeomType.scala:11-32).

Layout per the ESRI Shapefile Technical Description (July 1998): .shp main
file (big-endian headers, little-endian records), .shx index, dBase III
.dbf attribute table, and a .prj with the WGS84 WKT.
"""

from __future__ import annotations

import struct
from typing import Iterable, Sequence

from pyspark.sql import DataFrame

SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_MULTIPOINT = 8
_WGS84_PRJ = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)


def _point_record(xs: Sequence[float], ys: Sequence[float]) -> bytes:
    # Point records carry no bbox: type, x, y (28.4.1 of the spec).
    return struct.pack("<i2d", SHP_POINT, xs[0], ys[0])


def _signed_area2(xs: Sequence[float], ys: Sequence[float]) -> float:
    """Twice the signed area of a ring (positive = counter-clockwise)."""
    a = 0.0
    n = len(xs)
    for i in range(n):
        j = (i + 1) % n
        a += xs[i] * ys[j] - xs[j] * ys[i]
    return a


def _poly_record(
    xs: Sequence[float], ys: Sequence[float], shp_type: int
) -> bytes:
    xs, ys = list(xs), list(ys)
    if shp_type == SHP_POLYGON:
        # Spec: rings are closed and the outer ring is clockwise.
        if xs[0] != xs[-1] or ys[0] != ys[-1]:
            xs.append(xs[0]); ys.append(ys[0])
        if _signed_area2(xs, ys) > 0:
            xs.reverse(); ys.reverse()
    n = len(xs)
    box = (min(xs), min(ys), max(xs), max(ys))
    body = struct.pack("<i4dii", shp_type, *box, 1, n)
    body += struct.pack("<i", 0)  # single part starting at point 0
    for x, y in zip(xs, ys):
        body += struct.pack("<2d", x, y)
    return body


def multipolygon_record(
    rings: Sequence[tuple[Sequence[float], Sequence[float], bool]]
) -> bytes:
    """Multi-part Polygon record: rings = [(xs, ys, is_hole), ...].

    Spec (ESRI whitepaper, Polygon): one record holds many rings as parts;
    outer rings CLOCKWISE, holes COUNTER-clockwise, every ring closed. The
    assembled-multipolygon output (operators/polygon_assembly.py) uses the
    opposite (OGC) orientation, so this writer re-orients per ring."""
    closed: list[tuple[list[float], list[float]]] = []
    for xs, ys, is_hole in rings:
        xs, ys = list(xs), list(ys)
        if xs[0] != xs[-1] or ys[0] != ys[-1]:
            xs.append(xs[0]); ys.append(ys[0])
        a2 = _signed_area2(xs, ys)
        want_ccw = bool(is_hole)
        if (a2 > 0) != want_ccw and a2 != 0:
            xs.reverse(); ys.reverse()
        closed.append((xs, ys))
    all_x = [x for xs, _ in closed for x in xs]
    all_y = [y for _, ys in closed for y in ys]
    box = (min(all_x), min(all_y), max(all_x), max(all_y))
    n_pts = len(all_x)
    body = struct.pack("<i4dii", SHP_POLYGON, *box, len(closed), n_pts)
    off = 0
    for xs, _ in closed:
        body += struct.pack("<i", off)
        off += len(xs)
    for xs, ys in closed:
        for x, y in zip(xs, ys):
            body += struct.pack("<2d", x, y)
    return body


def _multipoint_record(xs: Sequence[float], ys: Sequence[float]) -> bytes:
    # MultiPoint (spec 28.4.2): type, box, numPoints, points — no parts.
    box = (min(xs), min(ys), max(xs), max(ys))
    body = struct.pack("<i4di", SHP_MULTIPOINT, *box, len(xs))
    for x, y in zip(xs, ys):
        body += struct.pack("<2d", x, y)
    return body


def _record(xs, ys, shp_type: int) -> bytes:
    if shp_type == SHP_POINT:
        return _point_record(xs, ys)
    if shp_type == SHP_MULTIPOINT:
        return _multipoint_record(xs, ys)
    if shp_type in (SHP_POLYLINE, SHP_POLYGON):
        return _poly_record(xs, ys, shp_type)
    raise ValueError(f"unsupported shapefile geometry type {shp_type}")


def _record_bbox(body: bytes, shp_type: int) -> tuple[float, float, float, float]:
    if shp_type == SHP_POINT:
        x, y = struct.unpack_from("<2d", body, 4)
        return (x, y, x, y)
    return struct.unpack_from("<4d", body, 4)


def write_shapefile(
    path_base: str,
    features: Iterable[tuple[Sequence[float], Sequence[float], str]],
    attr_name: str = "highway",
    attr_width: int = 32,
    shp_type: int = SHP_POLYLINE,
) -> int:
    """Write (xs, ys, attr) features to path_base.{shp,shx,dbf,prj}.

    shp_type selects Point (1), PolyLine (3, default) or Polygon (5);
    polygon rings are closed and oriented clockwise per the spec.
    Returns the number of features written.
    """
    records = []
    for xs, ys, attr in features:
        records.append(
            (_record(xs, ys, shp_type), "" if attr is None else str(attr))
        )
    return _write_record_files(path_base, records, shp_type, attr_name, attr_width)


def write_multipolygon_shapefile(
    path_base: str,
    features: Iterable[tuple[Sequence[tuple[Sequence[float], Sequence[float], bool]], str]],
    attr_name: str = "name",
    attr_width: int = 32,
) -> int:
    """Write multi-part Polygon features: each feature is
    (rings=[(xs, ys, is_hole), ...], attr). Completes the S11 sink for the
    assembled-multipolygon output (J2'')."""
    records = [
        (multipolygon_record(rings), "" if attr is None else str(attr))
        for rings, attr in features
    ]
    return _write_record_files(path_base, records, SHP_POLYGON, attr_name, attr_width)


def _write_record_files(
    path_base: str, records, shp_type: int, attr_name: str, attr_width: int
) -> int:
    shp_records = b""
    shx_records = b""
    offset_words = 50  # header = 100 bytes
    for i, (body, _) in enumerate(records):
        clen = len(body) // 2
        shp_records += struct.pack(">2i", i + 1, clen) + body
        shx_records += struct.pack(">2i", offset_words, clen)
        offset_words += 4 + clen

    if records:
        boxes = [_record_bbox(body, shp_type) for body, _ in records]
        xmin = min(b[0] for b in boxes); ymin = min(b[1] for b in boxes)
        xmax = max(b[2] for b in boxes); ymax = max(b[3] for b in boxes)
    else:
        xmin = ymin = xmax = ymax = 0.0

    def header(total_bytes: int) -> bytes:
        return (
            struct.pack(">7i", 9994, 0, 0, 0, 0, 0, total_bytes // 2)
            + struct.pack("<ii4d4d", 1000, shp_type,
                          xmin, ymin, xmax, ymax, 0, 0, 0, 0)
        )

    with open(path_base + ".shp", "wb") as f:
        f.write(header(100 + len(shp_records)) + shp_records)
    with open(path_base + ".shx", "wb") as f:
        f.write(header(100 + len(shx_records)) + shx_records)

    # dBase III: one character field. Descriptor layout: name[0:11],
    # type byte 11, 4 reserved, field LENGTH at byte 16, DECIMAL COUNT
    # at byte 17 (dBase III spec) — standard readers size the field
    # from byte 16, so the order matters.
    n = len(records)
    field = struct.pack(
        "<11sc4xBB14x", attr_name[:10].encode("ascii") + b"\x00", b"C",
        attr_width, 0,
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
    ways_geom: DataFrame, path_base: str, attr_col: str = "highway",
    shp_type: int = SHP_POLYLINE,
) -> int:
    """Collect an assembled-ways extract (way_id, xs, ys, attr) and write it
    as a shapefile — the ExtractShp entry point (LineString by default)."""
    cols = ["xs", "ys"] + ([attr_col] if attr_col in ways_geom.columns else [])
    rows = ways_geom.select(*cols).collect()
    feats = (
        (r["xs"], r["ys"], r[attr_col] if attr_col in cols else "")
        for r in rows
    )
    return write_shapefile(path_base, feats, attr_name=attr_col,
                           shp_type=shp_type)


def export_tile_envelopes(
    tiff_path: str, shp_base: str, zoom: int, tms: bool = False
) -> int:
    """GetTilesForImage parity: write the tile cover of a GeoTIFF's
    envelope as a Polygon shapefile, one clockwise rectangle per tile
    with its "z/x/y" id as the attribute.

    The reference keeps this as a manual utility in its TEST tree
    (/root/reference/src/test/java/org/roadlessforest/osm/
    GetTilesForImage.scala:36-66: GeoTiffReader envelope ->
    tilesForEnvelope(env, zoom) -> ShapeWriter(GeomType.Polygon));
    the cover and sink here are the engine's own E9 kernel and S11
    writer, driver-side like the original (a cover of one image is
    bounded — thousands of tiles, not a distributed job). Returns the
    number of tiles written.
    """
    import numpy as np

    from osm_hadoop_spark.functions.tiff import tiff_blocks
    from osm_hadoop_spark.functions.tiles import (
        tile_bounds,
        tiles_for_envelope_flat,
        unpack_tile,
    )

    with open(tiff_path, "rb") as f:
        meta = tiff_blocks(f.read())["meta"]
    xmin, ymin, xmax, ymax = meta.envelope
    tiles, _env_idx = tiles_for_envelope_flat(
        np.array([xmin]), np.array([ymin]), np.array([xmax]), np.array([ymax]),
        zoom, tms=tms,
    )
    b_xmin, b_ymin, b_xmax, b_ymax = tile_bounds(tiles, tms=tms)
    zs, xs, ys = unpack_tile(np.asarray(tiles, dtype=np.int64))

    def features():
        for i in range(tiles.shape[0]):
            # ll -> tl -> tr -> br -> ll: clockwise in screen space, the
            # ring order the reference's GeometryFactory polygon gets
            ring_x = [b_xmin[i], b_xmin[i], b_xmax[i], b_xmax[i], b_xmin[i]]
            ring_y = [b_ymin[i], b_ymax[i], b_ymax[i], b_ymin[i], b_ymin[i]]
            yield (ring_x, ring_y, f"{zs[i]}/{xs[i]}/{ys[i]}")

    return write_shapefile(
        shp_base, features(), attr_name="tile", attr_width=24,
        shp_type=SHP_POLYGON,
    )
