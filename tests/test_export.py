"""S11 shapefile sink: golden bytes + structural parse-back."""

import struct

import numpy as np

from osm_hadoop_spark.sources.shapefile import (
    SHP_POINT,
    SHP_POLYGON,
    export_shapefile,
    write_shapefile,
)


def _read_shp(path_base):
    with open(path_base + ".shp", "rb") as f:
        buf = f.read()
    code, flen = struct.unpack_from(">i20xi", buf, 0)
    version, shp_type = struct.unpack_from("<ii", buf, 28)
    box = struct.unpack_from("<4d", buf, 36)
    recs = []
    off = 100
    while off < len(buf):
        recno, clen = struct.unpack_from(">2i", buf, off)
        typ, x0, y0, x1, y1, nparts, npoints = struct.unpack_from(
            "<i4dii", buf, off + 8
        )
        pts_off = off + 8 + 44 + 4 * nparts
        pts = struct.unpack_from(f"<{2 * npoints}d", buf, pts_off)
        recs.append((recno, typ, (x0, y0, x1, y1), pts))
        off += 8 + clen * 2
    return code, flen, version, shp_type, box, recs


def _read_dbf(path_base):
    with open(path_base + ".dbf", "rb") as f:
        buf = f.read()
    n_rec, hdr_len, rec_len = struct.unpack_from("<IHH", buf, 4)
    vals = []
    off = hdr_len
    for _ in range(n_rec):
        vals.append(buf[off + 1:off + rec_len].decode("ascii").strip())
        off += rec_len
    return n_rec, vals


def test_write_shapefile_golden_bytes(tmp_path):
    base = str(tmp_path / "roads")
    n = write_shapefile(base, [
        ([10.0, 10.5, 11.0], [45.0, 45.2, 45.1], "primary"),
        ([-1.0, -0.5], [51.0, 51.5], "residential"),
    ])
    assert n == 2
    code, flen, version, shp_type, box, recs = _read_shp(base)
    assert (code, version, shp_type) == (9994, 1000, 3)  # PolyLine
    assert box == (-1.0, 45.0, 11.0, 51.5)
    with open(base + ".shp", "rb") as f:
        assert flen * 2 == len(f.read())  # 16-bit-word length field
    assert [r[0] for r in recs] == [1, 2]
    assert recs[0][2] == (10.0, 45.0, 11.0, 45.2)
    assert recs[0][3] == (10.0, 45.0, 10.5, 45.2, 11.0, 45.1)
    assert recs[1][3] == (-1.0, 51.0, -0.5, 51.5)
    n_rec, vals = _read_dbf(base)
    assert n_rec == 2 and vals == ["primary", "residential"]
    # .shx: one (offset, length) pair per record, offsets in words
    with open(base + ".shx", "rb") as f:
        shx = f.read()
    assert len(shx) == 100 + 8 * 2
    off0, len0 = struct.unpack_from(">2i", shx, 100)
    assert off0 == 50 and len0 == (8 + 44 + 4 + 16 * 3 - 8) // 2
    with open(base + ".prj") as f:
        assert "WGS_1984" in f.read()


def test_dbf_field_descriptor_layout(tmp_path):
    """dBase III readers size fields from descriptor byte 16 (length) and
    byte 17 (decimal count) — regression for the swapped pack order."""
    base = str(tmp_path / "desc")
    write_shapefile(base, [([1.0], [2.0], "x")], attr_width=32,
                    shp_type=SHP_POINT)
    with open(base + ".dbf", "rb") as f:
        buf = f.read()
    desc = buf[32:64]
    assert desc[16] == 32  # field length
    assert desc[17] == 0   # decimal count
    assert desc[11:12] == b"C"
    # header record length must agree with the descriptor field length
    rec_len = struct.unpack_from("<H", buf, 10)[0]
    assert rec_len == 1 + desc[16]


def test_write_point_shapefile(tmp_path):
    base = str(tmp_path / "pts")
    n = write_shapefile(base, [
        ([10.0], [45.0], "a"),
        ([-1.5], [51.25], "b"),
    ], shp_type=SHP_POINT)
    assert n == 2
    with open(base + ".shp", "rb") as f:
        buf = f.read()
    shp_type = struct.unpack_from("<i", buf, 32)[0]
    box = struct.unpack_from("<4d", buf, 36)
    assert shp_type == 1
    assert box == (-1.5, 45.0, 10.0, 51.25)
    # point record: 8-byte record header + type + x + y = 28 bytes
    typ, x, y = struct.unpack_from("<i2d", buf, 108)
    assert (typ, x, y) == (1, 10.0, 45.0)
    typ, x, y = struct.unpack_from("<i2d", buf, 108 + 28)
    assert (typ, x, y) == (1, -1.5, 51.25)
    _, vals = _read_dbf(base)
    assert vals == ["a", "b"]


def test_write_polygon_shapefile_closes_and_orients(tmp_path):
    base = str(tmp_path / "poly")
    # open, counter-clockwise triangle: must come back closed + clockwise
    n = write_shapefile(base, [
        ([0.0, 4.0, 0.0], [0.0, 0.0, 3.0], "zone"),
    ], shp_type=SHP_POLYGON)
    assert n == 1
    code, flen, version, shp_type, box, recs = _read_shp(base)
    assert shp_type == 5 and len(recs) == 1
    pts = recs[0][3]
    xs, ys = pts[0::2], pts[1::2]
    assert (xs[0], ys[0]) == (xs[-1], ys[-1])  # closed ring
    area2 = sum(
        xs[i] * ys[i + 1] - xs[i + 1] * ys[i] for i in range(len(xs) - 1)
    )
    assert area2 < 0  # clockwise outer ring per spec
    assert recs[0][2] == (0.0, 0.0, 4.0, 3.0)


def test_export_shapefile_from_ways(spark, tmp_path):
    ways = spark.createDataFrame(
        [(1, [10.0, 10.1], [45.0, 45.1], "primary"),
         (2, [11.0, 11.2, 11.3], [46.0, 46.1, 46.0], "track")],
        "way_id long, xs array<double>, ys array<double>, highway string",
    )
    base = str(tmp_path / "ways")
    assert export_shapefile(ways, base) == 2
    _, _, _, shp_type, _, recs = _read_shp(base)
    assert shp_type == 3 and len(recs) == 2
    _, vals = _read_dbf(base)
    assert sorted(vals) == ["primary", "track"]
    got = sorted(len(r[3]) // 2 for r in recs)
    assert got == [2, 3]
    assert all(np.isfinite(r[3]).all() for r in recs)


def test_write_multipolygon_shapefile(tmp_path):
    import struct

    from osm_hadoop_spark.sources.shapefile import write_multipolygon_shapefile

    base = str(tmp_path / "mp")
    # polygon with a hole (fed OGC orientation: outer CCW, hole CW) plus a
    # second single-ring polygon feature
    n = write_multipolygon_shapefile(base, [
        ([([0.0, 8.0, 8.0, 0.0], [0.0, 0.0, 8.0, 8.0], False),
          ([2.0, 2.0, 5.0, 5.0], [2.0, 5.0, 5.0, 2.0], True)], "donut"),
        ([([20.0, 24.0, 24.0], [0.0, 0.0, 3.0], False)], "tri"),
    ])
    assert n == 2
    code, flen, version, shp_type, box, recs = _read_shp(base)
    assert shp_type == 5 and len(recs) == 2
    assert box == (0.0, 0.0, 24.0, 8.0)
    # record 0: two rings, both closed; spec orientation outer CW, hole CCW
    with open(base + ".shp", "rb") as f:
        buf = f.read()
    nparts, npoints = struct.unpack_from("<ii", buf, 100 + 8 + 36)
    assert nparts == 2 and npoints == 10
    assert struct.unpack_from("<2i", buf, 100 + 8 + 44) == (0, 5)  # part offsets
    pts = recs[0][3]
    xs, ys = pts[0::2], pts[1::2]
    outer_x, outer_y = xs[:5], ys[:5]
    hole_x, hole_y = xs[5:], ys[5:]
    assert (outer_x[0], outer_y[0]) == (outer_x[-1], outer_y[-1])
    assert (hole_x[0], hole_y[0]) == (hole_x[-1], hole_y[-1])

    def a2(x, y):
        return sum(x[i] * y[i + 1] - x[i + 1] * y[i] for i in range(len(x) - 1))

    assert a2(outer_x, outer_y) < 0  # outer clockwise per spec
    assert a2(hole_x, hole_y) > 0    # hole counter-clockwise
    assert _read_dbf(base) == (2, ["donut", "tri"])


def test_export_tile_envelopes_for_image(tmp_path):
    """GetTilesForImage parity: the tile cover of a GeoTIFF envelope lands
    as one polygon record per tile, rectangle == tile_bounds, attribute ==
    z/x/y."""
    import numpy as np

    from osm_hadoop_spark.functions.tiff import GeoTiffMeta, write_geotiff
    from osm_hadoop_spark.functions.tiles import tile_bounds, tiles_for_envelope_flat
    from osm_hadoop_spark.sources.shapefile import export_tile_envelopes

    tif = str(tmp_path / "img.tif")
    meta = GeoTiffMeta(
        width=40, height=30, origin_x=28.67, origin_y=-2.94,
        pixel_size_x=0.0105, pixel_size_y=0.016,
    )
    write_geotiff(tif, np.zeros((30, 40), dtype=np.int32), meta)

    base = str(tmp_path / "tiles")
    n = export_tile_envelopes(tif, base, zoom=10)

    xmin, ymin, xmax, ymax = meta.envelope
    tiles, _ = tiles_for_envelope_flat(
        np.array([xmin]), np.array([ymin]), np.array([xmax]), np.array([ymax]), 10
    )
    assert n == tiles.shape[0] >= 2

    _, _, _, shp_type, _, recs = _read_shp(base)
    assert shp_type == 5 and len(recs) == n
    want_boxes = sorted(
        zip(*(np.round(a, 9) for a in tile_bounds(tiles)))
    )
    got_boxes = sorted(
        (round(b[0], 9), round(b[1], 9), round(b[2], 9), round(b[3], 9))
        for _, _, b, _ in recs
    )
    assert got_boxes == [tuple(float(v) for v in b) for b in want_boxes]
    n_rec, vals = _read_dbf(base)
    assert n_rec == n and all(v.count("/") == 2 for v in vals)
    # each record is a closed 5-point clockwise rectangle
    for _, typ, _, pts in recs:
        assert typ == 5
        assert len(pts) == 10 and pts[:2] == pts[-2:]


def test_write_multipoint_shapefile_parse_back(tmp_path):
    """MultiPoint (type 8, spec 28.4.2: type, box, numPoints, points —
    no parts array): the last GeomType.scala:11-32 enum member."""
    from osm_hadoop_spark.sources.shapefile import SHP_MULTIPOINT

    base = str(tmp_path / "mpts")
    n = write_shapefile(base, [
        ([10.0, 11.0, 10.5], [45.0, 45.2, 44.9], "cluster_a"),
        ([-1.5], [51.25], "cluster_b"),
    ], shp_type=SHP_MULTIPOINT)
    assert n == 2
    with open(base + ".shp", "rb") as f:
        buf = f.read()
    assert struct.unpack_from("<i", buf, 32)[0] == 8  # file-level type
    assert struct.unpack_from("<4d", buf, 36) == (-1.5, 44.9, 11.0, 51.25)
    # record 1: header + type + box + numPoints + 3 points
    typ, x0, y0, x1, y1, npts = struct.unpack_from("<i4di", buf, 108)
    assert (typ, npts) == (8, 3)
    assert (x0, y0, x1, y1) == (10.0, 44.9, 11.0, 45.2)
    pts = struct.unpack_from("<6d", buf, 108 + 4 + 32 + 4)
    assert pts == (10.0, 45.0, 11.0, 45.2, 10.5, 44.9)
    rec1_len = 4 + 32 + 4 + 16 * 3
    # record 2 directly after record 1's 8-byte header + body
    typ2, _, _, _, _, npts2 = struct.unpack_from(
        "<i4di", buf, 108 + rec1_len + 8
    )
    assert (typ2, npts2) == (8, 1)
    # .shx consistency: second record offset in 16-bit words
    with open(base + ".shx", "rb") as f:
        shx = f.read()
    off2, len2 = struct.unpack_from(">2i", shx, 108)
    # offset points at record 2's 8-byte header, in 16-bit words
    assert off2 == (100 + 8 + rec1_len) // 2 and len2 == (4 + 32 + 4 + 16) // 2
    _, vals = _read_dbf(base)
    assert vals == ["cluster_a", "cluster_b"]
