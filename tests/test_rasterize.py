"""Phase-2 raster pipeline: golden parity against an independent scalar model."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_hadoop_spark.config import (
    HIGHWAY_CLASS,
    HIGHWAY_CLASS_DEFAULT,
    PRECEDENCE,
)
from osm_hadoop_spark.functions.geometry import parse_wkt_batch
from osm_hadoop_spark.functions.grid import GlobalGrid, pack_xy, unpack_xy
from osm_hadoop_spark.functions.raster import rasterize_segments_scalar
from osm_hadoop_spark.functions.tiff import GeoTiffMeta, read_geotiff, write_geotiff
from osm_hadoop_spark.operators.rasterize import (
    assemble_raster,
    min_class,
    pixel_counts,
    precedence_argmin,
    rasterize_ways,
)
from osm_hadoop_spark.sources.fixtures import gen_ways_tagged

GRID_W, GRID_H = 43200, 21600


def scalar_pipeline(rows):
    """Independent scalar model of stages 4-5 (snap + Bresenham + A1)."""
    grid = GlobalGrid(GRID_W, GRID_H)
    acc: dict[int, list[int]] = {}
    for r in rows:
        xs, ys, _ = parse_wkt_batch([r["geometry_wkt"]])
        length = float(np.sqrt(np.diff(xs) ** 2 + np.diff(ys) ** 2).sum())
        if length > 50:
            continue
        cls = HIGHWAY_CLASS.get(r["highway"], HIGHWAY_CLASS_DEFAULT)
        sx, sy = grid.snap(xs, ys)
        for i in range(len(sx) - 1):
            for px, py in rasterize_segments_scalar(
                int(sx[i]), int(sy[i]), int(sx[i + 1]), int(sy[i + 1])
            ):
                acc.setdefault((px << 32) | (py & 0xFFFFFFFF), []).append(cls)
    out = {}
    for pix, classes in acc.items():
        out[pix] = min((PRECEDENCE[c], c) for c in classes)[1]
    return out


@pytest.fixture(scope="module")
def ways_tagged(spark):
    return gen_ways_tagged(spark, n=120).cache()


@pytest.fixture(scope="module")
def ways_arrays(spark, ways_tagged):
    """fixture WKT -> columnar xs/ys (the engine's internal geometry layout)."""
    import pandas as pd

    pdf = ways_tagged.toPandas()
    xs_l, ys_l = [], []
    for w in pdf["geometry_wkt"]:
        xs, ys, _ = parse_wkt_batch([w])
        xs_l.append(xs.tolist())
        ys_l.append(ys.tolist())
    pdf = pdf.assign(xs=xs_l, ys=ys_l)
    return spark.createDataFrame(
        pdf[["way_id", "highway", "xs", "ys"]],
        "way_id long, highway string, xs array<double>, ys array<double>",
    ).cache()


def test_raster_pipeline_bit_exact(spark, ways_tagged, ways_arrays):
    expected = scalar_pipeline(ways_tagged.collect())
    pixels = rasterize_ways(ways_arrays, GRID_W, GRID_H)
    got = {r["pix"]: r["cls"] for r in precedence_argmin(pixels).collect()}
    assert got == expected


def test_precedence_tuple_tie_break(spark):
    """classes 5 and 8 share precedence 3 -> smaller class (5) must win
    (tuple min, WayRasterizer.scala:204-207)."""
    pixels = spark.createDataFrame([(7, 8), (7, 5), (7, 13)], "pix long, cls int")
    out = precedence_argmin(pixels).collect()
    assert out[0]["cls"] == 5
    # min_class (A2 variant) diverges: raw min = 5 here too, so craft a case
    pixels2 = spark.createDataFrame([(9, 7), (9, 4)], "pix long, cls int")
    # A1: prec(7)=1 < prec(4)=2 -> 7 wins; A2: min raw -> 4
    assert precedence_argmin(pixels2).collect()[0]["cls"] == 7
    assert min_class(pixels2).collect()[0]["cls"] == 4


def test_class3_dropped(spark):
    pixels = spark.createDataFrame([(1, 3), (2, 3), (2, 9)], "pix long, cls int")
    got = {r["pix"]: r["cls"] for r in precedence_argmin(pixels).collect()}
    assert got == {2: 9}  # pixel 1 vanishes, pixel 2 keeps class 9


def test_length_guard_f6(spark):
    long_way = spark.createDataFrame(
        [(1, "residential", [0.0, 60.0], [0.0, 0.0]),
         (2, "residential", [0.0, 0.001], [0.0, 0.0])],
        "way_id long, highway string, xs array<double>, ys array<double>",
    )
    pix = rasterize_ways(long_way, GRID_W, GRID_H)
    ways_present = pix.select("cls").distinct().count()
    assert pix.count() > 0 and ways_present == 1  # only the short way burned


def test_pixel_counts(spark):
    pixels = spark.createDataFrame([(5, 1), (5, 2), (6, 1)], "pix long, cls int")
    got = {r["pix"]: r["n"] for r in pixel_counts(pixels).collect()}
    assert got == {5: 2, 6: 1}


def test_assemble_raster_flip_and_bounds(spark):
    pixels = spark.createDataFrame(
        [(int(pack_xy(np.array([0]), np.array([0]))[0]), 4),
         (int(pack_xy(np.array([2]), np.array([1]))[0]), 9),
         (int(pack_xy(np.array([99]), np.array([0]))[0]), 1)],  # out of range
        "pix long, cls int",
    )
    img, oob = assemble_raster(pixels, grid_w=3, grid_h=2)
    assert oob == 1
    assert img[1, 0] == 4   # (0,0) -> bottom row (y-flip E13)
    assert img[0, 2] == 9   # (2,1) -> top row
    assert img.sum() == 13


def test_geotiff_roundtrip(tmp_path):
    img = np.arange(12, dtype=np.int32).reshape(3, 4)
    meta = GeoTiffMeta(width=4, height=3, origin_x=-180.0, origin_y=90.0,
                       pixel_size_x=0.25, pixel_size_y=0.5)
    p = str(tmp_path / "t.tif")
    write_geotiff(p, img, meta)
    img2, meta2 = read_geotiff(p)
    assert (img2 == img).all()
    assert meta2 == meta
    assert meta2.envelope == (-180.0, 88.5, -179.0, 90.0)


def test_geotiff_deflate_multistrip_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    img = rng.integers(-5000, 5000, size=(37, 53), dtype=np.int32)
    meta = GeoTiffMeta(width=53, height=37, origin_x=9.0, origin_y=46.0,
                       pixel_size_x=0.01, pixel_size_y=0.01)
    p = str(tmp_path / "c.tif")
    write_geotiff(p, img, meta, compression="deflate", rows_per_strip=8)
    img2, meta2 = read_geotiff(p)
    assert (img2 == img).all() and meta2 == meta
    # deflate output actually compresses vs the uncompressed form
    p0 = str(tmp_path / "u.tif")
    write_geotiff(p0, img, meta)
    import os
    assert os.path.getsize(p) < os.path.getsize(p0)


def _lzw_encode(data: bytes) -> bytes:
    """Minimal TIFF-flavor LZW encoder (MSB-first, early change) used only
    to exercise the reader against a layout our writer never emits."""
    out = bytearray()
    bitbuf, nbits = 0, 0
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)  # ClearCode
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        # early change: the DECODER widens when len(table)+1 fills the
        # width, so the encoder widens when next emitted code needs it
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        w = c
    if w:
        emit(table[w])
    emit(257)  # EOI
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _write_foreign_tiff(path, img, bo, tiled, comp, predictor, dtype):
    """Hand-rolled TIFF writer for layouts our writer never produces
    (big-endian, tiled, LZW/PackBits, predictor) to exercise the reader."""
    import struct
    import zlib

    img = np.asarray(img)
    h, w = img.shape
    dt = np.dtype(dtype).newbyteorder(bo)
    fmt_code = {"u": 1, "i": 2, "f": 3}[dt.kind]

    def comp_bytes(arr2d):
        if predictor == 2:
            arr2d = np.concatenate(
                [arr2d[:, :1], np.diff(arr2d.astype(np.int64), axis=1)], axis=1
            ).astype(dt.base)
        raw = np.ascontiguousarray(arr2d, dtype=dt).tobytes()
        if comp == 1:
            return raw
        if comp == 8:
            return zlib.compress(raw)
        if comp == 5:
            return _lzw_encode(raw)
        raise AssertionError(comp)

    blocks = []
    if tiled:
        bw = bh = 16
        for r0 in range(0, h, bh):
            for c0 in range(0, w, bw):
                tile = np.zeros((bh, bw), dtype=dt.base)
                part = img[r0:r0 + bh, c0:c0 + bw]
                tile[:part.shape[0], :part.shape[1]] = part
                blocks.append(comp_bytes(tile))
    else:
        bh = 5
        for r0 in range(0, h, bh):
            blocks.append(comp_bytes(img[r0:r0 + bh]))

    e = bo
    offs, off = [], 8
    for b in blocks:
        offs.append(off)
        off += len(b)
    ext = []

    def ext_put(payload):
        nonlocal off
        o = off
        ext.append(payload)
        off += len(payload)
        return o

    n = len(blocks)
    off_val = offs[0] if n == 1 else ext_put(struct.pack(f"{e}{n}I", *offs))
    cnt_val = (len(blocks[0]) if n == 1
               else ext_put(struct.pack(f"{e}{n}I", *[len(b) for b in blocks])))
    scale_off = ext_put(struct.pack(f"{e}3d", 0.01, 0.01, 0.0))
    tie_off = ext_put(struct.pack(f"{e}6d", 0, 0, 0, 9.0, 46.0, 0))
    ifd_off = off

    def entry(tag, typ, count, value):
        # inline values sit in the FIRST bytes of the value field in the
        # file's byte order — a SHORT must be packed as H + 2 pad bytes
        if typ == 3 and count == 1:
            return struct.pack(f"{e}HHIH2x", tag, typ, count, value)
        return struct.pack(f"{e}HHII", tag, typ, count, value)

    entries = [
        entry(256, 4, 1, w), entry(257, 4, 1, h),
        entry(258, 3, 1, dt.itemsize * 8), entry(259, 3, 1, comp),
        entry(262, 3, 1, 1), entry(277, 3, 1, 1),
        entry(317, 3, 1, predictor), entry(339, 3, 1, fmt_code),
        entry(33550, 12, 3, scale_off), entry(33922, 12, 6, tie_off),
    ]
    if tiled:
        entries += [entry(322, 4, 1, 16), entry(323, 4, 1, 16),
                    entry(324, 4, n, off_val), entry(325, 4, n, cnt_val)]
    else:
        entries += [entry(273, 4, n, off_val), entry(278, 4, 1, 5),
                    entry(279, 4, n, cnt_val)]
    entries.sort(key=lambda b: struct.unpack(f"{e}H", b[:2])[0])
    with open(path, "wb") as f:
        f.write(struct.pack(f"{e}2sHI", b"II" if bo == "<" else b"MM", 42, ifd_off))
        for b in blocks:
            f.write(b)
        for payload in ext:
            f.write(payload)
        f.write(struct.pack(f"{e}H", len(entries)))
        for b in entries:
            f.write(b)
        f.write(struct.pack(f"{e}I", 0))


@pytest.mark.parametrize("bo,tiled,comp,predictor,dtype", [
    ("<", True, 8, 1, np.int32),     # tiled + DEFLATE
    ("<", True, 5, 2, np.uint8),     # tiled + LZW + horizontal predictor
    (">", False, 1, 1, np.uint16),   # big-endian multi-strip uncompressed
    ("<", False, 5, 1, np.int16),    # multi-strip LZW
    (">", False, 8, 2, np.int32),    # big-endian DEFLATE + predictor
])
def test_geotiff_reads_foreign_layouts(tmp_path, bo, tiled, comp, predictor, dtype):
    rng = np.random.default_rng(11)
    info = np.iinfo(dtype)
    img = rng.integers(max(info.min, -999), min(info.max, 999),
                       size=(23, 41)).astype(dtype)
    p = str(tmp_path / "f.tif")
    _write_foreign_tiff(p, img, bo, tiled, comp, predictor, dtype)
    img2, meta = read_geotiff(p)
    assert img2.shape == img.shape
    assert (img2.astype(np.int64) == img.astype(np.int64)).all()
    assert (meta.origin_x, meta.origin_y) == (9.0, 46.0)
    assert (meta.pixel_size_x, meta.pixel_size_y) == (0.01, 0.01)


def test_tiff_strip_table_matches_file(spark, tmp_path):
    """S8: external raster -> distributed strip table == the file's pixels."""
    from osm_hadoop_spark.sources.raster_source import tiff_strip_table

    rng = np.random.default_rng(3)
    img = rng.integers(0, 110, size=(64, 100), dtype=np.int32)
    meta = GeoTiffMeta(width=100, height=64, origin_x=9.0, origin_y=46.0,
                       pixel_size_x=0.01, pixel_size_y=0.01)
    p = str(tmp_path / "s.tif")
    write_geotiff(p, img, meta, compression="deflate", rows_per_strip=16)
    strips = tiff_strip_table(spark, p).collect()
    assert len(strips) == 4
    got = np.zeros_like(img)
    for r in strips:
        r0 = round((meta.origin_y - r["origin_y"]) / meta.pixel_size_y)
        c0 = round((r["origin_x"] - meta.origin_x) / meta.pixel_size_x)
        got[r0:r0 + r["height"], c0:c0 + r["width"]] = (
            np.asarray(r["pixels"], dtype=np.int32).reshape(r["height"], r["width"])
        )
    assert (got == img).all()


def test_tiff_strip_table_tiled_layout(spark, tmp_path):
    """S8 over a TILED (not stripped) TIFF: blocks are 16x16 tiles with
    edge padding the tiler must crop."""
    from osm_hadoop_spark.sources.raster_source import tiff_strip_table

    rng = np.random.default_rng(5)
    img = rng.integers(0, 110, size=(23, 41), dtype=np.int32)
    p = str(tmp_path / "tiled.tif")
    _write_foreign_tiff(p, img, "<", True, 8, 1, np.int32)
    blocks = tiff_strip_table(spark, p).collect()
    assert len(blocks) == 6  # ceil(23/16) * ceil(41/16)
    got = np.full_like(img, -1)
    for r in blocks:
        r0 = round((46.0 - r["origin_y"]) / 0.01)
        c0 = round((r["origin_x"] - 9.0) / 0.01)
        got[r0:r0 + r["height"], c0:c0 + r["width"]] = (
            np.asarray(r["pixels"], dtype=np.int32).reshape(r["height"], r["width"])
        )
    assert (got == img).all()  # edge tiles cropped, no padding leaked


def test_full_extract_to_geotiff(spark, ways_arrays, tmp_path):
    """End-to-end stage 4+5: ways -> pixels -> argmin -> GeoTIFF on disk.

    Uses a 4320x2160 grid (same formula, 10x coarser than the reference's
    43200x21600) to keep the driver-side image small in CI; full-resolution
    assembly is identical code exercised in test_assemble_raster above."""
    w, h = 4320, 2160
    pixels = precedence_argmin(rasterize_ways(ways_arrays, w, h))
    img, oob = assemble_raster(pixels, w, h)
    assert oob == 0
    meta = GeoTiffMeta(width=w, height=h, origin_x=-180.0, origin_y=90.0,
                       pixel_size_x=360.0 / w, pixel_size_y=180.0 / h)
    p = str(tmp_path / "extract.tif")
    write_geotiff(p, img, meta)
    img2, _ = read_geotiff(p)
    assert int((img2 > 0).sum()) == pixels.count()
    # DEFLATE output (the reference's WriteParams mode) reads back identically
    pc = str(tmp_path / "extract_deflate.tif")
    write_geotiff(pc, img, meta, compression="deflate", rows_per_strip=512)
    imgc, metac = read_geotiff(pc)
    assert (imgc == img2).all() and metac == meta
