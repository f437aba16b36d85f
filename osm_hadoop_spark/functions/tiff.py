"""GeoTIFF writer/reader (pure stdlib+NumPy; no GDAL/tifffile here).

Covers the reference's raster sinks/sources:
  - S9 GeoTIFF writer (ExtractRasterAfr.scala:70-97, tiff/WriteParams.java:
    35-57): single-band int32, WGS84 geographic, ModelPixelScale +
    ModelTiepoint geo tags; `compression="deflate"` mirrors the reference's
    DEFLATE write params, `rows_per_strip` its strip layout.
  - S5 GeoTIFF reader (tiff/GeotiffReader.java:100-186 +
    GeoTiffIIOMetadataAdapter.java): general single-band rasters — little/
    big endian, multi-strip AND tiled layouts, compression none/PackBits/
    LZW/DEFLATE, horizontal-differencing predictor, int8/16/32, uint8/16/32
    and float32/64 samples.

The block table (`tiff_blocks`) is the S8 strip-tiler source
(xyz/ImageTiler.java:37-135): driver parses the (tiny) IFD, executors
decode assigned blocks distributedly — see sources/raster_source.py.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

_T_BYTE, _T_ASCII, _T_SHORT, _T_LONG, _T_RATIONAL = 1, 2, 3, 4, 5
_T_SBYTE, _T_SSHORT, _T_SLONG = 6, 8, 9
_T_DOUBLE = 12
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


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


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def write_geotiff(
    path: str,
    img: np.ndarray,
    meta: GeoTiffMeta,
    compression: str = "none",
    rows_per_strip: int | None = None,
) -> None:
    """img: row-major (height, width) int32, row 0 = north edge.

    compression: "none" | "deflate" (zlib, TIFF tag 8 — the reference's
    WriteParams DEFLATE mode). rows_per_strip splits the image into strips
    (each compressed independently, per the TIFF spec).
    """
    img = np.ascontiguousarray(img, dtype="<i4")
    h, w = img.shape
    assert (w, h) == (meta.width, meta.height)
    comp_tag = {"none": 1, "deflate": 8}[compression]
    rps = h if rows_per_strip is None else min(int(rows_per_strip), h)

    strips = []
    for r0 in range(0, h, rps):
        raw = img[r0:r0 + rps].tobytes()
        strips.append(zlib.compress(raw, 6) if comp_tag == 8 else raw)

    # layout: header | strip data... | external arrays | IFD
    data_off = 8
    strip_offs = []
    off = data_off
    for s in strips:
        strip_offs.append(off)
        off += len(s)
    ext: list[bytes] = []

    def ext_put(payload: bytes) -> int:
        nonlocal off
        o = off
        ext.append(payload)
        off += len(payload)
        return o

    n_strips = len(strips)
    if n_strips == 1:
        so_count, so_val = 1, strip_offs[0]
        sc_count, sc_val = 1, len(strips[0])
    else:
        so_count = sc_count = n_strips
        so_val = ext_put(struct.pack(f"<{n_strips}I", *strip_offs))
        sc_val = ext_put(struct.pack(f"<{n_strips}I", *[len(s) for s in strips]))
    scale_off = ext_put(struct.pack("<3d", meta.pixel_size_x, meta.pixel_size_y, 0.0))
    tie_off = ext_put(struct.pack("<6d", 0.0, 0.0, 0.0, meta.origin_x, meta.origin_y, 0.0))
    geokeys = [
        (1, 1, 0, 3),        # version, rev, minor, number of keys
        (1024, 0, 1, 2),     # GTModelTypeGeoKey = geographic
        (1025, 0, 1, 1),     # GTRasterTypeGeoKey = PixelIsArea
        (2048, 0, 1, meta.epsg),  # GeographicTypeGeoKey
    ]
    geokey_off = ext_put(b"".join(struct.pack("<4H", *g) for g in geokeys))
    ifd_off = off

    def entry(tag, typ, count, value):
        return struct.pack("<HHII", tag, typ, count, value)

    entries = [
        entry(256, _T_LONG, 1, w),
        entry(257, _T_LONG, 1, h),
        entry(258, _T_SHORT, 1, 32),
        entry(259, _T_SHORT, 1, comp_tag),
        entry(262, _T_SHORT, 1, 1),      # BlackIsZero
        entry(273, _T_LONG, so_count, so_val),
        entry(277, _T_SHORT, 1, 1),
        entry(278, _T_LONG, 1, rps),
        entry(279, _T_LONG, sc_count, sc_val),
        entry(339, _T_SHORT, 1, 2),      # SampleFormat = signed int
        entry(33550, _T_DOUBLE, 3, scale_off),
        entry(33922, _T_DOUBLE, 6, tie_off),
        entry(34735, _T_SHORT, 16, geokey_off),
    ]

    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd_off))
        for s in strips:
            f.write(s)
        for payload in ext:
            f.write(payload)
        f.write(struct.pack("<H", len(entries)))
        for e in entries:
            f.write(e)
        f.write(struct.pack("<I", 0))


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _parse_ifd(buf: bytes) -> tuple[str, dict[int, tuple[int, int, tuple]]]:
    """First IFD -> {tag: (type, count, values tuple)} with inline/offset
    value resolution (the round-1 reader only handled inline LONGs)."""
    bo = "<" if buf[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
    (n,) = struct.unpack_from(bo + "H", buf, ifd_off)
    tags: dict[int, tuple[int, int, tuple]] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", buf, base)
        size = _TYPE_SIZE.get(typ, 1) * count
        off = base + 8 if size <= 4 else struct.unpack_from(bo + "I", buf, base + 8)[0]
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:  # ASCII / RATIONAL / UNDEFINED: keep raw bytes
            vals: tuple = (buf[off:off + size],)
        else:
            vals = struct.unpack_from(bo + f"{count}{fmt}", buf, off)
        tags[tag] = (typ, count, vals)
    return bo, tags


def _tiff_dtype(bo: str, tags) -> np.dtype:
    bits = tags.get(258, (0, 1, (1,)))[2][0]
    fmt = tags.get(339, (0, 1, (1,)))[2][0]  # 1=uint 2=int 3=float
    kind = {1: "u", 2: "i", 3: "f"}[fmt]
    return np.dtype(f"{bo}{kind}{bits // 8}")


def _unpackbits_decode(data: bytes) -> bytes:
    """TIFF PackBits (compression 32773)."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i:i + 1] * (257 - n)
            i += 1
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF LZW (compression 5): MSB-first codes, early-change, codes 256 =
    ClearCode / 257 = EOI (TIFF 6.0 section 13)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # early change: widen one code EARLY (TIFF quirk)
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _decode_block(data: bytes, comp: int) -> bytes:
    if comp == 1:
        return data
    if comp == 8 or comp == 32946:  # DEFLATE (Adobe & old code)
        return zlib.decompress(data)
    if comp == 5:
        return _lzw_decode(data)
    if comp == 32773:
        return _unpackbits_decode(data)
    raise ValueError(f"unsupported TIFF compression {comp}")


def _undo_predictor(arr: np.ndarray) -> np.ndarray:
    """Horizontal differencing (predictor 2): cumulative sum along rows."""
    return np.cumsum(arr.astype(np.int64), axis=1).astype(arr.dtype)


def tiff_blocks(buf: bytes) -> dict:
    """Parse the first IFD into a block map for distributed decode (S8).

    Returns {bo, width, height, dtype, comp, predictor, tiled, block_w,
    block_h, blocks: [(idx, offset, nbytes, row0, col0)], meta}.
    """
    bo, tags = _parse_ifd(buf)
    w = tags[256][2][0]
    h = tags[257][2][0]
    comp = tags.get(259, (0, 1, (1,)))[2][0]
    pred = tags.get(317, (0, 1, (1,)))[2][0]
    if tags.get(277, (0, 1, (1,)))[2][0] != 1:
        raise ValueError("only single-band TIFFs supported (reference parity)")
    dt = _tiff_dtype(bo, tags)
    tiled = 322 in tags
    if tiled:
        bw = tags[322][2][0]
        bh = tags[323][2][0]
        offs = tags[324][2]
        cnts = tags[325][2]
        per_row = (w + bw - 1) // bw
        blocks = [
            (i, offs[i], cnts[i], (i // per_row) * bh, (i % per_row) * bw)
            for i in range(len(offs))
        ]
    else:
        bw = w
        bh = tags.get(278, (0, 1, (h,)))[2][0]
        offs = tags[273][2]
        cnts = tags[279][2]
        blocks = [(i, offs[i], cnts[i], i * bh, 0) for i in range(len(offs))]
    psx, psy = (1.0, 1.0)
    ox, oy = (0.0, 0.0)
    if 33550 in tags:
        psx, psy = tags[33550][2][0], tags[33550][2][1]
    if 33922 in tags:
        tie = tags[33922][2]
        ox = tie[3] - tie[0] * psx
        oy = tie[4] + tie[1] * psy
    epsg = 4326
    if 34735 in tags:
        gk = tags[34735][2]
        for i in range(0, len(gk) - 3, 4):
            if gk[i] == 2048:
                epsg = gk[i + 3]
    meta = GeoTiffMeta(
        width=w, height=h, origin_x=ox, origin_y=oy,
        pixel_size_x=psx, pixel_size_y=psy, epsg=epsg,
    )
    return {
        "bo": bo, "width": w, "height": h, "dtype": dt.str, "comp": comp,
        "predictor": pred, "tiled": tiled, "block_w": bw, "block_h": bh,
        "blocks": blocks, "meta": meta,
    }


def decode_tiff_block(
    buf: bytes, info: dict, offset: int, nbytes: int, row0: int, col0: int
) -> np.ndarray:
    """Decode ONE strip/tile from the whole-file buffer (driver-side read)."""
    return decode_block_bytes(buf[offset:offset + nbytes], info, row0, col0)


def decode_block_bytes(
    data: bytes, info: dict, row0: int, col0: int
) -> np.ndarray:
    """Decode ONE strip/tile to its cropped (rows, cols) array — the unit of
    work an executor performs in the S8 tiler (it seek-reads just its
    block's byte range, never the whole file)."""
    dt = np.dtype(info["dtype"])
    bw, bh = info["block_w"], info["block_h"]
    raw = _decode_block(data, info["comp"])
    if info["tiled"]:
        rows, cols = bh, bw  # tiles are always padded to full size
    else:
        rows = min(bh, info["height"] - row0)
        cols = bw
    n = rows * cols
    arr = np.frombuffer(raw, dtype=dt, count=n).reshape(rows, cols)
    if info["predictor"] == 2:
        arr = _undo_predictor(arr)
    # crop tile padding at the south/east image edges
    rows_keep = min(rows, info["height"] - row0)
    cols_keep = min(cols, info["width"] - col0)
    return arr[:rows_keep, :cols_keep]


def read_geotiff(path: str) -> tuple[np.ndarray, GeoTiffMeta]:
    """Read a single-band GeoTIFF: strips or tiles, endianness, compression
    none/LZW/DEFLATE/PackBits, predictor 2, any int/uint/float sample type.

    Reference: GeotiffReader.java:100-186 (+ the tag adapter). Output dtype
    preserves the file's sample type.
    """
    with open(path, "rb") as f:
        buf = f.read()
    info = tiff_blocks(buf)
    img = np.zeros((info["height"], info["width"]), dtype=np.dtype(info["dtype"]))
    for _idx, off, cnt, row0, col0 in info["blocks"]:
        block = decode_tiff_block(buf, info, off, cnt, row0, col0)
        img[row0:row0 + block.shape[0], col0:col0 + block.shape[1]] = block
    return img, info["meta"]
