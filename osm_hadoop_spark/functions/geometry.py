"""WKT codec + basic geometry measures, batch-vectorized (no shapely in env).

Internal geometry interchange in the engine is NOT WKT: way/polygon
geometries travel as parallel `array<double>` columns (xs, ys) so every
kernel stays NumPy-vectorized. WKT appears only at the edges for parity with
the reference, which serializes LineStrings as WKT text into the way tag map
(WayBuilder.scala:97-101 via JTS WKTWriter; read back at
WayRasterizer.scala:162-163 via WKTReader).

Number formatting decision (documented for parity audits): JTS WKTWriter with
the default floating PrecisionModel formats ordinates with pattern
"0.#################" — integral values print with no fraction ("-2", not
"-2.0"). We replicate: integral -> str(int(v)); otherwise repr(v) (shortest
round-trip, same digits JTS emits for binary doubles in practice).
"""

from __future__ import annotations

import numpy as np


def _fmt_ord(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def format_linestring_wkt(xs: np.ndarray, ys: np.ndarray) -> str:
    """coords -> 'LINESTRING (x y, x y, ...)' (JTS WKTWriter layout)."""
    pts = ", ".join(f"{_fmt_ord(x)} {_fmt_ord(y)}" for x, y in zip(xs, ys))
    return f"LINESTRING ({pts})"


def format_multilinestring_wkt(xs_list, ys_list) -> str:
    """member coords -> 'MULTILINESTRING ((x y, ...), (x y, ...))'
    (JTS WKTWriter layout: one parenthesized body per member line)."""
    bodies = (
        "(" + ", ".join(f"{_fmt_ord(x)} {_fmt_ord(y)}" for x, y in zip(xs, ys)) + ")"
        for xs, ys in zip(xs_list, ys_list)
    )
    return "MULTILINESTRING (" + ", ".join(bodies) + ")"


def parse_wkt_batch(wkts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a batch of single-ring WKT strings (LINESTRING / POLYGON outer
    ring / POINT) into flat coordinate arrays.

    Returns (xs, ys, counts) where counts[i] is the vertex count of row i.
    The parse is batch-oriented: one C-level number scan over the whole batch
    (join + np.fromstring-style), not per-coordinate Python.
    """
    counts = np.empty(len(wkts), dtype=np.int64)
    cleaned: list[str] = []
    for i, w in enumerate(wkts):
        body = w[w.index("(") : ].replace("(", " ").replace(")", " ")
        body = body.replace(",", " ")
        cleaned.append(body)
        # vertex count = number count / 2, computed after the global scan
        counts[i] = -1
    # one global scan
    per_row = [np.fromstring(b, sep=" ") for b in cleaned]  # noqa: NPY201 — fast C scan
    for i, arr in enumerate(per_row):
        counts[i] = arr.shape[0] // 2
    flat = np.concatenate(per_row) if per_row else np.zeros(0)
    xs = flat[0::2].astype(np.float64)
    ys = flat[1::2].astype(np.float64)
    return xs, ys, counts


def linestrings_to_wkb(xs_list, ys_list) -> list[bytes]:
    """coords -> WKB LineString bytes, one per row (E2; WayLoader.scala:90,
    108-109 via JTS WKBWriter).

    JTS WKBWriter defaults to big-endian (XDR): byte 0x00, uint32 type=2,
    uint32 npoints, then npoints * (float64 x, float64 y). The per-row byte
    assembly is a NumPy structured dump — no per-coordinate Python."""
    out: list[bytes] = []
    for xs, ys in zip(xs_list, ys_list):
        xs = np.asarray(xs, dtype=">f8")
        ys = np.asarray(ys, dtype=">f8")
        n = xs.shape[0]
        coords = np.empty((n, 2), dtype=">f8")
        coords[:, 0] = xs
        coords[:, 1] = ys
        header = b"\x00" + np.array([2, n], dtype=">u4").tobytes()
        out.append(header + coords.tobytes())
    return out


def wkb_to_linestrings(wkbs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of `linestrings_to_wkb` (accepts either byte order).

    Returns (xs, ys, counts) flat arrays, same layout as parse_wkt_batch."""
    per_row = []
    counts = np.empty(len(wkbs), dtype=np.int64)
    for i, raw in enumerate(wkbs):
        big = raw[0] == 0
        u4, f8 = (">u4", ">f8") if big else ("<u4", "<f8")
        geom_type, n = np.frombuffer(raw, dtype=u4, count=2, offset=1)
        if geom_type != 2:
            raise ValueError(f"not a WKB LineString: type={geom_type}")
        coords = np.frombuffer(raw, dtype=f8, count=2 * int(n), offset=9)
        per_row.append(coords.reshape(int(n), 2))
        counts[i] = n
    flat = (
        np.concatenate(per_row) if per_row else np.zeros((0, 2), dtype=np.float64)
    )
    return (
        flat[:, 0].astype(np.float64),
        flat[:, 1].astype(np.float64),
        counts,
    )


def linestring_length_flat(
    xs: np.ndarray, ys: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Planar (degree-space) length per linestring, flat-coords layout.

    Matches JTS Geometry.getLength used by the F6 guard
    (WayRasterizer.scala:165-168): sum of Euclidean segment lengths.
    """
    n = counts.shape[0]
    out = np.zeros(n, dtype=np.float64)
    if xs.shape[0] < 2:
        return out
    dx = np.diff(xs)
    dy = np.diff(ys)
    seglen = np.sqrt(dx * dx + dy * dy)
    coord_own = np.repeat(np.arange(n), counts)
    valid = coord_own[1:] == coord_own[:-1]  # drop segments bridging two geometries
    np.add.at(out, coord_own[:-1][valid], seglen[valid])
    return out


def envelopes_flat(
    xs: np.ndarray, ys: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-geometry envelope (E7, queryEnvelope2D at RoadlessRoadCount.scala:139-141)."""
    n = counts.shape[0]
    idx = np.repeat(np.arange(n), counts)
    xmin = np.full(n, np.inf)
    xmax = np.full(n, -np.inf)
    ymin = np.full(n, np.inf)
    ymax = np.full(n, -np.inf)
    np.minimum.at(xmin, idx, xs)
    np.maximum.at(xmax, idx, xs)
    np.minimum.at(ymin, idx, ys)
    np.maximum.at(ymax, idx, ys)
    return xmin, ymin, xmax, ymax
