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
