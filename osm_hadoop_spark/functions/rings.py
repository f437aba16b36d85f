"""Ring kernels for multipolygon assembly: shoelace area, canonical form,
endpoint chaining, and polygon WKT bodies.

North-star support code ("way/relation assembly"): OSM multipolygon
relations carry member ways that are either closed rings or open fragments
whose endpoints must be chained into rings — semantics the reference never
implements (its dispatch drops relations, NodeJoiner.scala:110,136). These
kernels are deliberately per-relation: relations are bounded (OSM caps
member lists), so the distributed operator runs them inside one
`applyInPandas` group and everything here stays O(relation size).

Canonical ring form (the cross-engine determinism contract, mirrored by the
driver's DuckDB oracle): closing duplicate vertex stripped; orientation
normalized (outer CCW / positive shoelace, holes CW); rotated to start at
the lexicographically smallest (x, y) vertex; serialized closed.
"""

from __future__ import annotations

import numpy as np


def signed_area2(xs: np.ndarray, ys: np.ndarray) -> float:
    """Twice the shoelace signed area of an open-form ring (no repeated
    closing vertex; closure implicit). Positive = CCW in math orientation.
    Exact for lattice / small-denominator coordinates."""
    # dot-product form; np.roll allocates twice and measured 3x slower on
    # the small rings this kernel sees
    s = float(xs[:-1] @ ys[1:]) - float(xs[1:] @ ys[:-1])
    return s + float(xs[-1] * ys[0]) - float(xs[0] * ys[-1])


def _strip_closing(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if len(xs) > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        return xs[:-1], ys[:-1]
    return xs, ys


def canonical_ring(
    xs, ys, ccw: bool
) -> tuple[np.ndarray, np.ndarray, float]:
    """-> (xs, ys, |area2|) in canonical open form: requested orientation,
    rotated to the lex-min (x, y) start vertex."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    xs, ys = _strip_closing(xs, ys)
    a2 = signed_area2(xs, ys)
    if (a2 > 0) != ccw and a2 != 0:
        xs, ys = xs[::-1], ys[::-1]
    # rotate to lexicographic min (x, then y); plain-Python min beats
    # np.lexsort on the tiny rings this kernel sees
    n = len(xs)
    if n <= 32:
        i = min(range(n), key=lambda j: (xs[j], ys[j]))
    else:
        i = int(np.lexsort((ys, xs))[0])
    xs = np.concatenate([xs[i:], xs[:i]])
    ys = np.concatenate([ys[i:], ys[:i]])
    return xs, ys, abs(a2)


def ring_body(xs: np.ndarray, ys: np.ndarray) -> str:
    """Canonical open-form ring -> '(x y, ..., x0 y0)' (closed WKT body,
    JTS ordinate layout)."""
    from osm_hadoop_spark.functions.geometry import _fmt_ord

    pts = [f"{_fmt_ord(float(x))} {_fmt_ord(float(y))}" for x, y in zip(xs, ys)]
    pts.append(pts[0])
    return "(" + ", ".join(pts) + ")"


def chain_segments(
    segs: list[tuple[np.ndarray, np.ndarray]]
) -> tuple[list[tuple[np.ndarray, np.ndarray]], int]:
    """Chain open segments into closed rings by exact endpoint matching.

    Already-closed segments (first == last vertex) become rings directly.
    Open segments are first DEDUPED as undirected paths (a fragment equal
    to another fragment reversed is the same member way twice — OSM data
    error; keeping both lets the reversed copy satisfy the closing test
    and fold the chain into a zero-area out-and-back 'ring', the
    sf0.1-sweep bug of round 4). Two genuinely distinct rings cannot
    share a multi-edge path in a valid multipolygon, so the dedupe drops
    only duplicates. Then open segments extend greedily, PREFERRING a
    candidate that closes the current chain (forward, then reversed)
    before any mere extension — for distinct axis-aligned fragments this
    makes the pairing independent of input order. A chain that can no
    longer extend is dropped whole.

    -> (rings in open form, n_dropped_segments).
    """
    rings: list[tuple[np.ndarray, np.ndarray]] = []
    opens: list[tuple[np.ndarray, np.ndarray]] = []
    for xs, ys in segs:
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        if len(xs) > 3 and xs[0] == xs[-1] and ys[0] == ys[-1]:
            rings.append((xs[:-1], ys[:-1]))
        elif len(xs) >= 2:
            opens.append((xs, ys))
    seen: set[bytes] = set()
    deduped: list[tuple[np.ndarray, np.ndarray]] = []
    for xs, ys in opens:
        fwd = xs.tobytes() + ys.tobytes()
        rev = xs[::-1].tobytes() + ys[::-1].tobytes()
        key = min(fwd, rev)
        if key in seen:
            continue
        seen.add(key)
        deduped.append((xs, ys))
    opens = deduped
    dropped = 0
    while opens:
        cx, cy = opens.pop(0)
        used = 1
        while True:
            if cx[0] == cx[-1] and cy[0] == cy[-1] and len(cx) > 3:
                rings.append((cx[:-1], cy[:-1]))
                break
            closing = ext = None
            for j, (sx, sy) in enumerate(opens):
                fwd = sx[0] == cx[-1] and sy[0] == cy[-1]
                rev = sx[-1] == cx[-1] and sy[-1] == cy[-1]
                closes_f = fwd and sx[-1] == cx[0] and sy[-1] == cy[0]
                closes_r = rev and sx[0] == cx[0] and sy[0] == cy[0]
                if closes_f or closes_r:
                    closing = (j, fwd)
                    break
                if ext is None and (fwd or rev):
                    ext = (j, fwd)
            pick = closing if closing is not None else ext
            if pick is None:
                dropped += used  # incomplete chain: drop it whole
                break
            j, fwd = pick
            sx, sy = opens.pop(j)
            if not fwd:
                sx, sy = sx[::-1], sy[::-1]
            cx = np.concatenate([cx, sx[1:]])
            cy = np.concatenate([cy, sy[1:]])
            used += 1
    return rings, dropped
