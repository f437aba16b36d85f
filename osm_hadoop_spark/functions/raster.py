"""Bit-exact vectorized Bresenham line rasterization.

Re-derivation (NOT a translation) of the reference's integer Bresenham
(raster/Rasterizer.java:22-134, callback iface raster/Plotter.java:8-12):

The reference normalizes each segment so the fast axis increases
(Rasterizer.java:29-55): if |dy| < |dx| it iterates x (swapping endpoints when
x2 < x1), otherwise it iterates y (swapping when y2 < y1; ties |dy| == |dx|
take the y-fast path). Within an octant it keeps an integer error term `eps`
with the asymmetric update

    positive slope:  eps += d_slow; if (eps << 1) >= d_fast: slow += 1, eps -= d_fast
    negative slope:  eps starts at d_fast; eps += d_slow;
                     if (eps << 1) <  d_fast: slow -= 1, eps += d_fast

(Rasterizer.java:68-134). Both cases collapse to one closed form for the
plotted slow-axis value at fast-step k (proved in tests against a literal
re-implementation, including the >= / < tie asymmetry):

    slow_k = slow_1 + floor((2*k*d_slow + d_fast) / (2*d_fast))    k = 0..d_fast

with floor = toward -infinity. This makes the whole rasterization a flat
vectorized NumPy computation: no per-pixel Python, no callbacks — ideal for
Arrow-batched pandas UDFs + explode.
"""

from __future__ import annotations

import numpy as np


def _closed_form(k: np.ndarray, d_slow: np.ndarray, d_fast: np.ndarray) -> np.ndarray:
    """slow-axis offset at fast step k; d_fast > 0."""
    return (2 * k * d_slow + d_fast) // (2 * d_fast)


def rasterize_segments(
    x1: np.ndarray, y1: np.ndarray, x2: np.ndarray, y2: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rasterize many segments at once.

    Parameters are int arrays of equal length (snapped pixel endpoints).

    Returns (px, py, seg_idx): flat pixel coordinates plus the index of the
    source segment for each pixel (for value attachment / explode).
    Pixel multiplicity and order match an aggregation-insensitive contract:
    the set of pixels per segment is bit-exact vs the reference algorithm
    (duplicates inside one segment cannot occur; shared endpoints between
    consecutive segments DO repeat, as in the reference's sliding(2) loop,
    WayRasterizer.scala:173-181).
    """
    x1 = np.asarray(x1, dtype=np.int64)
    y1 = np.asarray(y1, dtype=np.int64)
    x2 = np.asarray(x2, dtype=np.int64)
    y2 = np.asarray(y2, dtype=np.int64)
    n_seg = x1.shape[0]
    if n_seg == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()

    adx = np.abs(x2 - x1)
    ady = np.abs(y2 - y1)
    x_fast = ady < adx  # Rasterizer.java:29 — ties go to the y-fast branch

    # Normalize: fast axis increases (endpoint swap, Rasterizer.java:31-36,45-48).
    swap = np.where(x_fast, x2 < x1, y2 < y1)
    sx1 = np.where(swap, x2, x1)
    sy1 = np.where(swap, y2, y1)
    sx2 = np.where(swap, x1, x2)
    sy2 = np.where(swap, y1, y2)

    d_fast = np.where(x_fast, sx2 - sx1, sy2 - sy1)  # >= 0
    d_slow = np.where(x_fast, sy2 - sy1, sx2 - sx1)
    fast_1 = np.where(x_fast, sx1, sy1)
    slow_1 = np.where(x_fast, sy1, sx1)

    n_pix = d_fast + 1
    offsets = np.concatenate(([0], np.cumsum(n_pix)[:-1]))
    total = int(n_pix.sum())
    seg_idx = np.repeat(np.arange(n_seg, dtype=np.int64), n_pix)
    k = np.arange(total, dtype=np.int64) - np.repeat(offsets, n_pix)

    df = np.repeat(d_fast, n_pix)
    ds = np.repeat(d_slow, n_pix)
    f1 = np.repeat(fast_1, n_pix)
    s1 = np.repeat(slow_1, n_pix)
    xf = np.repeat(x_fast, n_pix)

    fast = f1 + k
    # d_fast == 0 only for single-pixel segments where k == 0 -> offset 0.
    safe_df = np.where(df == 0, 1, df)
    slow = s1 + np.where(df == 0, 0, _closed_form(k, ds, safe_df))

    px = np.where(xf, fast, slow)
    py = np.where(xf, slow, fast)
    return px, py, seg_idx


def rasterize_segments_scalar(x1: int, y1: int, x2: int, y2: int) -> list[tuple[int, int]]:
    """Literal (per-pixel loop) re-implementation of Rasterizer.java:22-134.

    TEST ORACLE ONLY — used by pytest/hypothesis to prove the closed form in
    `rasterize_segments` is bit-exact, octant by octant, including the
    asymmetric >= / < tie handling. Never called from Spark plans.
    """
    out: list[tuple[int, int]] = []
    dx = abs(x2 - x1)
    dy = abs(y2 - y1)
    if dy < dx:
        if x2 < x1:
            return rasterize_segments_scalar(x2, y2, x1, y1)
        dx_ = x2 - x1
        dy_ = y2 - y1
        y = y1
        if y1 < y2:  # rasterizePositiveX (Rasterizer.java:68-85)
            eps = 0
            for x in range(x1, x2 + 1):
                out.append((x, y))
                eps += dy_
                if (eps << 1) >= dx_:
                    y += 1
                    eps -= dx_
        else:  # rasterizeNegativeX (Rasterizer.java:103-117)
            eps = dx_
            for x in range(x1, x2 + 1):
                out.append((x, y))
                eps += dy_
                if (eps << 1) < dx_:
                    y -= 1
                    eps += dx_
    else:
        if y2 < y1:
            return rasterize_segments_scalar(x2, y2, x1, y1)
        dx_ = x2 - x1
        dy_ = y2 - y1
        x = x1
        if x1 < x2:  # rasterizePositiveY (Rasterizer.java:87-101)
            eps = 0
            for y in range(y1, y2 + 1):
                out.append((x, y))
                eps += dx_
                if (eps << 1) >= dy_:
                    x += 1
                    eps -= dy_
        else:  # rasterizeNegativeY (Rasterizer.java:119-134)
            eps = dy_
            for y in range(y1, y2 + 1):
                out.append((x, y))
                eps += dx_
                if (eps << 1) < dy_:
                    x -= 1
                    eps += dy_
    return out
