"""Distributed fixed-point moment matrices (Gram / covariance) + PCA.

Training-data pipelines need corpus-level second-moment statistics over the
embedding column: covariance for whitening / PCA projection (the standard
preprocessing for IVF/PQ indexes — Jégou et al. 2011 §5 trains PQ on
rotated/whitened vectors), feature-correlation audits, and Mahalanobis
outlier scoring. At 10^12 rows the ONLY scalable shape is a single pass of
map-side partial aggregation: each Arrow batch contributes one d×d partial
Gram (einsum in NumPy), and the shuffle carries ~one slim row per batch —
never the vectors themselves.

Exactness discipline (engine-wide): vectors are quantized q = floor(x·2^10)
exactly as the PQ index does (operators/similarity.py) — parquet floats
widen to double and ×1024 is exact (power of two), so floor is bit-stable
across engines; every downstream sum is int64 and the DuckDB twin re-derives
identical integers. Σq·qᵀ over 10^12 rows of |q| ≤ 2^13 stays < 2^63.

Output is one uniform exact-integer table (i, j, val):
    (i, j,  Σ q_i·q_j)  for 0 ≤ i ≤ j < d   — second moments
    (-1, j, Σ q_j)      for 0 ≤ j < d       — first moments
    (-1, -1, n)                              — row count
from which the consumer forms covariance exactly:
    n·Cov[i,j]·n = n·Σq_iq_j − Σq_i·Σq_j   (all integer arithmetic).

`pca_top_eigen` is the bounded driver-side consumer (collects the d² moment
rows — parameters, never data; same posture as the IVF/k-means fits) and
power-iterates the covariance for the top principal component.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE_BITS = 10


def gram_moments(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    scale_bits: int = SCALE_BITS,
) -> DataFrame:
    """One-pass exact integer moment table (see module docstring).

    Plan: mapInPandas (one partial row per Arrow batch: n, Σq, flattened
    qᵀq) → posexplode of the tiny partials → hash aggregate over ≤ d²
    groups. The exchange moves O(batches · d²) integers total, independent
    of corpus size.
    """
    scale = float(1 << scale_bits)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy())
            q = np.floor(m.astype(np.float64) * scale).astype(np.int64)
            yield pd.DataFrame(
                {
                    "n": [np.int64(q.shape[0])],
                    "s": [q.sum(axis=0).tolist()],
                    "g": [(q.T @ q).ravel().tolist()],
                }
            )

    parts = embeddings.select(vec_col).mapInPandas(
        part, "n bigint, s array<bigint>, g array<bigint>"
    )
    dim = F.size("s")
    second = (
        parts.select(dim.alias("d"), F.posexplode("g").alias("idx", "v"))
        .groupBy(F.expr("idx div d").cast("int").alias("i"),
                 (F.col("idx") % F.col("d")).cast("int").alias("j"))
        .agg(F.sum("v").alias("val"))
        .filter(F.col("i") <= F.col("j"))
    )
    first = (
        parts.select(F.posexplode("s").alias("j", "v"))
        .groupBy(F.col("j").cast("int").alias("j"))
        .agg(F.sum("v").alias("val"))
        .select(F.lit(-1).cast("int").alias("i"), "j", "val")
    )
    count = parts.agg(F.sum("n").alias("val")).select(
        F.lit(-1).cast("int").alias("i"), F.lit(-1).cast("int").alias("j"),
        "val",
    )
    return second.unionByName(first).unionByName(count)


def pca_top_eigen(
    moments: DataFrame, iters: int = 200
) -> tuple[np.ndarray, float]:
    """Top principal component of the exact covariance, driver-side.

    Collects the ≤ d²/2 + d + 1 moment rows (learned parameters, bounded by
    the embedding dimension — never corpus data) and power-iterates
    n²·Cov = n·G − s·sᵀ (exact integers) in float64. Returns (unit
    eigenvector, eigenvalue of Cov in quantized units²).
    """
    rows = moments.collect()
    n = next(r["val"] for r in rows if r["i"] == -1 and r["j"] == -1)
    d = max(r["j"] for r in rows) + 1
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        if r["i"] == -1 and r["j"] >= 0:
            s[r["j"]] = r["val"]
        elif r["i"] >= 0:
            g[r["i"], r["j"]] = r["val"]
            g[r["j"], r["i"]] = r["val"]
    cov_scaled = n * g - np.outer(s, s)  # n^2 * Cov
    v = np.ones(d) / np.sqrt(d)
    for _ in range(iters):
        w = cov_scaled @ v
        nw = np.linalg.norm(w)
        if nw == 0.0:
            break
        v = w / nw
    eig = float(v @ cov_scaled @ v) / float(n) ** 2
    return v, eig


def _power_directions(
    n: int, s: np.ndarray, g: np.ndarray, r: int = 2, iters: int = 300
) -> list[np.ndarray]:
    """Deterministic top-r principal directions by deflated power iteration
    over n²·Cov = n·G − s·sᵀ. Shared VERBATIM by the engine fit (moments
    from gram_moments) and the oracle fit (moments from NumPy over the same
    parquet): both moment paths produce identical exact integers, and this
    float recursion is a pure function of them — so the two fits agree
    bit-for-bit (the IVF shared-fit discipline, similarity.py)."""
    d = len(s)
    cov = (n * g - np.outer(s, s)).astype(np.float64)
    dirs: list[np.ndarray] = []
    for _ in range(r):
        v = np.ones(d) / np.sqrt(d)
        for _ in range(iters):
            w = cov @ v
            nw = np.linalg.norm(w)
            if nw == 0.0:
                break
            v = w / nw
        lam = float(v @ cov @ v)
        dirs.append(v.copy())
        cov = cov - lam * np.outer(v, v)
    return dirs


def _moments_arrays(rows) -> tuple[int, np.ndarray, np.ndarray]:
    n = next(r["val"] for r in rows if r["i"] == -1 and r["j"] == -1)
    d = max(r["j"] for r in rows) + 1
    s = np.zeros(d, dtype=np.int64)
    g = np.zeros((d, d), dtype=np.int64)
    for r in rows:
        if r["i"] == -1 and r["j"] >= 0:
            s[r["j"]] = r["val"]
        elif r["i"] >= 0:
            g[r["i"], r["j"]] = r["val"]
            g[r["j"], r["i"]] = r["val"]
    return int(n), s, g


def pca_directions_q(
    moments: DataFrame, r: int = 2, quant_bits: int = 12
) -> list[list[int]]:
    """Quantized principal directions u_q = floor(u·2^quant_bits) from the
    distributed exact moment table (bounded d² collect)."""
    n, s, g = _moments_arrays(moments.collect())
    return [
        [int(x) for x in np.floor(v * (1 << quant_bits)).astype(np.int64)]
        for v in _power_directions(n, s, g, r=r)
    ]


def pca_directions_numpy(
    path: str, r: int = 2, scale_bits: int = SCALE_BITS, quant_bits: int = 12
) -> list[list[int]]:
    """Oracle-side twin of pca_directions_q: identical exact integer
    moments straight from the parquet, identical float recursion."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=["embedding"])
    m = np.stack(tbl.column("embedding").to_pylist())
    q = np.floor(m.astype(np.float64) * (1 << scale_bits)).astype(np.int64)
    n = q.shape[0]
    s = q.sum(axis=0)
    g = q.T @ q
    return [
        [int(x) for x in np.floor(v * (1 << quant_bits)).astype(np.int64)]
        for v in _power_directions(n, s, g, r=r)
    ]


def pca_project(
    embeddings: DataFrame,
    directions_q: list[list[int]],
    vec_col: str = "embedding",
    scale_bits: int = SCALE_BITS,
) -> DataFrame:
    """Project every vector onto the quantized directions — exact integer
    scores p_j = Σ q_i·u_q[j][i], entirely in whole-stage codegen (array
    zip_with/aggregate against literal direction arrays; no Python, no
    shuffle — a map-only broadcast matmul, THE scalable projection shape)."""
    scale = 1 << scale_bits
    qarr = F.expr(
        f"transform({vec_col}, v -> "
        f"cast(floor(cast(v AS double) * {scale}) AS bigint))"
    )
    out = embeddings.select("vec_id", qarr.alias("_q"))
    cols = []
    for j, u in enumerate(directions_q):
        lit = F.array(*[F.lit(int(x)) for x in u])
        cols.append(
            F.aggregate(
                F.zip_with(F.col("_q"), lit, lambda a, b: a * b),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias(f"pc{j + 1}_q")
        )
    return out.select("vec_id", *cols)
