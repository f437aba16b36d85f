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
