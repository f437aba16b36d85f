"""Discrete-Fréchet trajectory-similarity join (Eiter & Mannila 1994).

Trajectory similarity is the geospatial twin of document near-dup: find
pairs of polylines that stay uniformly close along their whole length —
map-matching QA, GPS-trace dedup, co-movement mining. The discrete Fréchet
distance is the standard coupling measure; on the engine's integer
coordinate grid its square is exact int64 arithmetic end to end (squared
point distances, max/min folds — no roots until the consumer wants one).

Join shape (the 100 TB plan, same discipline as the LSH/dedup families):
  1. BLOCK: trajectories are bucketed by a coarse cell of their anchor
     point; candidates are same-cell pairs (tid_a < tid_b) — an equi-join
     on the cell key, never an all-pairs product. (Neighbor-cell probing,
     as in dbscan's eps-grid, widens recall when the workload needs it;
     the operator takes the candidate generator as given.)
  2. REFINE: one Arrow batch at a time, the DP runs VECTORIZED ACROSS THE
     BATCH — the (m x n) loop is over trajectory lengths (bounded small by
     construction: traces are simplified/chunked upstream), while every
     numpy op spans all pairs in the batch. No per-row Python.

The DP (ca = coupling array):
    ca(0,0) = d2(0,0)
    ca(i,0) = max(ca(i-1,0), d2(i,0));  ca(0,j) = max(ca(0,j-1), d2(0,j))
    ca(i,j) = max(d2(i,j), min(ca(i-1,j), ca(i-1,j-1), ca(i,j-1)))
Padding safety: batches pad to the max (m, n); padded cells only ever
READ cells with smaller indices, so real results are unaffected and each
pair's answer is ca(m-1, n-1) at its own true lengths.

The DuckDB twin replays this DP cell-by-cell in a recursive CTE whose
state is (prev row, current row prefix) — an inductive derivation, not a
reimplementation wrapper (same style as the BPE ladder oracle).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = "tid_a bigint, tid_b bigint, frechet_d2 bigint"


def candidate_pairs(traj: DataFrame) -> DataFrame:
    """Same-cell blocked candidate pairs.

    `traj` columns: tid, cellx, celly, xs array<bigint>, ys array<bigint>.
    """
    a = traj.select(
        F.col("tid").alias("tid_a"), "cellx", "celly",
        F.col("xs").alias("axs"), F.col("ys").alias("ays"),
    )
    b = traj.select(
        F.col("tid").alias("tid_b"), "cellx", "celly",
        F.col("xs").alias("bxs"), F.col("ys").alias("bys"),
    )
    return a.join(b, ["cellx", "celly"]).filter(
        F.col("tid_a") < F.col("tid_b")
    ).select("tid_a", "tid_b", "axs", "ays", "bxs", "bys")


def _dp_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    bsz = len(pdf)
    am = np.fromiter((len(v) for v in pdf["axs"]), dtype=np.int64, count=bsz)
    bn = np.fromiter((len(v) for v in pdf["bxs"]), dtype=np.int64, count=bsz)
    m, n = int(am.max()), int(bn.max())

    def pad(col, width):
        out = np.zeros((bsz, width), dtype=np.int64)
        for r, v in enumerate(pdf[col]):
            out[r, : len(v)] = np.asarray(v, dtype=np.int64)
        return out

    ax, ay = pad("axs", m), pad("ays", m)
    bx, by = pad("bxs", n), pad("bys", n)
    dx = ax[:, :, None] - bx[:, None, :]
    dy = ay[:, :, None] - by[:, None, :]
    d2 = dx * dx + dy * dy  # (bsz, m, n) exact int64
    dp = np.empty_like(d2)
    for i in range(m):
        for j in range(n):
            d = d2[:, i, j]
            if i == 0 and j == 0:
                dp[:, 0, 0] = d
            elif i == 0:
                dp[:, 0, j] = np.maximum(dp[:, 0, j - 1], d)
            elif j == 0:
                dp[:, i, 0] = np.maximum(dp[:, i - 1, 0], d)
            else:
                reach = np.minimum(
                    dp[:, i - 1, j],
                    np.minimum(dp[:, i - 1, j - 1], dp[:, i, j - 1]),
                )
                dp[:, i, j] = np.maximum(d, reach)
    ans = dp[np.arange(bsz), am - 1, bn - 1]
    return pd.DataFrame(
        {"tid_a": pdf["tid_a"], "tid_b": pdf["tid_b"], "frechet_d2": ans}
    )


def frechet_join(traj: DataFrame, tau_sq: int | None = None) -> DataFrame:
    """Blocked discrete-Fréchet join; returns (tid_a, tid_b, frechet_d2),
    optionally thresholded at tau_sq (applied JVM-side after the kernel so
    the exact distance column survives for auditing/oracles)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _dp_batch(pdf)

    out = candidate_pairs(traj).mapInPandas(kernel, _OUT_SCHEMA)
    if tau_sq is not None:
        out = out.filter(F.col("frechet_d2") <= F.lit(tau_sq))
    return out


def frechet_d2_py(a: list[tuple[int, int]], b: list[tuple[int, int]]) -> int:
    """Scalar reference implementation (test oracle only — proves the
    vectorized/padded batch kernel against the textbook recursion)."""
    m, n = len(a), len(b)
    ca = [[-1] * n for _ in range(m)]

    def d2(i, j):
        return (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2

    for i in range(m):
        for j in range(n):
            if i == 0 and j == 0:
                ca[i][j] = d2(0, 0)
            elif i == 0:
                ca[i][j] = max(ca[0][j - 1], d2(0, j))
            elif j == 0:
                ca[i][j] = max(ca[i - 1][0], d2(i, 0))
            else:
                ca[i][j] = max(
                    d2(i, j), min(ca[i - 1][j], ca[i - 1][j - 1], ca[i][j - 1])
                )
    return ca[m - 1][n - 1]
