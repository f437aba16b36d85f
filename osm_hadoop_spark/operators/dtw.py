"""Dynamic-time-warping trajectory-similarity join (Sakoe & Chiba 1978).

The companion measure to the discrete-Fréchet join (operators/frechet.py):
Fréchet is the MAX of matched distances along an optimal coupling — the
right metric for "never drifts apart"; DTW is the SUM — the right metric
for overall shape similarity under local time stretching (GPS traces
sampled at different rates, co-movement with speed variation). Both
share the blocking/refine architecture, so this module reuses
frechet.candidate_pairs verbatim and only swaps the DP semiring
(max/min -> +/min).

The DP:
    dp(0,0) = d2(0,0)
    dp(i,0) = dp(i-1,0) + d2(i,0);   dp(0,j) = dp(0,j-1) + d2(0,j)
    dp(i,j) = d2(i,j) + min(dp(i-1,j), dp(i-1,j-1), dp(i,j-1))
with d2 the exact integer squared point distance — all int64, so the
DuckDB twin (the same row-walk recursive CTE as the Fréchet oracle)
matches bit-for-bit. An optional Sakoe-Chiba band `band` (|i - j| <= band)
is the standard pruning for long series; cells outside the band are
excluded from the min (set to +inf) — with the full band the result is
the exact unconstrained DTW.

Padding safety (same argument as frechet._dp_batch): batches pad to the
max (m, n); DP dependencies only flow from smaller indices, and each
pair's answer is read at its own true (m-1, n-1), so padded cells never
contaminate a real result.

100 TB posture: identical to the Fréchet join — candidates come from the
same-cell equi-join (never an all-pairs product), the kernel is one
Arrow batch at a time with every numpy op spanning the whole batch, and
trajectory lengths are bounded small upstream (simplify/chunk), so the
m*n loop is a constant factor, not a scale axis.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.frechet import candidate_pairs

_OUT_SCHEMA = "tid_a bigint, tid_b bigint, dtw_d2 bigint"

_INF = np.int64(2**62)


def _dp_batch(pdf: pd.DataFrame, band: int | None) -> pd.DataFrame:
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
    dp = np.full_like(d2, _INF)
    for i in range(m):
        for j in range(n):
            if band is not None and abs(i - j) > band:
                continue
            d = d2[:, i, j]
            if i == 0 and j == 0:
                dp[:, 0, 0] = d
            elif i == 0:
                dp[:, 0, j] = dp[:, 0, j - 1] + d
            elif j == 0:
                dp[:, i, 0] = dp[:, i - 1, 0] + d
            else:
                reach = np.minimum(
                    dp[:, i - 1, j],
                    np.minimum(dp[:, i - 1, j - 1], dp[:, i, j - 1]),
                )
                dp[:, i, j] = np.minimum(reach + d, _INF)  # clamp off-band inf
    ans = dp[np.arange(bsz), am - 1, bn - 1]
    return pd.DataFrame(
        {"tid_a": pdf["tid_a"], "tid_b": pdf["tid_b"], "dtw_d2": ans}
    )


def dtw_join(
    traj: DataFrame, tau: int | None = None, band: int | None = None
) -> DataFrame:
    """Blocked DTW join; returns (tid_a, tid_b, dtw_d2), optionally
    thresholded at tau (JVM-side after the kernel, keeping the exact
    distance column for auditing/oracles). `band` = Sakoe-Chiba radius;
    None = exact unconstrained DTW. Pairs whose band admits no complete
    warping path (possible when |m - n| > band) report the +inf sentinel
    2^62 and are dropped by any finite tau."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _dp_batch(pdf, band)

    out = candidate_pairs(traj).mapInPandas(kernel, _OUT_SCHEMA)
    if tau is not None:
        out = out.filter(F.col("dtw_d2") <= F.lit(tau))
    return out


def dtw_d2_py(a: list[tuple[int, int]], b: list[tuple[int, int]]) -> int:
    """Scalar reference implementation (test oracle only — proves the
    vectorized/padded batch kernel against the textbook recursion)."""
    m, n = len(a), len(b)
    dp = [[0] * n for _ in range(m)]
    for i in range(m):
        for j in range(n):
            d = (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
            if i == 0 and j == 0:
                dp[i][j] = d
            elif i == 0:
                dp[i][j] = dp[0][j - 1] + d
            elif j == 0:
                dp[i][j] = dp[i - 1][0] + d
            else:
                dp[i][j] = d + min(dp[i - 1][j], dp[i - 1][j - 1], dp[i][j - 1])
    return dp[m - 1][n - 1]
