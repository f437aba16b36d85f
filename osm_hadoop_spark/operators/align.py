"""Needleman-Wunsch global sequence alignment over token sequences.

The alignment-family companion of the Fréchet DP (operators/frechet.py):
where Fréchet scores trajectory closeness, NW scores how two TOKEN
sequences line up under edit operations with affine-free gap costs —
the right tool for revision diffing, OCR-vs-source reconciliation, and
explaining WHY two near-dup candidates differ (PassJoin/MinHash give the
pair; alignment gives the edit story).

Scoring (classic): match +2, mismatch −1, gap −1 — integers throughout,
so scores are exact int64 and cross-engine comparable.

Distributed shape: candidate pairs arrive from any blocked generator
(LSH buckets, PassJoin segments, adjacency); the DP runs once per pair in
an Arrow batch kernel VECTORIZED ACROSS THE BATCH (the i,j loop is over
the bounded token horizon; every numpy op spans all pairs). Padding is
leak-free for the same reason as the Fréchet kernel: a padded cell only
ever reads cells with smaller indices, and each pair's answer is read at
its own true (m, n).

The DuckDB twin replays the DP inductively in a recursive CTE carrying
(previous row, current row prefix) — the Fréchet oracle pattern with the
NW recurrence and the closed-form gap base row.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MATCH, MISMATCH, GAP = 2, -1, -1

_OUT_SCHEMA = "doc_a bigint, doc_b bigint, align_score bigint"


def _nw_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    bsz = len(pdf)
    am = np.fromiter((len(v) for v in pdf["ta"]), dtype=np.int64, count=bsz)
    bn = np.fromiter((len(v) for v in pdf["tb"]), dtype=np.int64, count=bsz)
    m, n = int(am.max()), int(bn.max())

    def pad(col, width):
        out = np.zeros((bsz, width), dtype=np.int64)
        for r, v in enumerate(pdf[col]):
            out[r, : len(v)] = np.asarray(v, dtype=np.int64)
        return out

    a, b = pad("ta", m), pad("tb", n)
    # sub[i, j] = score of aligning a[i] with b[j]
    sub = np.where(
        a[:, :, None] == b[:, None, :], np.int64(MATCH), np.int64(MISMATCH)
    )
    dp = np.empty((bsz, m + 1, n + 1), dtype=np.int64)
    dp[:, 0, :] = GAP * np.arange(n + 1)
    dp[:, :, 0] = GAP * np.arange(m + 1)[None, :]
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[:, i, j] = np.maximum(
                dp[:, i - 1, j - 1] + sub[:, i - 1, j - 1],
                np.maximum(dp[:, i - 1, j] + GAP, dp[:, i, j - 1] + GAP),
            )
    ans = dp[np.arange(bsz), am, bn]
    return pd.DataFrame(
        {"doc_a": pdf["doc_a"], "doc_b": pdf["doc_b"], "align_score": ans}
    )


def nw_align(pairs: DataFrame) -> DataFrame:
    """pairs(doc_a, doc_b, ta array<bigint>, tb array<bigint>) ->
    (doc_a, doc_b, align_score)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _nw_batch(pdf)

    return pairs.mapInPandas(kernel, _OUT_SCHEMA)


def nw_score_py(a: list[int], b: list[int]) -> int:
    """Scalar textbook recursion (test oracle for the batch kernel)."""
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for j in range(n + 1):
        dp[0][j] = GAP * j
    for i in range(m + 1):
        dp[i][0] = GAP * i
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            s = MATCH if a[i - 1] == b[j - 1] else MISMATCH
            dp[i][j] = max(
                dp[i - 1][j - 1] + s, dp[i - 1][j] + GAP, dp[i][j - 1] + GAP
            )
    return dp[m][n]
