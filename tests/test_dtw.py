"""DTW join (operators/dtw.py): vectorized kernel vs textbook recursion,
band semantics, identical-trajectory zero, threshold behavior."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row

from osm_hadoop_spark.operators.dtw import _dp_batch, dtw_d2_py, dtw_join


def _rand_traj(rng, n):
    return [(int(rng.randint(0, 200)), int(rng.randint(0, 200))) for _ in range(n)]


def test_kernel_matches_textbook_recursion():
    rng = np.random.RandomState(11)
    rows = []
    expected = []
    for i in range(40):
        a = _rand_traj(rng, rng.randint(1, 8))
        b = _rand_traj(rng, rng.randint(1, 8))
        rows.append({
            "tid_a": i, "tid_b": 1000 + i,
            "axs": [p[0] for p in a], "ays": [p[1] for p in a],
            "bxs": [p[0] for p in b], "bys": [p[1] for p in b],
        })
        expected.append(dtw_d2_py(a, b))
    out = _dp_batch(pd.DataFrame(rows), band=None)
    assert list(out["dtw_d2"]) == expected


def test_identical_trajectories_zero():
    a = [(5, 5), (9, 2), (11, 30)]
    assert dtw_d2_py(a, a) == 0
    out = _dp_batch(pd.DataFrame([{
        "tid_a": 1, "tid_b": 2,
        "axs": [p[0] for p in a], "ays": [p[1] for p in a],
        "bxs": [p[0] for p in a], "bys": [p[1] for p in a],
    }]), band=None)
    assert out["dtw_d2"][0] == 0


def test_band_full_equals_exact_and_tight_band_monotone():
    rng = np.random.RandomState(5)
    rows = []
    for i in range(20):
        a = _rand_traj(rng, 6)
        b = _rand_traj(rng, 6)
        rows.append({
            "tid_a": i, "tid_b": 1000 + i,
            "axs": [p[0] for p in a], "ays": [p[1] for p in a],
            "bxs": [p[0] for p in b], "bys": [p[1] for p in b],
        })
    pdf = pd.DataFrame(rows)
    exact = list(_dp_batch(pdf, band=None)["dtw_d2"])
    wide = list(_dp_batch(pdf, band=10)["dtw_d2"])
    tight = list(_dp_batch(pdf, band=1)["dtw_d2"])
    assert wide == exact  # band >= max len is the exact DTW
    assert all(t >= e for t, e in zip(tight, exact))  # constraint only adds


def test_join_end_to_end_with_threshold(spark):
    # two co-moving trajectories in one cell, one far-away shape in the
    # same cell: threshold keeps only the co-moving pair
    rows = [
        Row(tid=1, cellx=0, celly=0, xs=[10, 20, 30], ys=[10, 10, 10]),
        Row(tid=2, cellx=0, celly=0, xs=[11, 21, 31], ys=[10, 10, 10]),
        Row(tid=3, cellx=0, celly=0, xs=[10, 200, 10], ys=[200, 10, 200]),
    ]
    traj = spark.createDataFrame(rows)
    out = {(r["tid_a"], r["tid_b"]): r["dtw_d2"]
           for r in dtw_join(traj).collect()}
    assert out[(1, 2)] == 3  # three matched steps at dx=1
    assert out[(1, 3)] > 10000
    kept = dtw_join(traj, tau=100).collect()
    assert {(r["tid_a"], r["tid_b"]) for r in kept} == {(1, 2)}


def test_unreachable_band_sentinel():
    # |m - n| > band: no complete warping path inside the band
    out = _dp_batch(pd.DataFrame([{
        "tid_a": 1, "tid_b": 2,
        "axs": [0, 0, 0, 0, 0, 0], "ays": [0, 0, 0, 0, 0, 0],
        "bxs": [0], "bys": [0],
    }]), band=1)
    assert out["dtw_d2"][0] >= 2**61
