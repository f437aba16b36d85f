"""Seasonal anomaly profile (operators/timeseries.py): pure-Python
replay, tie-break pinning, and scale-clearing identity checks."""

import random

from osm_hadoop_spark.operators.timeseries import seasonal_anomaly


def _ref(rows, period):
    groups = {}
    for k, t, v in rows:
        groups.setdefault((k, t % period), []).append((t, v))
    out = []
    for (k, ph), bins in groups.items():
        n = len(bins)
        s = sum(v for _, v in bins)
        best = max(((v * n - s, t, v) for t, v in bins))
        out.append((k, ph, n, s, best[1], best[2], best[0]))
    return sorted(out)


def test_matches_reference(spark):
    rng = random.Random(4)
    rows = [
        (k, t, rng.randint(0, 50))
        for k in ("a", "b", "c")
        for t in range(rng.randint(5, 60))
    ]
    df = spark.createDataFrame(rows, "key string, t long, v long")
    got = sorted(tuple(r) for r in seasonal_anomaly(df, 7).collect())
    assert got == _ref(rows, 7)


def test_residual_identity_and_tiebreak(spark):
    # constant series: every residual is 0; argmax tie-break picks max t
    rows = [("k", t, 5) for t in range(14)]
    df = spark.createDataFrame(rows, "key string, t long, v long")
    got = {r.phase: r for r in seasonal_anomaly(df, 7).collect()}
    assert len(got) == 7
    for ph, r in got.items():
        assert r.anom_num == 0
        assert r.anom_t == 7 + ph  # later week wins the tie
        assert (r.n_bins, r.sum_v) == (2, 10)


def test_period_one_single_phase(spark):
    rows = [("k", 0, 1), ("k", 1, 9), ("k", 2, 2)]
    df = spark.createDataFrame(rows, "key string, t long, v long")
    r = seasonal_anomaly(df, 1).collect()[0]
    # residual of 9 vs mean 4: num = 9*3 - 12 = 15
    assert (r.phase, r.n_bins, r.sum_v, r.anom_t, r.anom_v, r.anom_num) == (
        0, 3, 12, 1, 9, 15,
    )
