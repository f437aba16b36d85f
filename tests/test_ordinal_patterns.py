"""Ordinal pattern census (operators/timeseries.py): brute replay,
monotone concentration, tie convention, zero-fill."""

import random

from osm_hadoop_spark.operators.timeseries import (
    ORDINAL_PATTERNS,
    ordinal_pattern_census,
)


def _code(a, b, c):
    return 4 * (a <= b) + 2 * (b <= c) + (a <= c)


def _ref(vals):
    out = {p: 0 for p in ORDINAL_PATTERNS}
    for i in range(len(vals) - 2):
        out[_code(vals[i], vals[i + 1], vals[i + 2])] += 1
    return out


def test_matches_brute(spark):
    rng = random.Random(53)
    data = {k: [rng.randint(0, 9) for _ in range(rng.randint(3, 50))]
            for k in range(6)}
    rows = [(k, i, v) for k, vs in data.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "key long, t long, v long")
    got = {}
    for r in ordinal_pattern_census(df).collect():
        got.setdefault(r.key, {})[r.pattern] = r.n
    for k, vs in data.items():
        assert got[k] == _ref(vs)
        assert sum(got[k].values()) == len(vs) - 2


def test_monotone_and_ties(spark):
    rows = (
        [(0, i, i) for i in range(10)]        # strictly increasing: all 7
        + [(1, i, -i) for i in range(10)]     # strictly decreasing: all 0
        + [(2, i, 5) for i in range(5)]       # constant: ties -> code 7
    )
    df = spark.createDataFrame(rows, "key long, t long, v long")
    got = {}
    for r in ordinal_pattern_census(df).collect():
        got.setdefault(r.key, {})[r.pattern] = r.n
    assert got[0][7] == 8 and sum(got[0].values()) == 8
    assert got[1][0] == 8
    assert got[2][7] == 3  # earlier-position-wins: ties read ascending
    assert set(got[0]) == set(ORDINAL_PATTERNS)  # zero-filled
