"""Dominance counts (operators/dominance.py): brute replay across band
widths, duplicates, staircase closed form."""

import random

import pytest

from osm_hadoop_spark.operators.dominance import dominance_counts


def _brute(pts):
    out = {}
    for i, (xi, yi) in pts.items():
        out[i] = sum(
            1
            for j, (xj, yj) in pts.items()
            if j != i and xj <= xi and yj <= yi
        )
    return out


@pytest.mark.parametrize("band_width", [1, 7, 50, 10**6])
def test_matches_brute(spark, band_width):
    rng = random.Random(47)
    pts = {i: (rng.randint(0, 60), rng.randint(0, 60)) for i in range(250)}
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()], "id long, x long, y long"
    )
    got = {r.id: r.dom for r in dominance_counts(df, band_width).collect()}
    assert got == _brute(pts)


def test_duplicates_and_staircase(spark):
    pts = [(1, 5, 5), (2, 5, 5), (3, 0, 10), (4, 10, 0), (5, 10, 10)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {r.id: r.dom for r in dominance_counts(df, 3).collect()}
    # duplicates dominate each other; 5 dominates everything
    assert got == {1: 1, 2: 1, 3: 0, 4: 0, 5: 4}
