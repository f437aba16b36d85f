"""Benford census and exact Gini (operators/profile.py): pure-Python
replays, zero-fill, tie invariance, and closed-form cases."""

import random

from osm_hadoop_spark.operators.profile import benford_census, gini_exact


def test_benford_matches_reference(spark):
    rng = random.Random(13)
    rows = [
        ("a" if i % 2 else "b", rng.randint(-100, 10**6))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r.key, r.digit): r.n for r in benford_census(df, "k", "v").collect()
    }
    want = {}
    for k, v in rows:
        if v > 0:
            d = int(str(v)[0])
            want[(k, d)] = want.get((k, d), 0) + 1
    for key in ("a", "b"):
        for d in range(1, 10):
            assert got[(key, d)] == want.get((key, d), 0)
    assert len(got) == 18  # 2 keys x 9 digits, zero-filled


def test_benford_excludes_nonpositive(spark):
    rows = [("k", -5), ("k", 0), ("k", 12)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r.digit: r.n for r in benford_census(df, "k", "v").collect()}
    assert got[1] == 1 and sum(got.values()) == 1


def _ref_gini(vals):
    n = len(vals)
    sv = sorted(vals)
    return sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(sv))


def test_gini_matches_reference(spark):
    rng = random.Random(14)
    groups = {k: [rng.randint(0, 500) for _ in range(rng.randint(1, 60))]
              for k in range(8)}
    rows = [(k, v) for k, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r.key: (r.n, r.sum_v, r.gini_num)
           for r in gini_exact(df, "k", "v").collect()}
    for k, vals in groups.items():
        assert got[k] == (len(vals), sum(vals), _ref_gini(vals))


def test_gini_closed_forms(spark):
    # perfect equality -> 0; total concentration -> (n-1)*total
    rows = [(0, 5), (0, 5), (0, 5), (0, 5), (1, 0), (1, 0), (1, 12)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r.key: r.gini_num for r in gini_exact(df, "k", "v").collect()}
    assert got[0] == 0
    assert got[1] == 2 * 12  # (n-1) * total with n=3, total=12
