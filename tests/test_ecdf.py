"""Two-sample ECDF stats (operators/profile.py): scipy-free brute
replay, identical-samples zero, disjoint-support max."""

import random

from osm_hadoop_spark.operators.profile import two_sample_ecdf


def _ref(avals, bvals):
    na, nb = len(avals), len(bvals)
    levels = sorted(set(avals) | set(bvals))
    cuma = cumb = 0
    ks = cvm = 0
    for v in levels:
        ca = avals.count(v)
        cb = bvals.count(v)
        cuma += ca
        cumb += cb
        d = cuma * nb - cumb * na
        ks = max(ks, abs(d))
        cvm += (ca + cb) * d * d
    return na, nb, ks, cvm


def test_matches_brute(spark):
    rng = random.Random(51)
    data = {}
    rows = []
    for k in range(5):
        avals = [rng.randint(0, 15) for _ in range(rng.randint(1, 40))]
        bvals = [rng.randint(3, 20) for _ in range(rng.randint(1, 40))]
        data[k] = (avals, bvals)
        rows += [(k, "A", v) for v in avals] + [(k, "B", v) for v in bvals]
    df = spark.createDataFrame(rows, "key long, grp string, value long")
    got = {
        r.key: (r.n_a, r.n_b, r.ks_num, r.cvm_num)
        for r in two_sample_ecdf(df, "key", "grp", "value", "A").collect()
    }
    for k, (avals, bvals) in data.items():
        assert got[k] == _ref(avals, bvals)


def test_identical_and_disjoint(spark):
    rows = (
        [(0, "A", v) for v in (1, 2, 3)] + [(0, "B", v) for v in (1, 2, 3)]
        + [(1, "A", v) for v in (1, 2)] + [(1, "B", v) for v in (10, 11)]
    )
    df = spark.createDataFrame(rows, "key long, grp string, value long")
    got = {
        r.key: (r.ks_num, r.n_a, r.n_b)
        for r in two_sample_ecdf(df, "key", "grp", "value", "A").collect()
    }
    assert got[0][0] == 0                       # identical: D = 0
    assert got[1][0] == got[1][1] * got[1][2]   # disjoint: D = 1 scaled
