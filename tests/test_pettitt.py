"""pettitt_change vs the O(n^2) sign-pair definition."""

import random


def _brute(vals):
    # vals: list of (t, x) — returns (n, t_star_pos, t_at, k_stat)
    vals = sorted(vals)
    xs = [x for _, x in vals]
    n = len(xs)
    best = None
    for tpos in range(1, n):  # prefix length 1..n-1
        u = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(tpos) for j in range(tpos, n)
        )
        cand = (-abs(u), tpos, vals[tpos - 1][0])
        if best is None or cand < best:
            best = cand
    return (n, best[1], best[2], -best[0])


def _run(spark, rows):
    from osm_hadoop_spark.operators.timeseries import pettitt_change

    df = spark.createDataFrame(rows, "key: string, t: long, x: long")
    got = {
        r["key"]: (r["n"], r["t_star"], r["t_at"], r["k_stat"])
        for r in pettitt_change(df).collect()
    }
    keys = {k for k, _, _ in rows}
    for k in keys:
        vals = [(t, x) for kk, t, x in rows if kk == k]
        if len(vals) < 2:
            assert k not in got  # no valid split for singletons
        else:
            assert got[k] == _brute(vals), k
    return got


def test_clean_level_shift(spark):
    # 10 low then 10 high: the break sits exactly at the shift
    rows = [("s", i, 5) for i in range(10)]
    rows += [("s", 10 + i, 50) for i in range(10)]
    got = _run(spark, rows)
    n, t_star, t_at, k = got["s"]
    assert (t_star, t_at) == (10, 9)
    assert k == 10 * 10  # every cross pair agrees: |U| = n1*n2


def test_constant_series_zero(spark):
    rows = [("c", i, 7) for i in range(8)]
    got = _run(spark, rows)
    assert got["c"][3] == 0


def test_random_and_ties_vs_brute(spark):
    rng = random.Random(31)
    rows = []
    for k in ("a", "b"):
        for i in range(40):
            rows.append((k, i, rng.randint(0, 6)))
    rows.append(("single", 0, 3))
    _run(spark, rows)


def test_unsorted_input_and_duplicate_values(spark):
    rows = [("u", t, x) for t, x in
            [(3, 1), (0, 9), (2, 9), (1, 1), (5, 2), (4, 2)]]
    _run(spark, rows)
