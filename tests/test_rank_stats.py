"""mann_whitney_census / spearman_census vs brute rank twins."""

import random


def _brute_u2(pairs):
    a = [v for g, v in pairs if g == 0]
    b = [v for g, v in pairs if g != 0]
    u2a = sum(2 * (x > y) + (x == y) for x in a for y in b)
    u2b = sum(2 * (y > x) + (x == y) for x in a for y in b)
    pooled = a + b
    ties = {}
    for v in pooled:
        ties[v] = ties.get(v, 0) + 1
    tc = sum(t * t * t - t for t in ties.values())
    return len(a), len(b), u2a, u2b, tc


def test_mann_whitney_vs_brute(spark):
    from osm_hadoop_spark.operators.profile import mann_whitney_census

    rng = random.Random(99)
    rows = []
    for k in ("p", "q", "r"):
        for _ in range(80):
            rows.append((k, rng.randint(0, 1), rng.randint(0, 20)))
    df = spark.createDataFrame(rows, "key: string, grp: long, value: long")
    got = {
        r["key"]: (r["n_a"], r["n_b"], r["u2_a"], r["u2_b"], r["tie_cube"])
        for r in mann_whitney_census(df, "key", "grp", "value", 0).collect()
    }
    for k in ("p", "q", "r"):
        want = _brute_u2([(g, v) for kk, g, v in rows if kk == k])
        assert got[k] == want
        na, nb, u2a, u2b, _ = got[k]
        assert u2a + u2b == 2 * na * nb


def test_mann_whitney_closed_forms(spark):
    from osm_hadoop_spark.operators.profile import mann_whitney_census

    # A strictly above B: u2_a = 2 * n_a * n_b; all-equal: u2_a = n_a*n_b
    rows = [("hi", 0, 100 + i) for i in range(5)]
    rows += [("hi", 1, i) for i in range(7)]
    rows += [("eq", 0, 3)] * 4 + [("eq", 1, 3)] * 6
    df = spark.createDataFrame(rows, "key: string, grp: long, value: long")
    got = {
        r["key"]: (r["u2_a"], r["u2_b"], r["tie_cube"])
        for r in mann_whitney_census(df, "key", "grp", "value", 0).collect()
    }
    assert got["hi"] == (2 * 5 * 7, 0, 0)
    assert got["eq"] == (4 * 6, 4 * 6, 10 ** 3 - 10)


def _brute_spearman_sums(vals):
    def dranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        r2 = [0] * len(xs)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and xs[order[j]] == xs[order[i]]:
                j += 1
            # positions i+1 .. j (1-based); doubled average = (i+1) + j
            for t in range(i, j):
                r2[order[t]] = (i + 1) + j
            i = j
        return r2
    rx = dranks([x for x, _ in vals])
    ry = dranks([y for _, y in vals])
    n = len(vals)
    return (
        n, sum(rx), sum(ry),
        sum(a * b for a, b in zip(rx, ry)),
        sum(a * a for a in rx), sum(b * b for b in ry),
    )


def test_spearman_vs_brute(spark):
    from osm_hadoop_spark.operators.timeseries import spearman_census

    rng = random.Random(5)
    rows = []
    for k in ("a", "b"):
        for _ in range(60):
            rows.append((k, rng.randint(0, 9), rng.randint(0, 9)))
    df = spark.createDataFrame(rows, "key: string, x: long, y: long")
    got = {
        r["key"]: (r["n"], r["sx"], r["sy"], r["sxy"], r["sx2"], r["sy2"])
        for r in spearman_census(df).collect()
    }
    for k in ("a", "b"):
        assert got[k] == _brute_spearman_sums(
            [(x, y) for kk, x, y in rows if kk == k]
        )


def test_spearman_monotone_rho(spark):
    from osm_hadoop_spark.operators.timeseries import spearman_census

    # strictly increasing y in x (no ties): rho must be exactly +1;
    # strictly decreasing: exactly -1
    rows = [("up", i, 10 * i + 3) for i in range(25)]
    rows += [("down", i, 1000 - 7 * i) for i in range(25)]
    df = spark.createDataFrame(rows, "key: string, x: long, y: long")
    for r in spearman_census(df).collect():
        n, sx, sy, sxy, sx2, sy2 = (
            r["n"], r["sx"], r["sy"], r["sxy"], r["sx2"], r["sy2"]
        )
        num = n * sxy - sx * sy
        den2 = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
        assert num * num == den2  # |rho| == 1 exactly
        assert (num > 0) == (r["key"] == "up")
