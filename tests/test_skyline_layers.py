"""Skyline layer peeling (operators/skyline.py): brute peel replay,
duplicate handling, truncation, and the nested SQL twin."""

import random

import duckdb

from osm_hadoop_spark.operators.skyline import skyline_layers, skyline_round_sql


def _dominates(a, b):
    return a[0] <= b[0] and a[1] <= b[1] and (a[0] < b[0] or a[1] < b[1])


def _ref_layers(pts, layers):
    remaining = dict(pts)
    out = {}
    for ell in range(1, layers + 1):
        if not remaining:
            break
        sky = [
            i for i, p in remaining.items()
            if not any(
                _dominates(q, p) for j, q in remaining.items() if j != i
            )
        ]
        for i in sky:
            out[i] = ell
            del remaining[i]
    return out


def test_matches_brute_peel(spark):
    rng = random.Random(33)
    pts = {i: (rng.randint(0, 40), rng.randint(0, 40)) for i in range(150)}
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()], "id long, x long, y long"
    )
    got = {r.id: r.layer for r in skyline_layers(df, 5).collect()}
    assert got == _ref_layers(pts, 5)


def test_duplicates_share_layer(spark):
    pts = [(1, 5, 5), (2, 5, 5), (3, 10, 10)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {r.id: r.layer for r in skyline_layers(df, 3).collect()}
    # equal points don't strictly dominate each other: both layer 1
    assert got == {1: 1, 2: 1, 3: 2}


def test_truncation(spark):
    # diagonal staircase: each point its own layer
    pts = [(i, i, i) for i in range(6)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = skyline_layers(df, 3).collect()
    assert sorted((r.id, r.layer) for r in got) == [(0, 1), (1, 2), (2, 3)]


def test_sql_twin(spark):
    rng = random.Random(35)
    pts = [(i, rng.randint(0, 30), rng.randint(0, 30)) for i in range(80)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted(tuple(r) for r in skyline_layers(df, 3).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE p0 (id BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO p0 VALUES (?, ?, ?)", pts)
    ctes, sels = [], []
    prev = "p0"
    for ell in range(1, 4):
        ctes.append(f"s{ell} AS ({skyline_round_sql(prev)})")
        sels.append(
            f"SELECT id, x, y, CAST({ell} AS BIGINT) AS layer FROM s{ell}"
        )
        if ell < 3:
            ctes.append(
                f"p{ell} AS (SELECT * FROM {prev} WHERE id NOT IN "
                f"(SELECT id FROM s{ell}))"
            )
            prev = f"p{ell}"
    sql = "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sels)
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
