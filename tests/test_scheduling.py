"""Interval scheduling (operators/scheduling.py): greedy-chain replay,
brute-force optimality on tiny inputs, degenerate handling, and the
recursive-CTE SQL twin through DuckDB."""

import itertools
import random

import duckdb
import pytest

from osm_hadoop_spark.operators.scheduling import (
    interval_schedule,
    interval_schedule_sql,
)


def _ref_greedy(ivs):
    """Sequential earliest-end greedy over [(id, s, e)] (s < e)."""
    ivs = sorted((iv for iv in ivs if iv[1] < iv[2]),
                 key=lambda t: (t[2], t[1], t[0]))
    out, last_end = [], None
    for i, s, e in ivs:
        if last_end is None or s >= last_end:
            out.append((i, s, e))
            last_end = e
    return out


def _rand(rng, nkeys, nper):
    rows = []
    for k in range(nkeys):
        for i in range(rng.randint(0, nper)):
            s = rng.randint(0, 100)
            rows.append((k, k * 1000 + i, s, s + rng.randint(1, 25)))
    return rows


def test_matches_sequential_greedy(spark):
    rows = _rand(random.Random(3), 12, 30)
    df = spark.createDataFrame(rows, "key long, id long, s long, e long")
    got = sorted(tuple(r) for r in interval_schedule(df, rounds=8).collect())
    want = sorted(
        (k, *iv)
        for k in {r[0] for r in rows}
        for iv in _ref_greedy([(i, s, e) for kk, i, s, e in rows if kk == k])
    )
    assert got == want


def test_greedy_is_optimal_brute(spark):
    # n <= 10 per key: check |selected| == max over all subsets
    rng = random.Random(11)
    rows = _rand(rng, 5, 10)
    df = spark.createDataFrame(rows, "key long, id long, s long, e long")
    got = interval_schedule(df, rounds=6).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.key, []).append((r.s, r.e))
    for k in {r[0] for r in rows}:
        ivs = [(s, e) for kk, _, s, e in rows if kk == k and s < e]
        best = 0
        for m in range(len(ivs), 0, -1):
            if best:
                break
            for comb in itertools.combinations(ivs, m):
                cs = sorted(comb)
                if all(cs[i][1] <= cs[i + 1][0] for i in range(len(cs) - 1)):
                    best = m
                    break
        assert len(by_key.get(k, [])) == best
        sel = sorted(by_key.get(k, []))
        assert all(sel[i][1] <= sel[i + 1][0] for i in range(len(sel) - 1))


def test_degenerate_dropped_and_touching_kept(spark):
    rows = [
        (1, 1, 5, 5),   # empty: dropped
        (1, 2, 9, 4),   # negative: dropped
        (1, 3, 0, 10),
        (1, 4, 10, 20),  # touching chain: both kept (half-open)
    ]
    df = spark.createDataFrame(rows, "key long, id long, s long, e long")
    got = sorted(r.id for r in interval_schedule(df, rounds=4).collect())
    assert got == [3, 4]


def test_rounds_truncation(spark):
    # 8 disjoint intervals; rounds=2 reaches 2^2 = 4 of them
    rows = [(1, i, i * 10, i * 10 + 5) for i in range(8)]
    df = spark.createDataFrame(rows, "key long, id long, s long, e long")
    assert interval_schedule(df, rounds=2).count() == 4
    assert interval_schedule(df, rounds=3).count() == 8


def test_sql_twin(spark):
    rows = _rand(random.Random(23), 9, 25)
    df = spark.createDataFrame(rows, "key long, id long, s long, e long")
    got = sorted(tuple(r) for r in interval_schedule(df, rounds=8).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE iv0 (key BIGINT, id BIGINT, s BIGINT, e BIGINT)")
    con.executemany("INSERT INTO iv0 VALUES (?, ?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(interval_schedule_sql("iv0")).fetchall()
    )
    assert got == want
