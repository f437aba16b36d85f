"""MRL quantile sketch (operators/quantile_sketch.py): weight
conservation, exactness without compaction, rank-error bound on random
and adversarial inputs, partition-invariance, and the presharded SQL
twin through DuckDB."""

import random

import duckdb
import pytest

from osm_hadoop_spark.operators.quantile_sketch import (
    DECILES,
    mrl_deciles,
    mrl_deciles_sql_presharded,
)


def _rank_bounds(vals, est):
    """(#values < est, #values <= est) over the raw multiset."""
    return (sum(v < est for v in vals), sum(v <= est for v in vals))


def _check_bound(vals, rows, k, shards):
    n = len(vals)
    slack = n // k + shards
    for r in rows:
        tgt = (r.q_pct * n + 99) // 100
        lo, hi = _rank_bounds(vals, r.est)
        assert lo <= tgt + slack and hi >= tgt - slack, (
            r.q_pct, r.est, lo, hi, tgt, slack,
        )
        assert r.n == n


def test_exact_when_no_compaction(spark):
    rng = random.Random(1)
    vals = [rng.randint(-1000, 1000) for _ in range(500)]
    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "value long, id long")
    got = {
        r.q_pct: r.est
        for r in mrl_deciles(df, k=100000, shards=4, levels=3).collect()
    }
    sv = sorted(vals)
    for q in DECILES:
        tgt = (q * len(vals) + 99) // 100
        assert got[q] == sv[tgt - 1]


@pytest.mark.parametrize("layout", ["random", "sorted", "reversed"])
def test_error_bound(spark, layout):
    rng = random.Random(7)
    vals = [rng.randint(0, 10**6) for _ in range(5000)]
    if layout == "sorted":
        vals.sort()
    elif layout == "reversed":
        vals.sort(reverse=True)
    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "value long, id long")
    out = mrl_deciles(df, k=32, shards=8, levels=12).collect()
    assert len(out) == len(DECILES)
    _check_bound(vals, out, k=32, shards=8)


def test_partition_invariance(spark):
    rng = random.Random(3)
    rows = [(rng.randint(0, 999), i) for i in range(2000)]
    df = spark.createDataFrame(rows, "value long, id long")
    a = sorted(
        tuple(r) for r in mrl_deciles(df, k=16, shards=4, levels=10).collect()
    )
    b = sorted(
        tuple(r)
        for r in mrl_deciles(
            df.repartition(7), k=16, shards=4, levels=10
        ).collect()
    )
    assert a == b


def test_sql_twin_presharded(spark):
    rng = random.Random(11)
    rows = [(i % 5, rng.randint(0, 10**6), i) for i in range(3000)]
    df = spark.createDataFrame(rows, "shard long, value long, id long")
    got = sorted(
        tuple(r)
        for r in mrl_deciles(
            df, k=24, shards=5, levels=10, shard_col="shard"
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE src (shard BIGINT, value BIGINT, id BIGINT)")
    con.executemany("INSERT INTO src VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            mrl_deciles_sql_presharded("src", k=24, levels=10)
        ).fetchall()
    )
    assert got == want
