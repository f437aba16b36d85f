"""Haar energy (operators/wavelet.py): pure-Python replay, Parseval
identity, truncation/partial-pair rules, and the SQL twin."""

import random

import duckdb

from osm_hadoop_spark.operators.wavelet import haar_energy, haar_energy_sql


def _ref_haar(vals, levels):
    vals = vals[: 1 << levels]
    out = {}
    cur = vals
    for lvl in range(1, levels + 1):
        pairs = [
            (cur[i], cur[i + 1]) for i in range(0, len(cur) - 1, 2)
        ]
        if pairs:
            dets = [a - b for a, b in pairs]
            out[lvl] = (
                len(dets),
                sum(d * d for d in dets),
                sum(abs(d) for d in dets),
            )
        cur = [a + b for a, b in pairs]
    return out


def test_matches_reference(spark):
    rng = random.Random(8)
    keys = {}
    rows = []
    for k in range(6):
        vals = [rng.randint(-20, 20) for _ in range(rng.randint(1, 40))]
        keys[k] = vals
        rows += [(k, 100 + i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key long, t long, v long")
    got = {}
    for r in haar_energy(df, 4).collect():
        got.setdefault(r.key, {})[r.level] = (r.n_pairs, r.energy, r.abs_sum)
    for k, vals in keys.items():
        assert got.get(k, {}) == _ref_haar(vals, 4)


def test_parseval_full_dyadic(spark):
    # length 2^L: sum over levels of energy/2^level + (total sum)^2/2^L
    # equals sum of squares (unnormalized Haar Parseval) — checked in
    # exact rationals scaled by 2^L
    rng = random.Random(9)
    L = 3
    vals = [rng.randint(-9, 9) for _ in range(1 << L)]
    rows = [(0, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key long, t long, v long")
    es = {r.level: r.energy for r in haar_energy(df, L).collect()}
    lhs = sum(es[lvl] * (1 << (L - lvl)) for lvl in range(1, L + 1))
    lhs += sum(vals) ** 2
    assert lhs == (1 << L) * sum(v * v for v in vals)


def test_sql_twin(spark):
    rng = random.Random(10)
    rows = [
        (k, i, rng.randint(-50, 50))
        for k in range(5)
        for i in range(rng.randint(2, 30))
    ]
    df = spark.createDataFrame(rows, "key long, t long, v long")
    got = sorted(tuple(r) for r in haar_energy(df, 3).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE s (key BIGINT, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(haar_energy_sql("s", 3)).fetchall()
    )
    assert got == want
