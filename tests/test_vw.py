"""Visvalingam-Whyatt simplification (operators/vw.py): pure-Python
round-semantics replay, structural invariants, and the SQL-fragment
twin equivalence through DuckDB."""

import random

import duckdb
import pytest

from osm_hadoop_spark.operators.vw import vw_threshold, vw_round_sql


def _ref_round(pts, t2):
    """One parallel VW relaxation over [(seq, x, y)] — the literal
    strict-local-minimum rule from the operator docstring."""
    n = len(pts)
    a2 = [None] * n
    for i in range(1, n - 1):
        (_, px, py), (_, x, y), (_, nx, ny) = pts[i - 1], pts[i], pts[i + 1]
        a2[i] = abs((px - x) * (ny - y) - (nx - x) * (py - y))

    def key(i):
        return (a2[i], pts[i][0]) if a2[i] is not None else None

    out = []
    for i in range(n):
        k = key(i)
        if k is None or a2[i] >= t2:
            out.append(pts[i])
            continue
        pk, nk = key(i - 1), key(i + 1)
        beats_p = pk is None or k < pk
        beats_n = nk is None or k < nk
        if not (beats_p and beats_n):
            out.append(pts[i])
    return out


def _ref_vw(pts, t2, rounds):
    cur = list(pts)
    for _ in range(rounds):
        cur = _ref_round(cur, t2)
    return cur


@pytest.mark.parametrize("rounds", [1, 2, 4])
def test_matches_python_reference(spark, rounds):
    rng = random.Random(42)
    rows = []
    want = []
    for way in range(8):
        n = rng.randint(2, 40)
        pts = [
            (i, rng.randint(-50, 50), rng.randint(-50, 50))
            for i in range(n)
        ]
        rows += [(way, *p) for p in pts]
        want += [(way, *p) for p in _ref_vw(pts, 60, rounds)]
    df = spark.createDataFrame(rows, "way_id long, seq long, x long, y long")
    got = sorted(
        (r.way_id, r.seq, r.x, r.y)
        for r in vw_threshold(df, t2=60, rounds=rounds).collect()
    )
    assert got == sorted(want)


def test_invariants(spark):
    pts = [(i, i * 3, (i * i) % 17 - 8) for i in range(30)]
    rows = [(1, *p) for p in pts]
    df = spark.createDataFrame(rows, "way_id long, seq long, x long, y long")
    got = sorted((r.seq, r.x, r.y) for r in vw_threshold(df, 40, 5).collect())
    # endpoints always survive
    assert got[0] == pts[0] and got[-1] == pts[-1]
    # survivors are an exact subsequence of the input (original coords kept)
    assert set(got) <= set(pts)
    # adjacent vertices never both removed in one round => per round at
    # most floor((n-2+1)/2) interior removals; 5 rounds from 30 leaves >= 2
    assert 2 <= len(got) <= len(pts)


def test_collinear_zero_area_removed(spark):
    # strictly collinear interior vertices have a2 == 0 < t2; ties on a2
    # break by seq, so alternate vertices fall each round
    rows = [(1, i, i, 0) for i in range(6)]
    df = spark.createDataFrame(rows, "way_id long, seq long, x long, y long")
    got = sorted((r.seq,) for r in vw_threshold(df, 1, 4).collect())
    assert got == [(0,), (5,)]


def test_sql_fragment_twin(spark):
    rng = random.Random(7)
    rows = [
        (w, i, rng.randint(-30, 30), rng.randint(-30, 30))
        for w in range(4)
        for i in range(rng.randint(2, 25))
    ]
    df = spark.createDataFrame(rows, "way_id long, seq long, x long, y long")
    got = sorted(
        (r.way_id, r.seq, r.x, r.y)
        for r in vw_threshold(df, t2=80, rounds=3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE c0 (way_id BIGINT, seq BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO c0 VALUES (?, ?, ?, ?)", rows)
    ctes = ", ".join(
        f"c{r} AS ({vw_round_sql(f'c{r - 1}', 80)})" for r in range(1, 4)
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"WITH {ctes} SELECT way_id, seq, x, y FROM c3"
        ).fetchall()
    )
    assert got == want
