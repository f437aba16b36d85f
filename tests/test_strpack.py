"""STR bulk packing (operators/strpack.py): pure-Python reference
replay, leaf-size invariants, and the naive-mechanism SQL twin through
DuckDB."""

import math
import random

import duckdb
import pytest

from osm_hadoop_spark.operators.strpack import str_pack, str_pack_sql


def _ref_str(rects, cap):
    """Literal STR: sort by doubled center x, slice into runs of
    C*ceil(sqrt(P)), sort each slice by doubled center y, cut runs of
    C. rects: [(id, xmin, ymin, xmax, ymax)]."""
    n = len(rects)
    p = -(-n // cap)
    s = math.isqrt(p)
    if s * s < p:
        s += 1
    by_x = sorted(rects, key=lambda r: (r[1] + r[3], r[0]))
    out = []
    width = cap * s
    for si in range(0, len(by_x), width):
        sl = sorted(
            by_x[si : si + width], key=lambda r: (r[2] + r[4], r[0])
        )
        for li in range(0, len(sl), cap):
            leaf = sl[li : li + cap]
            out.append(
                (
                    si // width,
                    li // cap,
                    len(leaf),
                    min(r[1] for r in leaf),
                    min(r[2] for r in leaf),
                    max(r[3] for r in leaf),
                    max(r[4] for r in leaf),
                )
            )
    return sorted(out)


def _rand_rects(rng, n):
    out = []
    for i in range(n):
        x, y = rng.randint(-500, 500), rng.randint(-500, 500)
        out.append((i, x, y, x + rng.randint(0, 40), y + rng.randint(0, 40)))
    return out


@pytest.mark.parametrize("n,cap", [(1, 4), (7, 3), (100, 8), (257, 16)])
def test_matches_python_reference(spark, n, cap):
    rects = _rand_rects(random.Random(n * 31 + cap), n)
    df = spark.createDataFrame(
        rects, "id long, xmin long, ymin long, xmax long, ymax long"
    )
    got = sorted(tuple(r) for r in str_pack(df, cap).collect())
    assert got == _ref_str(rects, cap)


def test_leaf_size_invariants(spark):
    cap, n = 8, 203
    rects = _rand_rects(random.Random(9), n)
    df = spark.createDataFrame(
        rects, "id long, xmin long, ymin long, xmax long, ymax long"
    )
    rows = str_pack(df, cap).collect()
    assert sum(r.n_rects for r in rows) == n
    # every leaf is full except possibly the last leaf of each slice
    by_slice = {}
    for r in rows:
        by_slice.setdefault(r.slice, []).append(r)
    for sl in by_slice.values():
        sl.sort(key=lambda r: r.leaf)
        assert all(r.n_rects == cap for r in sl[:-1])
        assert 1 <= sl[-1].n_rects <= cap
    # MBRs are valid boxes
    assert all(r.xmin <= r.xmax and r.ymin <= r.ymax for r in rows)


def test_duplicate_centers_deterministic(spark):
    # many rects sharing one center: id tie-break pins slice/leaf
    rects = [(i, 10, 10, 20, 20) for i in range(30)]
    df = spark.createDataFrame(
        rects, "id long, xmin long, ymin long, xmax long, ymax long"
    )
    got = sorted(tuple(r) for r in str_pack(df, 4).collect())
    assert got == _ref_str(rects, 4)


def test_sql_twin(spark):
    rects = _rand_rects(random.Random(77), 150)
    df = spark.createDataFrame(
        rects, "id long, xmin long, ymin long, xmax long, ymax long"
    )
    got = sorted(tuple(r) for r in str_pack(df, 10).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE rects (id BIGINT, xmin BIGINT, ymin BIGINT,"
        " xmax BIGINT, ymax BIGINT)"
    )
    con.executemany("INSERT INTO rects VALUES (?, ?, ?, ?, ?)", rects)
    want = sorted(
        tuple(r) for r in con.execute(str_pack_sql("rects", 10)).fetchall()
    )
    assert got == want
