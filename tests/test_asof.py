"""asof_join: semantics (inclusive bound, ties, tolerance, no-match) and a
brute-force cross-check on a seeded random timeline."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _frames(spark, left_rows, right_rows):
    l = spark.createDataFrame(left_rows, "k bigint, ts timestamp, lid bigint")
    r = spark.createDataFrame(right_rows, "k bigint, ts timestamp, rid bigint, val double")
    return l, r


def _run(l, r, **kw):
    out = asof_join(
        l, r, on=["k"], left_ts="ts", right_ts="ts",
        right_payload=["rid", "val"], seq="rid", **kw
    )
    return {row["lid"]: (row["asof_rid"], row["asof_val"]) for row in out.collect()}


def test_basic_backward_and_no_match(spark):
    l, r = _frames(
        spark,
        [(1, _ts(10), 100), (1, _ts(0), 101), (2, _ts(5), 102)],
        [(1, _ts(3), 7, 1.5), (1, _ts(9), 8, 2.5), (3, _ts(1), 9, 9.9)],
    )
    got = _run(l, r)
    assert got[100] == (8, 2.5)      # latest of the two predecessors
    assert got[101] == (None, None)  # left ts before any right row
    assert got[102] == (None, None)  # key has no right rows at all


def test_equal_ts_is_inclusive_and_tie_breaks_on_seq(spark):
    l, r = _frames(
        spark,
        [(1, _ts(5), 100)],
        [(1, _ts(5), 7, 1.0), (1, _ts(5), 9, 3.0), (1, _ts(4), 8, 2.0)],
    )
    # right rows at ts == left ts DO match (left.ts >= right.ts), and the
    # greatest `seq` among equal timestamps wins.
    assert _run(l, r)[100] == (9, 3.0)


def test_tolerance_nulls_stale_matches(spark):
    l, r = _frames(
        spark,
        [(1, _ts(100), 100), (1, _ts(4), 101)],
        [(1, _ts(3), 7, 1.5)],
    )
    got = _run(l, r, tolerance_us=2_000_000)
    assert got[100] == (None, None)  # 97 s stale
    assert got[101] == (7, 1.5)      # 1 s, within tolerance


def test_left_columns_survive_and_rows_preserved(spark):
    l, r = _frames(spark, [(1, _ts(10), 100)], [(1, _ts(3), 7, 1.5)])
    out = asof_join(l, r, on=["k"], left_ts="ts", right_ts="ts", right_payload=["val"])
    assert set(out.columns) == {"k", "ts", "lid", "asof_val", "asof_ts_us"}
    row = out.collect()[0]
    assert (row["k"], row["lid"], row["asof_val"]) == (1, 100, 1.5)


def test_random_timeline_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    n_l, n_r, n_k = 300, 200, 12
    lk = rng.integers(0, n_k, n_l)
    ls = rng.integers(0, 10_000, n_l)
    rk = rng.integers(0, n_k, n_r)
    rs = rng.integers(0, 10_000, n_r)
    left_rows = [(int(lk[i]), _ts(int(ls[i])), i) for i in range(n_l)]
    right_rows = [(int(rk[i]), _ts(int(rs[i])), i, float(i)) for i in range(n_r)]
    l, r = _frames(spark, left_rows, right_rows)
    got = _run(l, r)
    for i in range(n_l):
        cands = [
            (rs[j], j) for j in range(n_r) if rk[j] == lk[i] and rs[j] <= ls[i]
        ]
        want = max(cands)[1] if cands else None
        assert got[i][0] == want, (i, got[i], want)


@pytest.mark.parametrize("n_right", [0, 1])
def test_degenerate_right_side(spark, n_right):
    l, r = _frames(
        spark,
        [(1, _ts(5), 100)],
        [(1, _ts(2), 7, 1.0)][:n_right],
    )
    got = _run(l, r)
    assert got[100] == ((7, 1.0) if n_right else (None, None))
